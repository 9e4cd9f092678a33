package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }
    import graft.operators.{Similarity, Dedup}
    timed("trainCentroids iters=2") {
      Similarity.trainCentroids(e, "embedding", 16, 2, 64); 0L
    }
    val cents = Similarity.trainCentroids(e, "embedding", 16, 2, 64)
    val assigned = Similarity.assignCells(e, "vec_id", "embedding", cents)
    timed("assignCells count")(assigned.count())
    val l = assigned.select(col("id").as("id_a"), col("v").as("v_a"), col("cell"))
    val r = assigned.select(col("id").as("id_b"), col("v").as("v_b"), col("cell"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.dot(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= lit(0.5))
    timed("within-cell pairs")(pairs.count())
    timed("connectedComponents")(Dedup.connectedComponents(pairs, "id_a", "id_b").count())
    timed("full semanticDedup")(
      Similarity.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.5, numCells = 16, iters = 2, dim = 64)
        .filter(!col("keep")).count())
    spark.stop()
  }
}
