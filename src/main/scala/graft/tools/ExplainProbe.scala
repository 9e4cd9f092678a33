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
    for (th <- Seq(0.35, 0.5, 0.7)) {
      timed(s"semanticDedup th=$th")(
        graft.operators.Similarity.semanticDedup(e, "vec_id", "embedding",
          threshold = th, numCells = 16, iters = 2, dim = 64)
          .filter(!col("keep")).count())
    }
    spark.stop()
  }
}
