package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/graft_stress_docs")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }
    timed("text stats scan")(
      docs.select(graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
        .agg(sum("q")).count())
    timed("simhash pairs (cap 500)")(
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 3, 500).count())
    timed("text stats scan again")(
      docs.select(graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
        .agg(sum("q")).count())
    spark.stop()
  }
}
