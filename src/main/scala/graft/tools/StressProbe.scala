package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHashFunctions._
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
    timed("count only")(docs.count())
    // forced kernel evaluations: aggregate over the kernel output so
    // column pruning can't elide the computation
    timed("simhash64 kernel (forced)")(
      docs.select(simhash64(col("text")).as("s")).agg(sum("s")).count())
    timed("shingle_hash_set kernel (forced)")(
      docs.select(shingle_hash_set(col("text"), 3).as("s"))
        .agg(sum(size(col("s")))).count())
    timed("minhash_sig kernel (forced)")(
      docs.select(minhash_sig(col("text"), 3, 32).as("s"))
        .agg(sum(element_at(col("s"), 1))).count())
    timed("minhash_band_sigs kernel (forced)")(
      docs.select(minhash_band_sigs(col("text"), 3, 32, 8).as("s"))
        .agg(sum(element_at(col("s"), 1))).count())
    timed("simhash pairs (cap 500)")(
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 3, 500).count())
    spark.stop()
  }
}
