package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated timings for the two ×100 ScaleStress lines that moved vs
  * the round-3 table (LSH pairs after exact dedup; chunk dedup), to
  * separate operator cost from run-to-run environment variance.
  */
object LshProbe {
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
    timed("exact dedup (warm-up)")(
      graft.operators.Dedup.exact(docs, "doc_id", "text").count())
    timed("LSH pairs after exact dedup") {
      val keep = graft.operators.Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val survivors = docs.join(keep, "doc_id")
      graft.operators.Dedup.minhashLshPairs(survivors, "doc_id", "text", 3, 32, 8, 0.5).count()
    }
    timed("LSH pairs after exact dedup (repeat)") {
      val keep = graft.operators.Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val survivors = docs.join(keep, "doc_id")
      graft.operators.Dedup.minhashLshPairs(survivors, "doc_id", "text", 3, 32, 8, 0.5).count()
    }
    timed("chunk dedup (10-token chunks)")(
      graft.operators.Curation.chunkDedup(docs, "doc_id", "text", 10).count())
    timed("chunk dedup (repeat)")(
      graft.operators.Curation.chunkDedup(docs, "doc_id", "text", 10).count())
    spark.stop()
  }
}
