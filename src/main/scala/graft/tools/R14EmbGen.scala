package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerates the ×N stress embedding corpus ScaleStress builds
  * (/tmp/graft_stress_emb_dir), standalone — so the dbscan/knn ×100
  * probes can run without paying the full stress harness first.
  * Identical construction: sf0.1 embeddings replicated `factor`× with
  * deterministic per-replica jitter (vec_id-seeded hash noise).
  */
object R14EmbGen {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val embPath = "/tmp/graft_stress_emb_dir/embeddings.parquet"
    embBase.crossJoin(spark.range(factor).toDF("rep"))
      .select(
        (col("vec_id") + col("rep") * lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x =>
          x + (pmod(xxhash64(col("vec_id"), col("rep")), lit(1000L)).cast("double")
            - lit(500.0)) / lit(50000.0)).as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(embPath)
    println(s"[embgen] wrote ${spark.read.parquet(embPath).count()} vectors to $embPath")
    spark.stop()
  }
}
