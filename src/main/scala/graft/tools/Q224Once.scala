package graft.tools

import org.apache.spark.sql.SparkSession

/** One fresh-JVM q224 run with full logs — first-run warmup hunt. */
object Q224Once {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.queries.Curation.q224BpeHeldout(spark, "/root/testdata/sf0.1").collect()
    println(f"[probe] q224 fresh: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
