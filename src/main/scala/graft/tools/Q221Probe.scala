package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated q221 timing (rule 13): three consecutive runs in a fresh
  * JVM at sf0.1 — the bench reading moved 6.1 → 8.3 s across the
  * lineage-fix commit under different host windows, which proves
  * nothing either way.
  */
object Q221Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.queries.Pipeline
        .q221Modularity(spark, "/root/testdata/sf0.1").collect().length
      println(f"[probe] q221 run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
