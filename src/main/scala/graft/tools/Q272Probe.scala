package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated q272 timing (rule 13): three consecutive runs in a fresh
  * JVM at sf0.1, next to a q177 run for the LPA-vs-Louvain cost
  * ratio on the identical trade graph.
  */
object Q272Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.queries.Pipeline
        .q272LouvainMove(spark, "/root/testdata/sf0.1").collect().length
      println(f"[probe] q272 run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    val t0 = System.nanoTime()
    val n = graft.queries.Pipeline
      .q177LabelProp(spark, "/root/testdata/sf0.1").collect().length
    println(f"[probe] q177 ref: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    spark.stop()
  }
}
