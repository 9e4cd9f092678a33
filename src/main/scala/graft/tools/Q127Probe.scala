package graft.tools

import org.apache.spark.sql.functions._

/** Local-only timing probe for q127 triangle counting. Not part of
  * the driver contract.
  */
object Q127Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      val full = t(s"q127 round $round") {
        graft.queries.Pipeline.q127Triangles(spark, dir)
          .agg(sum("n_tri"), count(lit(1))).collect()(0)
      }
      println(s"[probe] result: $full")
    }
    spark.stop()
  }
}
