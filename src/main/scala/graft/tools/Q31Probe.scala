package graft.tools
import org.apache.spark.sql.SparkSession
object Q31Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    (1 to 4).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.queries.Pipeline.q31MinhashLsh(spark, dir).count()
      println(f"[q31probe] run $i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
  }
}
