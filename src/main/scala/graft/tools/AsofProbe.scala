package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc: composed (q40 union+window) vs native (q168 custom exec)
  * as-of join timing at sf0.1. */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    graft.sources.Events.ev(spark, dir).count() // warm scan
    for (round <- 1 to 3) {
      timed(s"composed q40 (round $round)")(
        graft.queries.Temporal.queries("q40_asof_join")(spark, dir).count())
      timed(s"native q168 (round $round)")(
        graft.queries.Temporal.queries("q168_asof_native")(spark, dir).count())
    }
    spark.stop()
  }
}
