package graft.tools
import org.apache.spark.sql.SparkSession
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }
    // warm the parquet read + codegen paths
    timed("warm batch read")(graft.sources.Events.ev(spark, dir).count())
    timed("q56 streamingDedup")(
      graft.streaming.EventStreams.streamingDedup(spark, dir).count())
    timed("q64 clickPurchase")(
      graft.streaming.EventStreams.clickPurchaseAttribution(spark, dir).count())
    timed("q56 again")(
      graft.streaming.EventStreams.streamingDedup(spark, dir).count())
    timed("q64 again")(
      graft.streaming.EventStreams.clickPurchaseAttribution(spark, dir).count())
    spark.stop()
  }
}
