package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc: q167 streaming-quantiles emission boundary — which weekly
  * windows does append mode emit vs the recomputed watermark horizon
  * (end <= max−2h vs strict <)? */
object Q167Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.streaming.EventStreams.streamingQuantilesBatchDriven(spark, dir)
    val emitted = out.select(col("w_start"), col("event_type")).distinct()
    println("[probe] emitted (window,type) groups: " + emitted.count())
    println("[probe] emitted rows: " + out.count())
    val ev = graft.sources.Events.ev(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("event_type"))
    val week = 604800000000L
    val horizon = ev.agg(max(col("us"))).collect()(0).getLong(0) - 7200000000L
    val buckets = ev.select((col("us") - pmod(col("us"), lit(week))).as("ws"), col("event_type"))
      .distinct()
    val leq = buckets.filter(col("ws") + lit(week) <= lit(horizon)).count()
    val lt = buckets.filter(col("ws") + lit(week) < lit(horizon)).count()
    println(s"[probe] buckets total=${buckets.count()} end<=horizon: $leq  end<horizon: $lt")
    out.groupBy().agg(min("w_start"), max("w_start")).show(false)
    spark.stop()
  }
}
