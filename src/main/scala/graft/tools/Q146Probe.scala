package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc: q146 interval-overlap plan + isolated timing (it benched
  * 7.8 s at sf0.1 — heaviest query in the registry after the round-5
  * fix made it runnable at all). */
object Q146Probe {
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
    // warm the scan + codegen once
    timed("warm")(graft.queries.Temporal.queries("q146_interval_overlap")(spark, dir).count())
    timed("q146 run2")(graft.queries.Temporal.queries("q146_interval_overlap")(spark, dir).count())
    timed("q146 run3")(graft.queries.Temporal.queries("q146_interval_overlap")(spark, dir).count())

    // piecewise: where do the seconds go?
    import org.apache.spark.sql.functions._
    val e = graft.sources.Events.ev(spark, dir).select(col("user_id"),
      unix_micros(col("ts")).as("us"))
      .withColumn("day", expr("us div 86400000000L"))
    val iv = e.groupBy(col("user_id"), col("day"))
      .agg(min(col("us")).as("s"), max(col("us")).as("e")).persist()
    timed("iv build")(iv.count())
    val a = iv.select(col("day"), col("user_id").as("u1"),
      col("s").as("s1"), col("e").as("e1"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("u1"))
    val b = iv.select(col("day"), col("user_id").as("u2"),
      col("s").as("s2"), col("e").as("e2"))
    val joined = a.join(broadcast(b), Seq("day")).filter(col("u1") < col("u2"))
    timed("join only (bit_xor sink)")(
      joined.select(bit_xor(col("s2")).as("x")).agg(sum(col("x"))).collect().length.toLong)
    val agged = joined
      .withColumn("ov", least(col("e1"), col("e2")) - greatest(col("s1"), col("s2")))
      .filter(col("ov") > lit(0L))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("days_overlapped"), sum(col("ov")).as("overlap_us"))
    timed("join+agg")(agged.count())
    val full = agged.orderBy(desc("overlap_us"), asc("u1"), asc("u2")).limit(100)
    timed("full")(full.count())
    full.count()
    println(full.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
