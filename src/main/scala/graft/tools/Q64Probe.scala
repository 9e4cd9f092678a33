package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Ad-hoc: stream-stream self-join cost, one shared streaming source
  * vs two independent sources over the same files. */
object Q64Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(d: String): DataFrame = graft.sources.Events.readStream(spark, d)
    def run(name: String, d: String, shared: Boolean): Unit = {
      val t0 = System.nanoTime()
      val ev = read(d)
      val (cl, pu) = if (shared) (ev, ev) else (read(d), read(d))
      val clicks = cl.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = pu.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val qn = s"q64probe_${System.nanoTime()}"
      val q = clicks.join(purchases,
          col("c_user") === col("p_user") && col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("c_user"))
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(qn).start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.table(qn).count()
      println(f"[q64probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm both shapes on tiny data
    run("warm shared", "/root/testdata/sf0.001", shared = true)
    run("warm dual", "/root/testdata/sf0.001", shared = false)
    for (r <- 1 to 2) {
      run(s"r$r dual-source", dir, shared = false)
      run(s"r$r shared-source", dir, shared = true)
    }
    spark.stop()
  }
}
