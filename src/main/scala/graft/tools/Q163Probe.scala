package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc: q163 PQ-ANN isolated timing (concurrent subspace training). */
object Q163Probe {
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
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    for (r <- 1 to 3)
      timed(s"q163 round $r")(
        graft.queries.Pipeline.queries("q163_pq_ann")(spark, dir).count())
    spark.stop()
  }
}
