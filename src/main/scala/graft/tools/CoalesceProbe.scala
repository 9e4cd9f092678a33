package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc: does AQE partition-coalescing serialize any heavy query's
  * explosive stage (PERF lesson 16 generalized)? Times each candidate
  * with coalescing ON vs OFF on the same session. */
object CoalesceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional 2nd arg: comma-separated query names to probe instead
    val names = if (args.length > 1) args(1).split(",").toSeq
    else Seq("q75_semantic_dedup", "q117_dedup_pipeline",
      "q82_neardup_clusters_alt", "q55_neardup_clusters", "q31_minhash_lsh",
      "q96_fuzzy_key_pairs", "q52_ann_ivf")
    val qs = graft.SparkEntry.queries
    // warm each shape once
    names.foreach { n => try qs(n)(spark, "/root/testdata/sf0.01").count()
      catch { case _: Throwable => } }
    for (coalesce <- Seq("true", "false"); n <- names) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      System.gc()
      val t0 = System.nanoTime()
      val rows = qs(n)(spark, dir).count()
      println(f"[probe] $n coalesce=$coalesce: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
