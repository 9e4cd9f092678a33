package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated re-run of the round-6 ScaleStress additions (lesson 14b:
  * full-harness numbers carry 2-3× phase-order noise; the stable
  * signal is the isolated probe). Reuses the corpus ScaleStress left
  * at /tmp/graft_stress_{docs,events} and _emb. */
object Q164StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }
    val docs = spark.read.parquet("/tmp/graft_stress_docs")
    timed("warm scan")(docs.count())
    timed("allpairs signature stage (raw corpus)") {
      val (arrs, _) = graft.operators.Dedup
        .prefixFilterCandidates(docs, "doc_id", "text", 3, 0.5)
      arrs.agg(sum(col("n")), expr("bit_xor(element_at(arr, 1))"))
        .collect()(0).getLong(0)
    }
    timed("allpairs pairs tau=0.5 (after exact dedup)") {
      val keep = graft.operators.Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      graft.operators.Dedup.prefixFilterPairs(
        docs.join(keep, "doc_id"), "doc_id", "text", 3, 0.5).count()
    }
    timed("streaming t-digest quantiles (10M events)")(
      graft.streaming.EventStreams
        .streamingQuantilesBatchDriven(spark, "/tmp/graft_stress_events").count())
    val emb = spark.read.parquet("/tmp/graft_stress_emb")
    timed("pca top component (200k vectors)")(
      { graft.operators.Similarity.pcaTopComponent(emb, "embedding", 64); 0L })
    spark.stop()
  }
}
