package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated re-run of the ScaleStress tail phases (rule 13: the full
  * harness masked a tail failure behind a grep pipeline once — this
  * probe exists so the tail phases have their own fresh-JVM numbers
  * and their own exit code). Usage: R8TailProbe [factor]. */
object R8TailProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }

    val docs: DataFrame = spark.read.parquet("/tmp/graft_stress_docs")
    val total = docs.count()
    val emb = spark.read.parquet("/tmp/graft_stress_emb")
    val nVec = emb.count()
    val evPath = "/tmp/graft_stress_events"
    println(s"[stress] tail probe: $total docs, $nVec vectors")

    timed(s"kNN graph via NN-descent ($nVec nodes, k=10, 2 grids + 1 round)")(
      graft.operators.Similarity.knnGraphDescent(emb, "vec_id", "embedding",
        k = 10, numCells = math.max(16, (nVec / 500L).toInt), dim = 64,
        grids = 2, rounds = 1).count())
    timed(s"rendezvous sharding 8->9 ($total docs, map-only)")(
      docs.select(
          graft.operators.Sampling.rendezvousShard(col("doc_id"), 8, 500L).as("s8"),
          graft.operators.Sampling.rendezvousShard(col("doc_id"), 9, 500L).as("s9"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(s8 * 64 + s9)"))
        .collect()(0).getLong(0))
    timed(s"per-source KL divergence ($total docs, top-512 vocab + OOV)")(
      graft.operators.Curation.unigramKlFp(docs, "source", "text", 512)
        .agg(count(lit(1)).as("n"), expr("bit_xor(kl_fp)"))
        .collect()(0).getLong(0))
    timed(s"length-bucket batch formation ($total docs, 8 shards/bucket)")(
      graft.operators.Curation.lengthBucketBatches(docs, "doc_id",
          size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long"),
          bucketWidth = 16, batchSize = 32, shards = 8, seed = 77L)
        .agg(count(lit(1)).as("n"), expr("bit_xor(max_len * n_rows)"))
        .collect()(0).getLong(0))
    timed(s"streaming quota (q253 shape, $factor x events)")(
      graft.streaming.EventStreams.streamingQuota(spark, evPath).count())
    spark.stop()
  }
}
