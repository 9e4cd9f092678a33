package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated ×N stress probe for the round-11 embedding-audit surface —
  * the scale-safe twins (q321/q322/q323 shapes) and the bounded
  * brute-force baselines (q290/q314/q297 after the count-derived
  * moduli). Split out of the full ScaleStress harness for two reasons:
  * the full harness carries 2-3× phase-order/JVM noise (PERF lesson
  * 14b — isolated re-runs are the decision-grade measurement), and
  * the round-11 postmortem (the first dbscanCellRoles formulation
  * filled the disk at ×100 with wide pair shuffles) needs a cheap
  * re-run path that doesn't pay the 40-minute document phases.
  *
  * Usage: tools/run.sh graft.tools.R11StressProbe [factor]
  */
object R11StressProbe {
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
      println(f"[r11stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }

    // same ×N embedding replication as ScaleStress (vec_id-seeded
    // jitter, sf-dir layout so the Pipeline queries read it directly)
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val embDir = "/tmp/graft_stress_emb_dir"
    val embPath = s"$embDir/embeddings.parquet"
    embBase.crossJoin(spark.range(factor).toDF("rep"))
      .select(
        (col("vec_id") + col("rep") * lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x =>
          x + (pmod(xxhash64(col("vec_id"), col("rep")), lit(1000L)).cast("double")
            - lit(500.0)) / lit(50000.0)).as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(embPath)
    val emb = spark.read.parquet(embPath)
    val nVec = emb.count()
    println(s"[r11stress] embeddings x$factor -> $nVec vectors")

    timed(s"dbscan cell roles ($nVec vectors, auto cells, 3 grids, full corpus)")(
      graft.operators.Similarity.dbscanCellRoles(emb, "vec_id", "embedding",
          thetaFx = 250000000000L, minPts = math.max(3L, nVec / 80L))
        .groupBy(col("role")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n"), sum(col("n")))
        .collect()(0).getLong(0))
    // the q323 contract: the graph is the cost; the hubness fold on top
    // must be one groupBy + TakeOrdered. Graph params = the ScaleStress
    // kNN line (2 grids, 1 round — the 100 TB default, not the
    // gate-scale recall dial). Round 12: built through the CURVE so the
    // per-round marginal cost is measured separately — the ×100 answer
    // to the question q326's operating table asks (what does one more
    // synchronous descent round cost at corpus scale?).
    val knnCurve = graft.operators.Similarity.knnGraphDescentCurve(emb,
      "vec_id", "embedding", k = 10,
      numCells = math.max(16, (nVec / 500L).toInt),
      dim = 64, grids = 2, rounds = 1)
    timed(s"kNN graph INIT (rounds=0) ($nVec nodes, k=10, 2 grids)")(
      knnCurve(0).count())
    val knnG = knnCurve.last
    timed(s"kNN graph descent round 1 marginal ($nVec nodes)")(
      knnG.count())
    timed(s"hubness top-20 from kNN graph ($nVec nodes, reused graph)")(
      knnG.groupBy(col("dst")).agg(count(lit(1)).as("indeg"))
        .orderBy(desc("indeg"), asc("dst")).limit(20)
        .agg(count(lit(1)).as("n"), expr("bit_xor(indeg)"))
        .collect()(0).getLong(0))
    timed(s"conformal OOD gate, IVF-routed (${nVec / 2} ref, ${nVec / 4} test)")(
      graft.queries.Pipeline.q321ConformalIvf(spark, embDir)
        .agg(count(lit(1)).as("n"), sum(col("flagged").cast("long")))
        .collect()(0).getLong(0))
    timed(s"hubness brute baseline (q290 shape, % max(4, n/500) subset)")(
      graft.queries.Pipeline.q290Hubness(spark, embDir)
        .agg(count(lit(1)).as("n"), sum(col("n_points")))
        .collect()(0).getLong(0))
    timed(s"dbscan brute baseline (q314 shape, % max(4, n/500) subset)")(
      graft.queries.Pipeline.q314DbscanCore(spark, embDir)
        .groupBy(col("role")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n"), sum(col("n")))
        .collect()(0).getLong(0))
    timed(s"conformal brute baseline (q297 shape, count-derived splits)")(
      graft.queries.Pipeline.q297ConformalOod(spark, embDir)
        .agg(count(lit(1)).as("n"), sum(col("flagged").cast("long")))
        .collect()(0).getLong(0))
    spark.stop()
  }
}
