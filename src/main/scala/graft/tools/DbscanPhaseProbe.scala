package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Piecewise breakdown of the dbscanCellRoles ×N cost (rule 12: blame
  * by measurement, not narrative): training vs assignment vs the
  * within-cell pair stage, plus the per-grid cell-size census that
  * decides whether a straggler cell dominates the join stage. */
object DbscanPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = spark.read.parquet("/tmp/graft_stress_emb_dir/embeddings.parquet")
    val n = emb.count()
    val cells = math.max(16L, n / 500L).toInt
    println(s"[probe] $n vectors, $cells cells")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val base = emb.select(col("vec_id").as("id"),
        Similarity.normalized(col("embedding")).as("nv"))
      .select(col("id"), col("nv"),
        transform(col("nv"),
          x => floor(x.cast("double") * lit(1e6)).cast("double")).as("f"))
      .localCheckpoint(eager = true)
    val cents = (0 until 3).map { g =>
      timed(s"train grid $g (2 iters, $cells cells)")(
        Similarity.trainCentroids(base, "nv", cells, 2, 64, seed = 42L + 7L * g))
    }
    // census: per-grid cell-size distribution (the straggler question)
    for (g <- 0 until 3) {
      val asg = base.select(col("id"),
        graft.functions.VectorFunctions.vec_mat_argmax(col("nv"), cents(g)).as("cell"))
      val cs = asg.groupBy(col("cell")).agg(count(lit(1)).as("m"))
      val row = cs.agg(max(col("m")), expr("percentile(m, 0.99)"),
        expr("percentile(m, 0.9)"), avg(col("m")),
        sum(expr("m * m")).as("pairs")).collect()(0)
      println(s"[probe] grid $g census: max=${row.get(0)} p99=${row.get(1)} " +
        s"p90=${row.get(2)} avg=${row.get(3)} sum(m^2)=${row.get(4)}")
    }
    // pair stage alone, per grid (in-stream scoring, survivors only;
    // round-12 shape: checkpointed assignment + aggregate census +
    // map-only isin drop — the operator's own guard, sort-free)
    val theta = 250000000000L
    val grids = (0 until 3).map { g =>
      val asg0 = base.select(col("id"),
          graft.functions.VectorFunctions.vec_mat_argmax(col("nv"), cents(g)).as("cell"),
          col("f"))
        .localCheckpoint(eager = true)
      val overfull = asg0.groupBy(col("cell"))
        .agg(count(lit(1)).as("cell_n"))
        .filter(col("cell_n") > lit(10000)).collect()
      println(s"[probe] grid $g dropped_cells=${overfull.length} " +
        s"dropped_rows=${overfull.map(_.getLong(1)).sum}")
      val asg =
        if (overfull.isEmpty) asg0
        else asg0.filter(!col("cell").isin(overfull.map(_.get(0)): _*))
      def pairStage = asg.select(col("id").as("ia"), col("f").as("fa"), col("cell"))
        .join(asg.select(col("id").as("ib"), col("f").as("fb"), col("cell")), Seq("cell"))
        .filter(col("ia") =!= col("ib"))
        .filter(Similarity.dot(col("fa"), col("fb")) >= lit(theta.toDouble))
        .select(col("ia"), col("ib"))
      timed(s"pair stage grid $g (join+dot+filter, survivors count)")(
        println("  survivors: " + pairStage.count()))
      pairStage
    }
    // the stages the first probe cut missed (r13): the cross-grid
    // distinct + eager checkpoint materializes the ~100M survivor-pair
    // frame (two longs per row), then the neighbor-count aggregate and
    // the border semi-join each read it back. NOTE: the per-grid joins
    // re-execute inside the distinct (piecewise double-count, rule 13
    // parts-vs-fused discipline — subtract the per-grid numbers above
    // to isolate the distinct+checkpoint increment).
    val nbPairs = timed("union + distinct + eager checkpoint (survivor pairs)") {
      val p = grids.reduce(_ union _).distinct().localCheckpoint(eager = true)
      println("  distinct pairs: " + p.count())
      p
    }
    val pts = timed("neighbor-count aggregate + core flags") {
      val nb = nbPairs.groupBy(col("ia")).agg(count(lit(1)).as("n_nb"))
      val p = emb.select(col("vec_id").as("id"))
        .join(nb, col("id") === nb("ia"), "left_outer")
        .select(col("id"), coalesce(col("n_nb"), lit(0L)).as("n_nb"))
        .withColumn("is_core", col("n_nb") >= lit(8L))
        .localCheckpoint(eager = true)
      println("  cores: " + p.filter(col("is_core")).count())
      p
    }
    timed("border semi-join + role fold") {
      val coreIds = pts.filter(col("is_core")).select(col("id").as("ib"))
      val nearCore = nbPairs.join(coreIds, Seq("ib"), "left_semi")
        .select(col("ia").as("id")).distinct()
        .withColumn("near_core", lit(true))
      println("  roles: " + pts.join(nearCore, Seq("id"), "left_outer")
        .select(when(col("is_core"), "core")
          .when(coalesce(col("near_core"), lit(false)), "border")
          .otherwise("noise").as("role"))
        .groupBy(col("role")).count().collect().toSeq)
    }
    spark.stop()
  }
}

/** The fused counterpart: run the FULL dbscanCellRoles operator twice
  * in one JVM — the first execution is the fresh-JVM number (what a
  * production ingest pays once per process), the second is the warm
  * number (what every subsequent audit pays). The gap, compared
  * against DbscanPhaseProbe's piecewise stage sum, attributes the
  * fresh cost: if the piecewise stages are individually cheap in the
  * SAME fresh JVM, the spread is first-execution JIT/codegen of the
  * fused pipeline, not any one stage's algorithm. */
object DbscanFullProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/tmp/graft_stress_emb_dir/embeddings.parquet")
    println(s"[probe] ${emb.count()} vectors")
    for (run <- Seq("fresh", "warm")) {
      val t0 = System.nanoTime()
      val roles = graft.operators.Similarity.dbscanCellRoles(
        emb, "vec_id", "embedding", thetaFx = 250000000000L,
        minPts = 8L, grids = 3, dim = 64)
        .groupBy(col("role")).count().collect().toSeq
      println(f"[probe] full dbscanCellRoles ($run): ${(System.nanoTime() - t0) / 1e9}%.1f s $roles")
    }
    spark.stop()
  }
}
