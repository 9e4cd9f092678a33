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
    for (g <- 0 until 3) {
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
      timed(s"pair stage grid $g (join+dot+filter, survivors count)")(
        println("  survivors: " + asg.select(col("id").as("ia"), col("f").as("fa"), col("cell"))
          .join(asg.select(col("id").as("ib"), col("f").as("fb"), col("cell")), Seq("cell"))
          .filter(col("ia") =!= col("ib"))
          .filter(Similarity.dot(col("fa"), col("fb")) >= lit(theta.toDouble))
          .count()))
    }
    spark.stop()
  }
}
