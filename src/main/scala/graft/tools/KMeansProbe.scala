package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated repro for the ×100 k-means timing anomaly (PERF.md round-4
  * section): times [[graft.operators.Similarity.trainCentroids]] on the
  * ScaleStress embedding table (/tmp/graft_stress_emb, 200 k × 64-d)
  * at 16 and 100 cells, cold and repeated — to separate Lloyd-iteration
  * compute from one-time driver-side costs (Catalyst analysis/codegen
  * of the numCells-wide assign expression).
  */
object KMeansProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/tmp/graft_stress_emb")
    println(s"[probe] vectors: ${emb.count()}")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    import graft.functions.VectorFunctions.{vec_mat_argmax, vec_normalize}
    val cents0 = Array.tabulate(100, 64)((r, c) => math.sin(r * 64 + c))
    val vs = emb.select(vec_normalize(col("embedding")).as("v"))
    timed("argmax only, 100 cells (forced)")(
      vs.select(vec_mat_argmax(col("v"), cents0).as("cell"))
        .agg(sum("cell")).collect())
    timed("argmax only, repeat")(
      vs.select(vec_mat_argmax(col("v"), cents0).as("cell"))
        .agg(sum("cell")).collect())
    timed("explode + fixed-point sum only (no argmax)")(
      vs.select(lit(0).as("cell"), posexplode(col("v")))
        .select(col("cell"), col("pos"),
          floor(col("col") * lit(1e12)).cast("long").as("fx"))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("fx").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect())
    timed("argmax + explode + sum (one iteration, fused)")(
      vs.withColumn("cell", vec_mat_argmax(col("v"), cents0))
        .select(col("cell"), posexplode(col("v")))
        .select(col("cell"), col("pos"),
          floor(col("col") * lit(1e12)).cast("long").as("fx"))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("fx").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect())
    timed("trainCentroids 100 cells, 2 iters")(
      graft.operators.Similarity.trainCentroids(emb, "embedding", 100, 2, 64))
    spark.stop()
  }
}
