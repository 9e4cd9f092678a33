package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the per-cell delta-mass fraction behind q328's drift
  * threshold (rule 9: measure before parameterizing). For each scale:
  * train the base quantizer (label % 5 != 0), assign the combined
  * corpus to the frozen cells, and print each cell's (base, delta,
  * delta-fraction) — the distribution the drift threshold must cut
  * THROUGH (a threshold above the max is all-stale, below the min is
  * all-retrain; both degenerate the operating curve's middle point).
  */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val isNew = graft.operators.Similarity.normalized(col("embedding"))
        .getItem(0) > lit(0.10)
      val stale = graft.operators.Similarity.trainCentroids(
        e.filter(!isNew), "embedding", numCells = 16, iters = 2, dim = 64)
      val (_, audit) = graft.operators.Similarity.incrementalRetrain(
        e.withColumn("is_new", isNew), "embedding", "is_new", stale,
        dim = 64, driftNum = 0L, driftDen = 1L) // threshold 0: audit only
      println(s"== $dir ==")
      audit.foreach { case (c, nb, nd, _) =>
        val f = if (nb + nd > 0) nd.toDouble / (nb + nd) else 0.0
        println(f"  cell $c%2d: base=$nb%6d delta=$nd%6d frac=$f%.3f")
      }
      val fracs = audit.filter(t => t._2 + t._3 > 0)
        .map(t => t._3.toDouble / (t._2 + t._3)).sorted
      println(f"  frac min=${fracs.head}%.3f median=${fracs(fracs.size / 2)}%.3f max=${fracs.last}%.3f")
    }
    spark.stop()
  }
}
