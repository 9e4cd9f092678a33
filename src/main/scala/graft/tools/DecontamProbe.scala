package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated re-run of the ×100 semantic-decontamination stress phase
  * (PERF.md rule 13: a slow full-harness number proves nothing — the
  * harness carries 2-3× phase-order/JVM noise). Reads the stress
  * corpus ScaleStress left at /tmp/graft_stress_emb and times ONLY
  * the decontam pass, thrice, in a fresh JVM.
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/tmp/graft_stress_emb")
    println(s"[probe] ${emb.count()} vectors")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.semanticDecontaminate(
        emb.filter(pmod(col("vec_id"), lit(997)) =!= 0),
        emb.filter(pmod(col("vec_id"), lit(997)) === 0),
        "vec_id", "vec_id", "embedding", "embedding", tau = 0.30).count()
      println(f"[probe] decontam run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
