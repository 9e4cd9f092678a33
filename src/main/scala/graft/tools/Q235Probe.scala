package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated q235 timing (rule 13; round-9 verdict item 4 / round-8
  * item 6): three consecutive fresh-JVM-context runs at sf0.1, plus a
  * decomposition run timing the shared train chain (bpeTrainedMerges)
  * alone — the candidate trim is reusing q224's collected merge list
  * instead of re-running the 6 train rounds.
  */
object Q235Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.queries.Curation
        .q235BpeFertility(spark, dir).collect().length
      println(f"[probe] q235 run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    // shared-JVM suite order: q224 first (trains + memoizes), q235 reuses
    locally {
      val t0 = System.nanoTime()
      graft.queries.Curation.q224BpeHeldout(spark, dir).collect()
      val t1 = System.nanoTime()
      graft.queries.Curation.q235BpeFertility(spark, dir).collect()
      val t2 = System.nanoTime()
      println(f"[probe] suite order: q224 ${(t1 - t0) / 1e9}%.1f s, then q235 ${(t2 - t1) / 1e9}%.1f s (memo hit)")
    }
    // decomposition: the frozen-merges training chain alone
    val t0 = System.nanoTime()
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val m = graft.operators.Curation.bpeTrainedMerges(
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
      "text", rounds = 3)
    println(f"[probe] train chain alone: ${(System.nanoTime() - t0) / 1e9}%.1f s (${m.length} merges)")
    spark.stop()
  }
}
