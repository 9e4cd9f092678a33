package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated fresh-JVM timings (rule 13) for the tokenizer-chain
  * queries after the round-10 mid-session bench read them 2-4× their
  * ledger values (q224 35.4 s, q281 23.9 s, q216 11.1 s in a window
  * whose scan-bound median ratio was only 1.106): suite-order replay
  * of the BPE chain (q224 trains+memoizes, q235 reuses) and the new
  * WordPiece chain (q281 trains+memoizes, q282 reuses), plus q216 —
  * distinguishes an erratic host window from a real regression.
  */
object Q281Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    t("q213_bpe_merges")(graft.queries.Curation.q213BpeMerges(spark, dir).collect())
    t("q216_bpe_vocab")(graft.queries.Curation.q216BpeVocab(spark, dir).collect())
    t("q224_bpe_heldout (trains)")(graft.queries.Curation.q224BpeHeldout(spark, dir).collect())
    t("q235_bpe_fertility (memo hit)")(graft.queries.Curation.q235BpeFertility(spark, dir).collect())
    t("q281_wordpiece_heldout (trains)")(graft.queries.Curation.q281WordpieceHeldout(spark, dir).collect())
    t("q282_wordpiece_fertility (memo hit)")(graft.queries.Curation.q282WordpieceFertility(spark, dir).collect())
    spark.stop()
  }
}
