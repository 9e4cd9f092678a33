package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 isolated A/B evidence for the tokenizer-chain rework: times
  * the frozen-merge apply chain (bpeSegment — now a single
  * materializing job instead of per-round collects that silently
  * re-derived the whole prefix), the trainers (deferred-unpersist +
  * derived n_symbols_after), and the suite-order memo composition
  * (q224 trains+segments once; q235/q267 read the memoized frame).
  * Fresh JVM per run (rule 13): `tools/run.sh graft.tools.R13TokenProbe`.
  */
object R13TokenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[r13probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    // 1. train chain alone (97% split, 3 rounds)
    val merges = t("bpe train chain (97% split)") {
      graft.operators.Curation.bpeTrainedMerges(
        d.filter(col("doc_id") % 97 =!= 0), "text", rounds = 3)
    }
    // 2. frozen apply chain alone on the held-out split
    t("bpe apply chain (held-out segment)") {
      val segs = graft.operators.Curation.bpeSegment(
        d.filter(col("doc_id") % 97 === 0), "text", merges)
      val n = segs.count()
      segs.unpersist()
      n
    }
    // 3. suite-order composition: q224 (train+segment+memo), then the
    // two downstream consumers of the memoized frame
    t("q224 (pays train + segment)") {
      graft.queries.Curation.q224BpeHeldout(spark, dir).collect().length
    }
    t("q235 (memoized segments)") {
      graft.queries.Curation.q235BpeFertility(spark, dir).collect().length
    }
    t("q213 (pays full-corpus train)") {
      graft.queries.Curation.q213BpeMerges(spark, dir).collect().length
    }
    t("q216 (memoized train)") {
      graft.queries.Curation.q216BpeVocab(spark, dir).collect().length
    }
    t("q263 (pays unigram train + orbit)") {
      graft.queries.Curation.q263UnigramHeldout(spark, dir).collect().length
    }
    t("q265 (memoized starts)") {
      graft.queries.Curation.q265UnigramFertility(spark, dir).collect().length
    }
    t("q267 (memoized segments + starts)") {
      graft.queries.Curation.q267TokenizerAgreement(spark, dir).collect().length
    }
    t("q281 (pays wp train + segment)") {
      graft.queries.Curation.q281WordpieceHeldout(spark, dir).collect().length
    }
    t("q282 (memoized wp segments)") {
      graft.queries.Curation.q282WordpieceFertility(spark, dir).collect().length
    }
    spark.stop()
  }
}
