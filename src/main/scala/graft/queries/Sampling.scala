package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Curation => C, Sampling => S}

/** Sampling / data-mixing queries (q69-q71): deterministic stratified
  * sampling for corpus mixing, skew-safe per-group caps, and
  * statistical-LM quality scoring — the subset-selection layer of a
  * training-data pipeline. All DuckDB oracle-gated (portable integer
  * hash, exact window ranks, fixed-point log-probabilities).
  */
object Sampling {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private val toksSql = raw"string_split_regex(TRIM(text), '\s+')"

  // -------------------------------------------------------------------
  // q69: stratified mixing sample — downsample dominant 'en' to 50%,
  // keep 'zh' at 80%, everything else at 25%; membership by portable
  // hash so the oracle replays the exact arithmetic. Map-only (the
  // rate CASE + one hash compare ride the scan); per-(lang, source)
  // kept-counts and id-sums make the gate membership-exact.
  // -------------------------------------------------------------------
  private val mixRates = Map("en" -> 0.5, "zh" -> 0.8)
  private val mixDefault = 0.25
  private val mixSeed = 11L

  def q69StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    S.stratifiedSample(docs(spark, dir), "doc_id", "lang",
        mixRates, mixDefault, mixSeed)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(asc("lang"), asc("source"))

  val q69Sql: String = {
    def thr(r: Double) = math.floor(r * 4294967296.0).toLong
    val h = C.portableHashSql("doc_id", mixSeed)
    s"""SELECT lang, source, COUNT(*) AS n_kept,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
       |FROM documents
       |WHERE $h < CASE lang WHEN 'en' THEN ${thr(0.5)}
       |                     WHEN 'zh' THEN ${thr(0.8)}
       |                     ELSE ${thr(0.25)} END
       |GROUP BY lang, source ORDER BY lang, source""".stripMargin
  }

  // -------------------------------------------------------------------
  // q70: per-source cap — keep the 10 longest docs per source
  // (n_chars desc, doc_id tie-break). Runs the two-phase salted
  // window (no hot-group reducer; see Sampling.capPerGroup), which is
  // provably identical to the single-window rank the oracle computes.
  // -------------------------------------------------------------------
  def q70GroupCap(spark: SparkSession, dir: String): DataFrame =
    S.capPerGroup(docs(spark, dir), "doc_id", "source", 10,
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select(col("doc_id"), col("source"), col("n_chars"), col("rank_in_group"))
      .orderBy(asc("source"), asc("rank_in_group"))

  val q70Sql: String =
    """WITH r AS (
      |  SELECT doc_id, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rank_in_group
      |  FROM documents)
      |SELECT doc_id, source, n_chars, CAST(rank_in_group AS BIGINT) AS rank_in_group
      |FROM r WHERE rank_in_group <= 10 ORDER BY source, rank_in_group""".stripMargin

  // -------------------------------------------------------------------
  // q71: bigram-LM quality score — add-one-smoothed bigram model
  // trained on the corpus itself, every document scored by its total
  // fixed-point log-probability (PERF.md lesson 7: Σ floor(1e6·ln P)
  // is an associative integer sum, so the oracle compares exactly).
  // -------------------------------------------------------------------
  def q71BigramLm(spark: SparkSession, dir: String): DataFrame =
    C.bigramLmScore(docs(spark, dir), "doc_id", "text")
      .orderBy(asc("doc_id"))

  val q71Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, $toksSql AS t FROM documents
      |), pos AS (
      |  SELECT doc_id, t, UNNEST(range(1, LEN(t))) AS i FROM toks
      |), bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM pos
      |), uni AS (
      |  SELECT w, COUNT(*) AS u_cnt
      |  FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY w
      |), v AS (
      |  SELECT COUNT(*) AS v_size FROM uni
      |), big AS (
      |  SELECT w1, w2, COUNT(*) AS b_cnt FROM bg GROUP BY w1, w2
      |)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(FLOOR(1e6 * LN(
      |    CAST(b_cnt + 1 AS DOUBLE) / (u_cnt + v_size)))) AS BIGINT)
      |    AS sum_fp_logprob
      |FROM bg JOIN big USING (w1, w2) JOIN uni ON bg.w1 = uni.w CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q225: CROSS-SPLIT LM quality filter (the actual CCNet recipe; q71
  // is the self-trained variant): the add-one bigram model trains on
  // the CLEAN slice only (lang = 'en'), every document — all five
  // languages — is scored with the frozen counts. Out-of-model
  // bigrams/unigrams floor at 0, so non-English text scores low
  // because the MODEL never saw it, which is precisely the filter
  // signal. Fixed-point Σ floor(1e6·ln P) integer sums ⇒ exact hash
  // compare; both model tables broadcast (deterministic top-50k cap),
  // scored corpus scanned once.
  // -------------------------------------------------------------------
  def q225LmFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    C.bigramLmScoreCross(d, d.filter(col("lang") === "en"),
        "doc_id", "text", maxVocab = 50000)
      .orderBy(asc("doc_id"))
  }
  val q225Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, $toksSql AS t FROM documents
      |), etoks AS (
      |  SELECT doc_id, $toksSql AS t FROM documents WHERE lang = 'en'
      |), pos AS (
      |  SELECT doc_id, t, UNNEST(range(1, LEN(t))) AS i FROM toks
      |), bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM pos
      |), epos AS (
      |  SELECT doc_id, t, UNNEST(range(1, LEN(t))) AS i FROM etoks
      |), ebg AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2 FROM epos
      |), uni AS (
      |  SELECT w, COUNT(*) AS u_cnt
      |  FROM (SELECT UNNEST(t) AS w FROM etoks) GROUP BY w
      |), v AS (
      |  SELECT COUNT(*) AS v_size FROM uni
      |), big AS (
      |  SELECT w1, w2, b_cnt FROM (
      |    SELECT w1, w2, COUNT(*) AS b_cnt FROM ebg GROUP BY w1, w2
      |    ORDER BY b_cnt DESC, w1, w2 LIMIT 50000)
      |)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(FLOOR(1e6 * LN(
      |    CAST(COALESCE(b_cnt, 0) + 1 AS DOUBLE)
      |      / (COALESCE(u_cnt, 0) + v_size)))) AS BIGINT) AS sum_fp_logprob
      |FROM bg LEFT JOIN big USING (w1, w2)
      |LEFT JOIN uni ON bg.w1 = uni.w CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q94: mixture resampling toward target source weights — rates
  // derived from ACTUAL per-source counts (min(1, w·target/n_s)), so
  // the oracle recomputes the identical thresholds from SQL counts:
  // same double ops in the same order, floor'd to the same integer
  // hash threshold. Budget = |docs| div 5 keeps the query meaningful
  // at every scale factor.
  // -------------------------------------------------------------------
  private val mixWeights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2)

  def q94MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    S.mixtureSample(d, "doc_id", "source", mixWeights.toMap,
        totalTarget = d.count() / 5, seed = 7L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(asc("source"))
  }
  val q94Sql: String = {
    val h = C.portableHashSql("doc_id", 7L)
    val cases = mixWeights.map { case (s, w) =>
      s"WHEN '$s' THEN CAST(FLOOR(LEAST(1.0, $w * tt / ns) * 4294967296.0) AS BIGINT)"
    }.mkString("\n      |    ")
    s"""WITH t AS (
       |  SELECT COUNT(*) // 5 AS tt FROM documents
       |), n AS (
       |  SELECT source, COUNT(*) AS ns FROM documents GROUP BY source
       |), r AS (
       |  SELECT source, CASE source
       |    $cases
       |    ELSE 0 END AS thr
       |  FROM n CROSS JOIN t
       |)
       |SELECT d.source, COUNT(*) AS n_sampled,
       |  CAST(SUM(d.doc_id) AS BIGINT) AS sum_ids
       |FROM documents d JOIN r ON d.source = r.source
       |WHERE $h < r.thr
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  // -------------------------------------------------------------------
  // q128: weighted sampling without replacement — priority sampling
  // (Duffield-Lund-Thorup): 200 orders with probability ∝ o_totalprice.
  // priority = w_cents / u is ONE IEEE division of two exact integers
  // (weight through DECIMAL·100, u from the portable hash), so the
  // oracle replays it bit-for-bit; ties break on o_orderkey. Plans as
  // TakeOrderedAndProject — map-only, no global sort, k·partitions
  // rows to the merge.
  // -------------------------------------------------------------------
  def q128PrioritySample(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long").as("w_cents"))
    S.prioritySample(orders, "o_orderkey", col("w_cents"), k = 200, seed = 42L)
      .select(col("o_orderkey"), col("w_cents"), col("priority"))
      .orderBy(desc("priority"), asc("o_orderkey"))
  }
  val q128Sql: String = {
    val u = s"(${graft.operators.Curation.portableHashSql("o_orderkey", 42L)} + 1)"
    raw"""WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS w_cents,
      |    $u AS u
      |  FROM orders
      |)
      |SELECT o_orderkey, w_cents,
      |  CAST(w_cents AS DOUBLE) / CAST(u AS DOUBLE) AS priority
      |FROM s ORDER BY priority DESC, o_orderkey LIMIT 200""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_stratified_sample" -> (q69StratifiedSample _),
    "q70_group_cap" -> (q70GroupCap _),
    "q71_bigram_lm" -> (q71BigramLm _),
    "q225_lm_filter" -> (q225LmFilter _),
    "q94_mixture_sample" -> (q94MixtureSample _),
    "q128_priority_sample" -> (q128PrioritySample _))

  val oracle: Map[String, String] = Map(
    "q69_stratified_sample" -> q69Sql,
    "q70_group_cap" -> q70Sql,
    "q71_bigram_lm" -> q71Sql,
    "q225_lm_filter" -> q225Sql,
    "q94_mixture_sample" -> q94Sql,
    "q128_priority_sample" -> q128Sql)
}
