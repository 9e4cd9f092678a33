package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Sampling}

/** Specs for the sampling / mixing operators: determinism, nesting,
  * the two-phase cap's exact equivalence to the single-window rank,
  * and the bigram LM's hand-checkable fixture.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("sampleAt is deterministic, order-independent and roughly proportional") {
    val ids = (0L until 10000L).toDF("id")
    val kept = ids.filter(Sampling.sampleAt(col("id"), 3L, 0.3)).count()
    assert(kept > 2700 && kept < 3300)
    val shuffled = ids.orderBy(rand(5)).filter(Sampling.sampleAt(col("id"), 3L, 0.3))
    assert(shuffled.count() === kept)
  }

  test("samples nest: rate 0.2 is a subset of rate 0.6 at the same seed") {
    val ids = (0L until 5000L).toDF("id")
    val small = ids.filter(Sampling.sampleAt(col("id"), 9L, 0.2))
    val large = ids.filter(Sampling.sampleAt(col("id"), 9L, 0.6))
    assert(small.except(large).count() === 0)
    assert(small.count() < large.count())
  }

  test("stratifiedSample applies per-stratum rates") {
    val df = (0L until 6000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val out = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 0.9), defaultRate = 0.1, seed = 4L)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") > 2500 && out("a") <= 3000) // ~90% of 3000
    assert(out("b") > 150 && out("b") < 450)    // ~10% of 3000
  }

  test("capPerGroup equals the single-window rank exactly, under skew") {
    // one hot group (5000 rows) + small groups; value ties to force
    // the doc-id tie-break through both phases
    val rows = (0L until 5000L).map(i => (i, "hot", i % 7)) ++
      (5000L until 5030L).map(i => (i, "cold", i % 3))
    val df = rows.toDF("id", "g", "v")
    val capped = Sampling.capPerGroup(df, "id", "g", 12,
        Seq(col("v").desc, col("id").asc), salts = 8)
      .select("id", "g", "rank_in_group")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val reference = df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= 12).select("id", "g", "rank_in_group")
    assert(capped.except(reference).count() === 0)
    assert(reference.except(capped).count() === 0)
  }

  test("takeSample returns exactly n rows and is seed-stable") {
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.takeSample(df, "id", 50, 13L).select("id")
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.takeSample(df.orderBy(rand(2)), "id", 50, 13L).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(a.length === 50)
    assert(a === b) // same rows in the same order, input order ignored
    val c = Sampling.takeSample(df, "id", 50, 14L).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(a !== c) // seed changes the sample
  }

  test("broadcast-capped LM equals the full join when the cap doesn't bind, floors when it does") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = Curation.bigramLmScore(docs, "doc_id", "text")
    val uncapped = Curation.bigramLmScoreBroadcast(docs, "doc_id", "text", 1000000)
    assert(full.except(uncapped).count() === 0)
    assert(uncapped.except(full).count() === 0)
    // a binding cap can only lower (never raise) a document's score
    val capped = Curation.bigramLmScoreBroadcast(docs, "doc_id", "text", 5)
      .withColumnRenamed("sum_fp_logprob", "capped_fp").drop("n_bigrams")
    val joined = full.join(capped, "doc_id")
      .filter(col("capped_fp") > col("sum_fp_logprob"))
    assert(joined.count() === 0)
  }

  test("mixtureSample thins over-represented strata and caps rate at 1") {
    import spark.implicits._
    // a: 8000 rows, b: 1500, c: 500; target 50/30/20 of 5000 →
    // rates: a = 2500/8000, b = 1, c = 1 (can't invent rows)
    val df = ((0 until 8000).map(i => (i.toLong, "a")) ++
      (8000 until 9500).map(i => (i.toLong, "b")) ++
      (9500 until 10000).map(i => (i.toLong, "c"))).toDF("id", "s")
    val out = graft.operators.Sampling
      .mixtureSample(df, "id", "s", Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2),
        totalTarget = 5000L, seed = 11L)
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("b") === 1500L) // rate capped at 1: every row kept
    assert(out("c") === 500L)
    // hash-thinned to ~2500 of 8000; the portable hash is near-uniform
    assert(out("a") > 2200L && out("a") < 2800L, s"a=${out("a")}")
    // determinism
    val again = graft.operators.Sampling
      .mixtureSample(df, "id", "s", Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2),
        totalTarget = 5000L, seed = 11L).count()
    assert(again === out.values.sum)
  }

  test("bigramLmScore: frequent bigrams score higher; counts are exact") {
    val docs = Seq(
      (1L, "the cat sat"),          // bigrams: (the,cat) (cat,sat)
      (2L, "the cat ran"),          // bigrams: (the,cat) (cat,ran)
      (3L, "xyzzy plugh"))          // singleton bigram
      .toDF("doc_id", "text")
    val out = Curation.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 === 2 && out(2L)._1 === 2 && out(3L)._1 === 1)
    // doc 1 and 2 share the frequent (the,cat) bigram; doc 3's lone
    // hapax bigram must score strictly lower per-bigram
    val perBigram3 = out(3L)._2.toDouble / out(3L)._1
    val perBigram1 = out(1L)._2.toDouble / out(1L)._1
    assert(perBigram1 > perBigram3)
  }

  test("prioritySample matches a Scala replay, favors weight, plans as TakeOrdered") {
    // ids 1..400: even ids carry 100x the weight of odd ids
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) 100000L else 1000L))
    val df = rows.toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", col("w"), k = 50, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    // exact replay of the portable hash + one double division
    def hash(id: Long, seed: Long): Long = {
      val h1 = math.floorMod((id + seed) * 2654435761L, 4294967296L)
      math.floorMod(h1 * 69069L + 1L, 4294967296L)
    }
    val expect = rows.map { case (id, w) => (id, w.toDouble / (hash(id, 7L) + 1L).toDouble) }
      .sortBy { case (id, p) => (-p, id) }.take(50).map(_._1).toSet
    assert(got === expect)
    // heavy rows dominate: ≥ 80% of the sample should be even ids
    assert(got.count(_ % 2 == 0) >= 40)
    // scale shape: top-k must plan as TakeOrdered, not a global Sort
    val plan = Sampling.prioritySample(df, "id", col("w"), k = 50, seed = 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("isqrt is exact at perfect-square boundaries and on a dense sweep") {
    // boundary triples k²−1, k², k²+1 up to (6e6)² ≈ 3.6e13 < 2^52,
    // plus a dense 0..10000 sweep — the two places a bare
    // floor(sqrt(double)) can be off by one
    val ks = Seq(0L, 1L, 2L, 3L, 5L, 999L, 1000L, 65536L, 3037000L, 6000000L)
    val planted = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)).filter(_ >= 0)
    val xs = (planted ++ (0L to 10000L)).distinct.toDF("x")
    val bad = xs.withColumn("s", Sampling.isqrt(col("x")))
      .filter(col("s") * col("s") > col("x") ||
        (col("s") + 1) * (col("s") + 1) <= col("x"))
      .count()
    assert(bad === 0)
  }

  test("rendezvousShard moves only ~1/(N+1) of rows, all to the new shard") {
    val ids = (0L until 20000L).toDF("id")
    val assigned = ids.select(col("id"),
        Sampling.rendezvousShard(col("id"), 3, 500L).as("s3"),
        Sampling.rendezvousShard(col("id"), 4, 500L).as("s4"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // HRW guarantee: a row's old keys are unchanged, so its argmax can
    // only flip TO the newly-added shard (index 3) — never between
    // the old three
    val moved = assigned.filter { case (_, a, b) => a != b }
    assert(moved.forall(_._3 == 3L))
    // expected moved fraction 1/4; allow a generous band
    val frac = moved.length.toDouble / assigned.length
    assert(frac > 0.18 && frac < 0.32, s"moved fraction $frac")
    // all four shards populated, roughly balanced under N=4
    val byShard = assigned.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byShard.keySet === Set(0L, 1L, 2L, 3L))
    assert(byShard.values.forall(n => n > 3500 && n < 6500))
  }
}
