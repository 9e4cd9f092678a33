package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward join picks latest right row at-or-before left ts") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 8L, 100.0), (1L, 15L, 110.0), (1L, 20L, 120.0), (3L, 1L, 999.0))
      .toDF("k", "ts", "px")
    val got = TemporalJoins.asofJoinBackward(trades, quotes, "k", "ts", "ts",
      rightPayload = Seq("px"))
      .orderBy("k", "ts").collect()
    // t1@10 → quote@8 (100); t2@20 → quote@20 (120, tie inclusive);
    // t3 (k=2) → no quote → null
    assert(got.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq ===
      Seq((1L, 10L, 100.0), (1L, 20L, 120.0), (2L, 5L, -1.0)))
  }

  test("asof backward with tolerance nulls stale matches, keeps rows") {
    val trades = Seq((1L, 10L, "t1"), (1L, 100L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 8L, 100.0), (1L, 15L, 110.0))
      .toDF("k", "ts", "px")
    val got = TemporalJoins.asofJoinBackwardTolerance(trades, quotes,
        "k", "ts", "ts", rightPayload = Seq("px"), toleranceMicros = 10L)
      .orderBy("k", "ts").collect()
    // t1@10 → quote@8 (gap 2 ≤ 10, kept); t2@100 → nearest is quote@15
    // (gap 85 > 10 → NULLED, row survives); t3 → no quote → null
    assert(got.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq ===
      Seq((1L, 10L, 100.0), (1L, 100L, -1.0), (2L, 5L, -1.0)))
    // zero tolerance: only exact-timestamp matches survive
    val exact = TemporalJoins.asofJoinBackwardTolerance(trades, quotes,
        "k", "ts", "ts", rightPayload = Seq("px"), toleranceMicros = 0L)
      .orderBy("k", "ts").collect()
    assert(exact.forall(_.isNullAt(3)))
  }

  test("asof forward join picks earliest right row at-or-after left ts") {
    val clicks = Seq((1L, 10L, "c1"), (1L, 20L, "c2"), (2L, 5L, "c3"))
      .toDF("k", "ts", "click")
    val buys = Seq((1L, 12L, 100L), (1L, 20L, 120L), (1L, 30L, 130L), (3L, 1L, 999L))
      .toDF("k", "ts", "pid")
    val got = TemporalJoins.asofJoinForward(clicks, buys, "k", "ts", "ts",
      rightPayload = Seq("pid"), rightTieBreak = Some("pid"))
      .orderBy("k", "ts").collect()
    // c1@10 → buy@12 (100); c2@20 → buy@20 (120, tie inclusive);
    // c3 (k=2) → no buy → null
    assert(got.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq ===
      Seq((1L, 10L, 100L), (1L, 20L, 120L), (2L, 5L, -1L)))
    // deterministic tie pick among right rows sharing (k, ts): lowest pid
    val dupBuys = Seq((1L, 12L, 101L), (1L, 12L, 100L)).toDF("k", "ts", "pid")
    val tied = TemporalJoins.asofJoinForward(clicks, dupBuys, "k", "ts", "ts",
      rightPayload = Seq("pid"), rightTieBreak = Some("pid"))
      .filter(col("ts") === 10L).collect()
    assert(tied(0).getLong(3) === 100L)
  }

  test("NATIVE as-of join exec: fixture semantics, ties, left-outer nulls") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L), (3L, 9L, 4L))
      .toDF("user_id", "ts", "event_id")
    val buys = Seq((1L, 8L, 100L), (1L, 8L, 101L), (1L, 15L, 102L), (2L, 6L, 103L))
      .toDF("user_id", "ts", "event_id")
    val out = graft.plans.AsOfJoin(clicks, buys, "user_id", "ts", "ts",
        payloadCols = Seq("event_id", "ts"), tieBreak = Some("event_id"))
      .orderBy("user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 10L, 101L), // latest ts<=10 is 8; tie (100,101) -> max id 101
      (1L, 20L, 102L), // 15 < 20
      (2L, 5L, -1L),   // buy at 6 is AFTER 5 -> no match (left outer)
      (3L, 9L, -1L)))  // key has no right rows at all
  }

  test("NATIVE as-of join: plan contains AsOfJoinExec and equals the composed operator") {
    val e = graft.sources.Events.ev(spark, "/root/testdata/sf0.01")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val native = graft.plans.AsOfJoin(purchases, clicks, "user_id", "ts", "ts",
      payloadCols = Seq("event_id", "ts"), tieBreak = Some("event_id"))
    // SparkPlan.nodeName strips the "Exec" suffix, so the physical
    // node prints as "AsOfJoin" inside the executed (physical) plan
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin "),
      "the custom strategy must plan the custom exec")
    val a = native
      .select(col("event_id"), col("asof_event_id"), col("asof_ts"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getTimestamp(2).getTime))
    val b = graft.operators.TemporalJoins
      .asofJoinBackward(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("event_id", "ts"), rightTieBreak = Some("event_id"))
      .select(col("event_id"), col("asof_event_id"), col("asof_ts"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getTimestamp(2).getTime))
    assert(a.length === b.length && a.toSeq === b.toSeq)
  }

  test("NATIVE as-of FORWARD: earliest at-or-after, least-id ties, null when none follows") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 1L), (1L, 16L, 2L), (2L, 5L, 3L))
      .toDF("user_id", "ts", "event_id")
    val buys = Seq((1L, 12L, 100L), (1L, 12L, 99L), (1L, 15L, 102L), (2L, 3L, 103L))
      .toDF("user_id", "ts", "event_id")
    val out = graft.plans.AsOfJoin(clicks, buys, "user_id", "ts", "ts",
        payloadCols = Seq("event_id"), tieBreak = Some("event_id"), forward = true)
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 10L, 99L),  // earliest ts>=10 is 12; tie (99,100) -> LEAST id
      (1L, 16L, -1L),  // nothing at-or-after 16
      (2L, 5L, -1L)))  // buy at 3 is before -> no match
    // same right row can serve consecutive lefts
    val c2 = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("user_id", "ts", "event_id")
    val b2 = Seq((1L, 5L, 50L)).toDF("user_id", "ts", "event_id")
    val shared = graft.plans.AsOfJoin(c2, b2, "user_id", "ts", "ts",
        payloadCols = Seq("event_id"), tieBreak = None, forward = true)
      .collect().map(_.getLong(3)).toSeq
    assert(shared === Seq(50L, 50L))
  }

  test("NATIVE as-of forward equals the composed forward operator on real data") {
    val e = graft.sources.Events.ev(spark, "/root/testdata/sf0.01")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("asof_event_id"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val native = norm(graft.plans.AsOfJoin(clicks, purchases, "user_id", "ts", "ts",
      payloadCols = Seq("event_id"), tieBreak = Some("event_id"), forward = true))
    val composed = norm(graft.operators.TemporalJoins
      .asofJoinForward(clicks, purchases, "user_id", "ts", "ts",
        rightPayload = Seq("event_id"), rightTieBreak = Some("event_id")))
    assert(native === composed)
  }

  test("NATIVE as-of join reuses a single-side key layout; composed re-shuffles the big side") {
    // With BOTH sides pre-partitioned the union formulation also keeps
    // the layout (Spark propagates matching child partitionings through
    // Union — measured, not assumed). The structural difference shows
    // when only ONE side is laid out: the classic 100 TB case of a huge
    // key-partitioned fact (left) probed as-of against a small update
    // stream (right).
    val e = graft.sources.Events.ev(spark, "/root/testdata/sf0.001")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .repartition(4, col("user_id")) // the pre-partitioned big side
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id")) // no layout
    val native = graft.plans.AsOfJoin(purchases, clicks, "user_id", "ts", "ts",
      payloadCols = Seq("event_id"), tieBreak = Some("event_id"))
    val nativePlan = native.queryExecution.executedPlan.toString
    // exactly ONE ensure-requirements exchange — on the RIGHT branch;
    // the left's explicit repartition satisfies ClusteredDistribution
    assert(nativePlan.split("ENSURE_REQUIREMENTS").length - 1 === 1,
      s"native must only shuffle the un-partitioned side:\n$nativePlan")
    val leftBranch = nativePlan.substring(nativePlan.indexOf(":- "),
      nativePlan.indexOf("+- Sort", nativePlan.indexOf(":- ")))
    assert(!leftBranch.contains("ENSURE_REQUIREMENTS"),
      s"left branch must reuse its layout:\n$leftBranch")
    val composed = graft.operators.TemporalJoins
      .asofJoinBackward(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("event_id"), rightTieBreak = Some("event_id"))
    val composedPlan = composed.queryExecution.executedPlan.toString
    // the mixed-layout union collapses to unknown partitioning: the
    // window's exchange sits ABOVE the Union, moving the big side AGAIN
    val exIdx = composedPlan.indexOf("ENSURE_REQUIREMENTS")
    val unionIdx = composedPlan.indexOf("Union")
    assert(exIdx >= 0 && unionIdx > exIdx,
      s"composed re-shuffles the whole union:\n$composedPlan")
    // same rows either way
    assert(native.count() === composed.count())
  }

  test("banded range join equals naive inequality join") {
    val a = Seq((1L, 100L, 1L), (1L, 500L, 2L), (2L, 100L, 3L))
      .toDF("k", "us_a", "id_a")
      .withColumn("ts_a", timestamp_micros(col("us_a"))).drop("us_a")
    val b = Seq((1L, 150L, 10L), (1L, 2000L, 11L), (2L, 50L, 12L))
      .toDF("k", "us_b", "id_b")
      .withColumn("ts_b", timestamp_micros(col("us_b"))).drop("us_b")
    val banded = TemporalJoins.bandedRangeJoin(a, b, "k", "ts_a", "ts_b", 100L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b, Seq("k"))
      .filter(abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))) <= 100L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(banded === Set((1L, 10L), (3L, 12L)))
  }
}
