package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Specs for the scale-out operators: salted join result parity and
  * bucketed-join shuffle elimination (plan-shape assertion). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result under skew") {
    // skewed: 90% of left rows share key 1
    val left = (1 to 200).map(i => (if (i <= 180) 1L else i.toLong, i.toLong))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Scale.saltedJoin(left, right, "k", saltFactor = 4)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    // 180 skewed rows hit key 1; keys 181..200 have no right match
    assert(plain.size === 180)
  }

  test("bucketed join plans with no Exchange (co-located)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Scale.writeBucketed(o, "graft_orders_b", "o_orderkey", 8)
    Scale.writeBucketed(l, "graft_lineitem_b", "o_orderkey", 8)
    // disable broadcast so the planner exercises the bucketed SMJ path
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "graft_orders_b", "graft_lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      // bucketed scans are co-located: no shuffle exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === o.join(l, Seq("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q109 registered query: join AND aggregate reuse the bucket clustering") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.Scalars.q109BucketedJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      // the bucket layout satisfies the join AND the groupBy on the
      // bucket key: the ONLY exchange in the plan is the final
      // deterministic ORDER BY (range partitioning)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected hash-shuffle-free plan, got:\n$plan")
      assert(df.limit(1).count() === 1L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("AQE skew join splits the oversized partition (plan-asserted)") {
    // the built-in alternative to manual salting (q105): AQE detects a
    // post-shuffle partition over the (lowered) threshold and splits
    // it into parallel sub-joins — 'skew=true' appears on the SMJ
    val savedKeys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      // 50k rows on one hot key vs 50 rows spread over the rest
      val left = spark.range(50050)
        .select(when(col("id") < 50000, 1L).otherwise(col("id")).as("k"),
          concat(lit("pad-"), col("id")).as("lv"))
      val right = (1 to 50).map(i => (i.toLong, s"r$i")).toSeq.toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // collect() executes THIS DataFrame's QueryExecution (count()
      // would plan a separate query and leave this one un-finalized)
      val n = joined.collect().length
      assert(n === 50000, s"unexpected join size $n") // all 50k hot-key rows, no others
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected an AQE skew-split join, got:\n${plan.take(3000)}")
    } finally savedKeys.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q149: dynamic partition pruning fires on the partitioned fact scan") {
    // same shape as the registered query: partitioned fact, runtime-
    // computed dim filter — the fact scan must carry a dynamicpruning
    // subquery in its PartitionFilters
    val out = graft.util.TempDirs.scratch("graft_dpp_spec")
    val ev = graft.sources.Events.ev(spark, sf)
    ev.select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val fact = spark.read.parquet(out)
    val dim = ev.select(to_date(col("ts")).as("day")).distinct()
      .filter(dayofweek(col("day")) === 2)
    val joined = fact.join(broadcast(dim), Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in fact scan, got:\n${plan.take(4000)}")
    // pruning must not change the answer, and must actually prune
    val got = joined.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val days = ev.select(to_date(col("ts"))).distinct().count()
    assert(got.nonEmpty && got.size < days,
      s"dim filter should keep some-but-not-all days, kept ${got.size} of $days")
    val expect = ev
      .select(to_date(col("ts")).as("day"), col("event_id"))
      .join(dim, Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("q150: runtime bloom filter reduces the fact side before the shuffle") {
    val savedKeys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val urgent = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter, got:\n${optimized.take(4000)}")
      // no false negatives: result identical to the plain join
      val expected = li.join(urgent.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally savedKeys.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("upsert: updates win per key, inserts land, unmatched base survives") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "v")
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 90.0))
      .toDF("k", "status", "v")
    val merged = Scale.upsert(base, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(merged === Map(
      1L -> ("a", 10.0), 2L -> ("b2", 25.0), 3L -> ("c", 30.0),
      9L -> ("new", 90.0)))
  }

  test("mergePartials(base, delta) equals the aggregate over all rows") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val qty = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 2))
    val base = Scale.partialAgg(li.filter(col("l_orderkey") % 3 =!= 0), "l_returnflag", qty)
    val delta = Scale.partialAgg(li.filter(col("l_orderkey") % 3 === 0), "l_returnflag", qty)
    val merged = Scale.mergePartials(base, delta, "l_returnflag")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val full = Scale.partialAgg(li, "l_returnflag", qty)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(merged.keySet === full.keySet)
    full.foreach { case (k, (n, s)) =>
      assert(merged(k)._1 === n)
      assert(merged(k)._2.compareTo(s) === 0) // decimal-exact, scale-insensitive
    }
  }

  // q242's gate is backed here: hand-built change stream — repeats
  // compress, versions number in (ts, tiebreak) order, same-ts changes
  // stay deterministic, the open interval ends null/is_current.
  test("scd2History: repeats compress, intervals chain, open version is current") {
    val ev = Seq(
      (1L, 10L, 101L, "a"), (1L, 20L, 102L, "a"),   // repeat: compresses
      (1L, 30L, 103L, "b"), (1L, 30L, 104L, "c"),   // same-ts: eid order
      (2L, 5L, 201L, "x")                            // single-version key
    ).toDF("k", "us", "eid", "attr")
    val got = Scale.scd2History(ev, "k", "attr", "us", "eid")
      .orderBy(col("k"), col("version")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, "a", 10L, 30L, 1L, 0L),
      (1L, "b", 30L, 30L, 2L, 0L),   // [30,30): zero-width, superseded same-ts
      (1L, "c", 30L, -1L, 3L, 1L),
      (2L, "x", 5L, -1L, 1L, 1L)))
  }
}
