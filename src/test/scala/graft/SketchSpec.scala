package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchFunctions.space_saving_topk

/** Specs for the native Misra-Gries heavy-hitters aggregate: exact in
  * the under-capacity regime, bounded-undercount in the sketch
  * regime, stable under repartitioning (mergeable summaries).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: distinct keys under capacity reproduce groupBy counts") {
    val df = (0L until 20000L).map(i => s"k${i % 50}").toDF("k")
    val out = df.agg(space_saving_topk(col("k"), 10, 256).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.key"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 10)
    assert(out.forall(_._3 === 0L)) // no eviction -> no error
    val exact = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (k, cnt, _) => assert(cnt === exact(k)) }
  }

  test("sketch regime: heavy keys survive capacity pressure with bounded undercount") {
    // 3 planted heavy keys (5000 each) in a sea of 20000 singletons:
    // distinct = 20003 >> capacity = 64
    val heavy = (0 until 15000).map(i => s"hot${i % 3}")
    val noise = (0 until 20000).map(i => s"rare$i")
    val df = (heavy ++ noise).toDF("k").repartition(8)
    val n = heavy.size + noise.size
    val cap = 64
    val rows = df.agg(space_saving_topk(col("k"), 3, cap).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.key"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === Set("hot0", "hot1", "hot2"))
    rows.foreach { case (_, cnt, err) =>
      assert(cnt <= 5000L)               // MG never overcounts
      assert(cnt + err >= 5000L)         // undercount bounded by err
      assert(err <= (n / cap).toLong * 8L) // per-partition bound, summed
    }
  }

  test("result is identical across input partitionings in the exact regime") {
    val base = (0L until 5000L).map(i => s"k${i % 100}")
    def run(parts: Int) =
      base.toDF("k").repartition(parts)
        .agg(space_saving_topk(col("k"), 100, 512).as("t"))
        .select(explode(col("t")).as("e"))
        .select(col("e.key"), col("e.cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(1) === run(13))
  }

  import graft.functions.SketchFunctions.{bloom_agg, bloom_might_contain}

  test("bloom: no false negatives, FP rate near theory, mergeable across partitions") {
    val numBits = 1 << 16 // 64 Kbit over 4000 keys ≈ 16 bits/key
    val k = 7
    val members = (0 until 4000).map(i => s"member$i")
    val bloomRow = members.toDF("s").repartition(11) // force partial merges
      .agg(bloom_agg(xxhash64(col("s")), numBits, k).as("b"))
    // every member must probe true — Bloom's one hard guarantee
    val misses = members.toDF("s").join(broadcast(bloomRow))
      .filter(!bloom_might_contain(col("b"), xxhash64(col("s")), k))
      .count()
    assert(misses === 0L)
    // non-members: FP rate should be near (1 - e^(-kn/m))^k ≈ 0.09% at
    // these params; assert an order-of-magnitude bound, not the exact value
    val fps = (0 until 20000).map(i => s"outsider$i").toDF("s")
      .join(broadcast(bloomRow))
      .filter(bloom_might_contain(col("b"), xxhash64(col("s")), k))
      .count()
    assert(fps < 200L, s"false-positive count $fps way above theory")
  }

  import graft.functions.SketchFunctions.{cms_agg, cms_estimate}

  test("cms: never underestimates, exact when wide, mergeable across partitions") {
    // skewed corpus: key k_i appears (i+1)*3 times, 200 distinct keys
    val rows = (0 until 200).flatMap(i => Seq.fill((i + 1) * 3)(s"k$i"))
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // wide sketch (4×4096 over 200 keys): collisions across all 4 rows
    // are overwhelmingly unlikely — estimates should be exact; the
    // repartition forces partial-merge on every path
    val wide = rows.toDF("k").repartition(9)
      .agg(cms_agg(xxhash64(col("k")), 4, 4096).as("s"))
    val estWide = exact.keys.toSeq.toDF("k").join(broadcast(wide))
      .select(col("k"), cms_estimate(col("s"), xxhash64(col("k")), 4).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(estWide(k) === n, s"wide sketch off for $k") }
    // narrow sketch (4×16): collisions guaranteed — the one-sided error
    // contract must hold on every key (est >= true)
    val narrow = rows.toDF("k")
      .agg(cms_agg(xxhash64(col("k")), 4, 16).as("s"))
    val estNarrow = exact.keys.toSeq.toDF("k").join(broadcast(narrow))
      .select(col("k"), cms_estimate(col("s"), xxhash64(col("k")), 4).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(estNarrow(k) >= n, s"CMS underestimated $k: ${estNarrow(k)} < $n") }
    // partition-independence: merge order must not change the sketch
    val once = rows.toDF("k").repartition(1)
      .agg(cms_agg(xxhash64(col("k")), 4, 64).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val many = rows.toDF("k").repartition(17)
      .agg(cms_agg(xxhash64(col("k")), 4, 64).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(once, many))
  }

  import graft.functions.SketchFunctions.kmv_agg

  test("kmv: exact regime returns the full sorted distinct hash set") {
    val df = (0L until 5000L).map(i => i % 100).toDF("v")
    val got = df.agg(kmv_agg(xxhash64(col("v")), 256).as("s"))
      .collect()(0).getSeq[Long](0)
    val want = df.select(xxhash64(col("v")).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want) // 100 distinct < k=256: sketch IS the set, sorted
  }

  test("kmv: saturated regime estimates distinct count within KMV error, " +
    "identical across partitionings") {
    // 50k distinct values, k=512 -> stderr ~ 1/sqrt(k) ~ 4.4%; assert 15%
    val n = 50000L
    val df = (0L until n).toDF("v")
    def sketch(parts: Int): Seq[Long] =
      df.repartition(parts).agg(kmv_agg(xxhash64(col("v")), 512).as("s"))
        .collect()(0).getSeq[Long](0)
    val s1 = sketch(1)
    assert(s1 === sketch(19)) // merge-with-cap is partition-invariant
    assert(s1.length === 512 && s1 === s1.sorted)
    // KMV estimator over the 64-bit signed hash domain shifted to unsigned
    val kth = s1.last.toDouble - Long.MinValue.toDouble
    val est = (512 - 1) * (math.pow(2, 64) / kth)
    assert(math.abs(est - n) / n < 0.15, s"est $est vs true $n")
  }

  test("kmv: streamingDistinct's saturated-window expression recovers " +
    "the true count past k (md5-60-bit domain)") {
    // the EXACT expression shape streamingDistinctBatchDriven emits:
    // size(sk) when under k, else (k-1) * 2^60 / kth-smallest — here
    // exercised batch-side at k=256 over 15k distinct users, where
    // the old size(sk) answer would have silently capped at 256
    val k = 256
    val n = 15000L
    val df = (0L until n).toDF("user_id")
    val h = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val got = df.agg(kmv_agg(h, k).as("sk"))
      .select(
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(1152921504606846976.0)
            / element_at(col("sk"), k).cast("double")).cast("long"))
          .as("n_users"))
      .collect()(0).getLong(0)
    assert(got > k, s"estimator not applied: got $got (the saturation cap)")
    assert(math.abs(got - n).toDouble / n < 0.2, s"est $got vs true $n")
  }

  test("tdigest: fromBytes rejects an over-capacity or truncated blob " +
    "with the compression mismatch named") {
    import graft.functions.TDigestBuf
    val big = new TDigestBuf(500)
    (0 until 1500).foreach(i => big.add(i.toDouble, 1.0))
    val bytes = big.toBytes
    // deserializing a compression-500 sketch into a compression-20
    // merger must fail loudly, not ArrayIndexOutOfBounds
    val e = intercept[IllegalArgumentException](TDigestBuf.fromBytes(20, bytes))
    assert(e.getMessage.contains("compression"))
    val t = intercept[IllegalArgumentException](
      TDigestBuf.fromBytes(500, bytes.take(40)))
    assert(t.getMessage.contains("truncated"))
    // round-trip at the matching compression still works
    val back = TDigestBuf.fromBytes(500, bytes)
    assert(back.total === big.total)
  }

  test("kmv: union of sub-sketches equals the sketch of the union") {
    val aDf = (0L until 3000L).map(i => ("a", i)).toDF("g", "v")
    val bDf = (2000L until 6000L).map(i => ("b", i)).toDF("g", "v")
    val whole = aDf.union(bDf).agg(kmv_agg(xxhash64(col("v")), 128).as("s"))
      .collect()(0).getSeq[Long](0)
    // per-group sketches re-aggregated (exercises merge() across rows)
    val merged = aDf.union(bDf).groupBy("g")
      .agg(kmv_agg(xxhash64(col("v")), 128).as("s"))
      .select(explode(col("s")).as("h"))
      .agg(kmv_agg(col("h"), 128).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(merged === whole) // bottom-k of a union = bottom-k of bottom-ks
  }

  import graft.functions.SketchFunctions.tdigest_quantiles

  /** Exact rank of `est` among `xs`, as a (below, belowEq) bracket. */
  private def rankBracket(xs: Array[Double], est: Double): (Long, Long) =
    (xs.count(_ < est).toLong, xs.count(_ <= est).toLong)

  test("tdigest: near-exact regime on small N, bracket within 1% + 3 rows") {
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)
    val xs = (0 until 2000).map(i => ((i * 2654435761L) % 100003L).toDouble)
    val rows = xs.toDF("x")
      .agg(tdigest_quantiles(col("x"), 100, qs).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.q"), col("e.est"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.length === qs.length)
    val sorted = xs.toArray.sorted
    val tol = math.max(3.0, 0.01 * xs.length)
    rows.foreach { case (q, est) =>
      val (below, belowEq) = rankBracket(sorted, est)
      val target = q * xs.length
      assert(below <= target + tol, s"q=$q est=$est below=$below")
      assert(belowEq >= target - tol, s"q=$q est=$est belowEq=$belowEq")
    }
  }

  test("tdigest: sketch regime — 200k sorted skewed values, rank error <= 1%") {
    // adversarial: pre-sorted heavy-tailed input (worst case for naive
    // streaming summaries); δ=100 k1-scale bound predicts ≲0.5% rank err
    val n = 200000
    val xs = (0 until n).map(i => math.exp(6.0 * i / n)).toArray
    val rows = xs.toSeq.toDF("x").repartition(16)
      .agg(tdigest_quantiles(col("x"), 100, Seq(0.01, 0.1, 0.5, 0.9, 0.99)).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.q"), col("e.est"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val tol = 0.01 * n
    rows.foreach { case (q, est) =>
      val (below, belowEq) = rankBracket(xs, est) // xs already sorted
      assert(below <= q * n + tol, s"q=$q below=$below")
      assert(belowEq >= q * n - tol, s"q=$q belowEq=$belowEq")
    }
  }

  test("tdigest: merged partial digests keep the bracket guarantee at any partitioning") {
    val xs = (0 until 50000).map(i => ((i * 40503L) % 65536L).toDouble)
    val sorted = xs.toArray.sorted
    for (parts <- Seq(1, 32)) {
      val rows = xs.toDF("x").repartition(parts)
        .agg(tdigest_quantiles(col("x"), 100, Seq(0.25, 0.5, 0.75)).as("t"))
        .select(explode(col("t")).as("e"))
        .select(col("e.q"), col("e.est"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      rows.foreach { case (q, est) =>
        val (below, belowEq) = rankBracket(sorted, est)
        assert(below <= q * xs.length + 0.01 * xs.length, s"parts=$parts q=$q")
        assert(belowEq >= q * xs.length - 0.01 * xs.length, s"parts=$parts q=$q")
      }
    }
  }

  test("bloom sketch TABLES: union of per-snapshot filters is byte-identical to one filter over all keys") {
    import graft.functions.SketchFunctions.{bloom_agg, bloom_union_agg, bloom_might_contain}
    val keys = (0L until 5000L).map(i => (i % 4, i * 2654435761L)).toDF("snap", "h")
    val unioned = keys.groupBy(col("snap"))
      .agg(bloom_agg(col("h"), 1 << 16, 7).as("b"))
      .agg(bloom_union_agg(col("b"), 1 << 16).as("u"))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = keys.agg(bloom_agg(col("h"), 1 << 16, 7).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(unioned, direct),
      "OR-merge of snapshot filters must equal the filter over the union of keys")
    // and it still has no false negatives, probed as a literal
    val probed = keys.filter(
      bloom_might_contain(lit(unioned), col("h"), 7)).count()
    assert(probed === 5000L)
    // a mismatched sketch size fails loudly, not silently
    intercept[Exception] {
      keys.groupBy(col("snap"))
        .agg(bloom_agg(col("h"), 1 << 16, 7).as("b"))
        .agg(bloom_union_agg(col("b"), 1 << 15).as("u"))
        .collect()
    }
  }

  test("tdigest sketch TABLES: union of per-snapshot digests brackets the combined distribution") {
    import graft.functions.SketchFunctions.{tdigest_agg, tdigest_merge_quantiles}
    val xs = (0 until 40000).map(i => ((i * 2654435761L) % 99991L).toDouble)
    val sorted = xs.toArray.sorted
    // 4 snapshots with DIFFERENT distributions per snapshot slice —
    // the union must track the combined ranks, not any single slice
    val df = xs.zipWithIndex.map { case (x, i) => (i % 4, x) }.toDF("snap", "x")
    val table = df.groupBy(col("snap")).agg(tdigest_agg(col("x"), 100).as("sk"))
    assert(table.count() === 4) // one ~3 KB binary per snapshot
    val rows = table
      .agg(tdigest_merge_quantiles(col("sk"), 100, Seq(0.1, 0.5, 0.9)).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.q"), col("e.est"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    rows.foreach { case (q, est) =>
      val (below, belowEq) = rankBracket(sorted, est)
      val tol = math.max(3.0, 0.01 * xs.length)
      assert(below <= q * xs.length + tol, s"q=$q below=$below")
      assert(belowEq >= q * xs.length - tol, s"q=$q belowEq=$belowEq")
    }
    // sketch-space round trip: the table path and the direct aggregate
    // see the same centroid stream per snapshot, so the union's total
    // weight is exact
    val direct = df.agg(tdigest_quantiles(col("x"), 100, Seq(0.5)).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.est"))
      .collect()(0).getDouble(0)
    val merged = rows.toMap.apply(0.5)
    // both are rank-valid estimates of the same median; they need not
    // be bit-identical (merge order differs) but must agree to ~1% rank
    val (b1, _) = rankBracket(sorted, direct)
    val (b2, _) = rankBracket(sorted, merged)
    assert(math.abs(b1 - b2) <= 0.02 * xs.length)
  }

  test("tdigest: extreme quantiles clamp to observed min/max") {
    val xs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val rows = xs.toDF("x")
      .agg(tdigest_quantiles(col("x"), 100, Seq(0.0, 1.0)).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.q"), col("e.est"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(rows(0.0) >= 1.0 && rows(0.0) <= 9.0)
    assert(rows(1.0) <= 9.0 && rows(1.0) >= 1.0)
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val ev = docs.filter(col("doc_id") % 97 === 0)
    val exact = graft.operators.Curation
      .decontaminate(train, ev, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    val bloomed = graft.operators.Curation
      .decontaminateBloom(train, ev, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed === exact)
  }
}
