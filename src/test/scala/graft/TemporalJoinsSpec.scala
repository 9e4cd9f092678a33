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
