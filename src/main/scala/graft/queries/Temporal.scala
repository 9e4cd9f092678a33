package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.operators.TemporalJoins

/** Temporal join queries — operators Spark lacks as built-ins, built
  * by composition (graft.operators.TemporalJoins) and oracled against
  * DuckDB's native ASOF / inequality joins.
  */
object Temporal {

  private def ev(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  // -------------------------------------------------------------------
  // q40: as-of join — for each purchase, the latest prior (or
  // simultaneous) click of the same user. Single shuffle + window scan
  // vs DuckDB's native ASOF JOIN.
  // -------------------------------------------------------------------
  def q40AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    TemporalJoins.asofJoinBackward(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("event_id", "ts"), rightTieBreak = Some("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_event_id").as("click_id"), col("asof_ts").as("click_ts"))
      .orderBy(asc("event_id"))
  }
  val q40Sql: String =
    """SELECT p.event_id, p.user_id, p.ts,
      |  c.event_id AS click_id, c.ts AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  // -------------------------------------------------------------------
  // q41: banded range join — (click, purchase) pairs of the same user
  // within 5 minutes. Bucketed equi-join + exact filter vs DuckDB's
  // inequality join.
  // -------------------------------------------------------------------
  def q41RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("ts_a"), col("event_id").as("id_a"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("ts_b"), col("event_id").as("id_b"))
    TemporalJoins.bandedRangeJoin(clicks, purchases, "user_id",
        "ts_a", "ts_b", bandMicros = 300L * 1000000L)
      .select(col("id_a"), col("id_b"))
      .orderBy(asc("id_a"), asc("id_b"))
  }
  val q41Sql: String =
    """SELECT a.event_id AS id_a, b.event_id AS id_b
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'click' AND b.event_type = 'purchase'
      | AND ABS(EPOCH_US(a.ts) - EPOCH_US(b.ts)) <= 300000000
      |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------
  // q135: FORWARD as-of join — for each click, the next (or
  // simultaneous) purchase of the same user, plus the time-to-convert.
  // Same single-shuffle union + one-window-scan shape as q40, carry
  // direction mirrored; oracled against DuckDB's native forward ASOF
  // (p.ts <= c.ts inequality).
  // -------------------------------------------------------------------
  def q135AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    TemporalJoins.asofJoinForward(clicks, purchases, "user_id", "ts", "ts",
        rightPayload = Seq("event_id", "ts"), rightTieBreak = Some("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_event_id").as("purchase_id"),
        (unix_micros(col("asof_ts")) - unix_micros(col("ts"))).as("wait_us"))
      .orderBy(asc("event_id"))
  }
  val q135Sql: String =
    """SELECT c.event_id, c.user_id, c.ts,
      |  p.event_id AS purchase_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS wait_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts <= p.ts
      |ORDER BY c.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_asof_join" -> (q40AsofJoin _),
    "q41_range_join" -> (q41RangeJoin _),
    "q135_asof_forward" -> (q135AsofForward _))

  val oracle: Map[String, String] = Map(
    "q40_asof_join" -> q40Sql,
    "q41_range_join" -> q41Sql,
    "q135_asof_forward" -> q135Sql)
}
