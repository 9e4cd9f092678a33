package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * banded range join. Both are built by *composing* existing operators
  * (SURVEY.md preference (a)) into shapes that scale:
  *
  *  - as-of: the union-and-carry-forward formulation — one shuffle on
  *    (key), one window pass; no inequality join, no per-row probe.
  *    At 100 TB this is a single sort-merge per key partition, vs the
  *    O(n·m) broadcast-nested-loop Spark would pick for `l.ts >= r.ts`.
  *  - range join: equi-join on coarse time buckets (each left row
  *    probes its own and the adjacent bucket) + exact band filter —
  *    turns an inequality join into a hash join with bounded fanout.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the latest right row with
    * the same key and `rightTs <= leftTs` (backward search, the
    * classic trades/quotes semantics).
    *
    * Implementation: union both sides tagged, sort each key partition
    * by (ts, side) with right rows first on ties, carry the last seen
    * right payload forward with `last(_, ignoreNulls=true)`, then keep
    * left rows. Right payload columns come back null when no prior
    * right row exists (left-outer as-of).
    *
    * `rightPayload` columns must not collide with left column names.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String],
                       rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // side marker: right=0 sorts before left=1 at equal timestamps, so
    // a right row AT the left row's timestamp is eligible (ties match).
    // rightTieBreak (a unique right column, e.g. event_id) makes the
    // pick among right rows sharing (key, ts) deterministic — highest
    // wins — and guarantees all payload columns come from the SAME
    // right row; without it, per-column `last` under a tied sort is
    // partition-order-dependent.
    val tb = rightTieBreak.map(c => col(c).as("__tb")).getOrElse(lit(null).as("__tb"))
    val taggedRight = right.select(
      (Seq(col(key).as(key), col(rightTs).as("__ts"), lit(0).as("__side"), tb) ++
        rightPayload.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key).as(key), col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).as("__tb")) ++
        rightPayload.map(c => lit(null).as(s"__r_$c")) ++
        leftCols.filterNot(_ == key).map(col)): _*)
    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col(key))
      .orderBy(asc("__ts"), asc("__side"), asc_nulls_last("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((Seq(col(key), col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => c == key || c == leftTs).map(col) ++
        rightPayload.map(c => col(s"__asof_$c").as(s"asof_$c"))): _*)
  }

  /** Backward as-of join with a TOLERANCE bound (pandas
    * `merge_asof(tolerance=...)` / kdb `wj` semantics): the nearest
    * right row at-or-before each left row matches only if it is within
    * `toleranceMicros`; staler matches become NULL payloads (the left
    * row is kept — tolerance bounds staleness, it does not filter).
    * Equivalence note making this a post-filter, not a different scan:
    * the nearest-within-tolerance IS the overall nearest whenever one
    * exists, so the carry-forward window needs no changes — one
    * predicate over the carried match timestamp nulls the stale rows.
    * Same single-shuffle union + one-window-scan shape as
    * [[asofJoinBackward]].
    */
  def asofJoinBackwardTolerance(left: DataFrame, right: DataFrame, key: String,
                                leftTs: String, rightTs: String,
                                rightPayload: Seq[String],
                                toleranceMicros: Long,
                                rightTieBreak: Option[String] = None): DataFrame = {
    val payload = (rightPayload :+ rightTs).distinct
    val j = asofJoinBackward(left, right, key, leftTs, rightTs, payload,
      rightTieBreak)
    // micros for TIMESTAMP columns; raw integer time axes pass through
    def us(c: org.apache.spark.sql.Column,
           dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val within = col(s"asof_$rightTs").isNotNull &&
      us(col(leftTs), left.schema(leftTs).dataType) -
        us(col(s"asof_$rightTs"), right.schema(rightTs).dataType) <=
        toleranceMicros
    val masked = payload.foldLeft(j) { (df, c) =>
      df.withColumn(s"asof_$c", when(within, col(s"asof_$c")))
    }
    // drop the helper ts column unless the caller asked for it
    if (rightPayload.contains(rightTs)) masked
    else masked.drop(s"asof_$rightTs")
  }

  /** Forward as-of join: for every left row, attach the EARLIEST right
    * row with `rightTs >= leftTs` (same key) — the time-to-next-event
    * direction ([[asofJoinBackward]] mirrored). Same single-shuffle
    * union + one-window-scan shape: no inequality join, no per-row
    * probe; the carry runs over `[currentRow, unboundedFollowing)`
    * with `first(ignoreNulls)`. Left rows sort BEFORE right rows at
    * equal timestamps (ties match, mirroring backward's tie rule);
    * `rightTieBreak` asc makes the pick among right rows sharing
    * (key, ts) deterministic — lowest wins — and pins all payload
    * columns to the same right row.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String],
                      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tb = rightTieBreak.map(c => col(c).as("__tb")).getOrElse(lit(null).as("__tb"))
    val taggedRight = right.select(
      (Seq(col(key).as(key), col(rightTs).as("__ts"), lit(1).as("__side"), tb) ++
        rightPayload.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key).as(key), col(leftTs).as("__ts"), lit(0).as("__side"),
        lit(null).as("__tb")) ++
        rightPayload.map(c => lit(null).as(s"__r_$c")) ++
        leftCols.filterNot(_ == key).map(col)): _*)
    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col(key))
      .orderBy(asc("__ts"), asc("__side"), asc_nulls_last("__tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", first(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 0)
      .select((Seq(col(key), col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => c == key || c == leftTs).map(col) ++
        rightPayload.map(c => col(s"__asof_$c").as(s"asof_$c"))): _*)
  }

  /** Banded range join: pairs (l, r) sharing `key` with
    * `|leftTs - rightTs| <= band` (timestamps as epoch micros).
    * Each side is bucketed to `band`-wide epochs; left probes its own
    * and both adjacent buckets (explode ×3), making the join an
    * equi-join on (key, bucket) with an exact band filter after.
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      bandMicros: Long): DataFrame = {
    val lb = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", col("__off") + expr(s"__lus div $bandMicros"))
      .drop("__off")
    val rb = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bucket", expr(s"__rus div $bandMicros"))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(abs(col("__lus") - col("__rus")) <= lit(bandMicros))
      .drop("__bucket", "__lus", "__rus")
  }
}
