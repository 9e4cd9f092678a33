package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BindReferences,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE as-of join — the SURVEY preference-(c) rung of the custom
  * operator ladder: a whole-operator LogicalPlan + SparkStrategy +
  * SparkPlan, for the one temporal operator the composed
  * [[graft.operators.TemporalJoins.asofJoinBackward]] can only
  * approximate structurally.
  *
  * Why a custom exec over the composition (which is itself already
  * the right *declarative* shape — union + window, one shuffle), with
  * the claims MEASURED, not assumed (TemporalJoinsSpec + AsofProbe):
  *  - single-side layout reuse: if only the big side is already
  *    key-partitioned (fact table probed against a small update
  *    stream), the union's mixed-layout children collapse to unknown
  *    partitioning and the window re-shuffles the WHOLE union — the
  *    exec's per-child ClusteredDistribution re-shuffles only the
  *    un-partitioned side (spec-pinned). With BOTH sides pre-laid-out
  *    Spark propagates matching partitionings through Union, so the
  *    formulations tie there (measured — an earlier claim that union
  *    always discards layout was WRONG);
  *  - each side sorts at its own row width vs the union schema (both
  *    sides padded to left+right width before the combined sort);
  *  - the merge holds O(1) state (one payload row) vs a window frame
  *    buffer per key group.
  *  Honest cost: at sf0.1 the interpreted merge measures ~0.4 s vs
  *  ~0.3 s for the fully codegen'd window composition (AsofProbe) —
  *  the exec wins on layout/width structure, not on per-row compute;
  *  q40 (composed) and q168 (native) both stay registered, oracled
  *  against the same DuckDB ASOF truth.
  *
  * Semantics (= composed version = DuckDB `ASOF LEFT JOIN ... ON
  * l.key = r.key AND l.ts >= r.ts`): for every left row, the right row
  * of the same key with the greatest ts ≤ left ts; ties on ts resolved
  * by greatest `tieBreak`. Left rows with no prior right row emit null
  * payload (left-outer). Nulls in key/ts follow the natural ordering
  * (nulls first — a null ts right row is "before" everything).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    rightTie: Option[Expression], forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Build the logical node from analyzed child plans, resolving the
    * named columns; payload columns come back as `asof_<name>`
    * (nullable) with fresh exprIds. */
  /** `forward = false`: latest right ts ≤ left ts (trades/quotes,
    * tie → greatest tieBreak). `forward = true`: earliest right ts ≥
    * left ts (time-to-next-event, tie → least tieBreak — both mirror
    * the composed operators' conventions). */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTsCol: String, rightTsCol: String,
            payloadCols: Seq[String], tieBreak: Option[String],
            forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = left.sparkSession
    // idempotent strategy injection — works on ANY session, no
    // spark.sql.extensions config needed (public experimental API)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = ColumnBridge.analyzedPlan(left)
    // left and right often derive from the SAME scan (self as-of), so
    // their analyzed plans share exprIds; analysis-time deduplication
    // re-ids the right child but cannot rewrite a custom node's
    // expressions. Fresh aliases force disjoint exprIds up front.
    val rAliased = right.select(right.columns.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
    val rPlan = ColumnBridge.analyzedPlan(rAliased)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val payload = payloadCols.map(attr(rPlan, _))
    val payloadOut = payload.map(a =>
      AttributeReference("asof_" + a.name, a.dataType, nullable = true)())
    ColumnBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTsCol), attr(rPlan, rightTsCol),
      payload, payloadOut, tieBreak.map(attr(rPlan, _)), forward))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTs, j.rightTs,
        j.payload, j.payloadOut, j.rightTie, j.forward,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Streaming sort-merge as-of join: both children hash-clustered by
  * key and sorted by (key, ts[, tie]); one forward pass over each
  * partition pair with a single held payload row — no window buffer,
  * no unioned schema, and any pre-existing key layout on either side
  * is reused by EnsureRequirements.
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    rightTie: Option[Expression], forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTie.map(SortOrder(_, Ascending)).toSeq)

  /** The merge consumes left in its sorted order and emits 1:1. */
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payloadExprs: Seq[Expression] = payload
    val outSchema = output
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // all projections/orderings built per partition (not serialized)
      val lKeyProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(lKeyExpr, lOutput)))
      val lTsProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(lTsExpr, lOutput)))
      val rKeyProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(rKeyExpr, rOutput)))
      val rTsProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(rTsExpr, rOutput)))
      val payloadProj = UnsafeProjection.create(
        payloadExprs.map(BindReferences.bindReference(_, rOutput)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val outProj = UnsafeProjection.create(outSchema, outSchema)
      val nullPayload = new GenericInternalRow(payloadExprs.length)
      val joined = new JoinedRow

      // right-side lookahead: key/ts copied (row buffers are reused)
      var rHas = rIter.hasNext
      var rRow: InternalRow = if (rHas) rIter.next() else null
      var rKeyRow: InternalRow = if (rHas) rKeyProj(rRow).copy() else null
      var rTsRow: InternalRow = if (rHas) rTsProj(rRow).copy() else null
      def advanceRight(): Unit = {
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKeyRow = rKeyProj(rRow).copy()
          rTsRow = rTsProj(rRow).copy()
        } else { rHas = false; rRow = null }
      }
      // held match: payload + its key (validity checked per left row)
      var matchPayload: InternalRow = null
      var matchKey: InternalRow = null

      if (forward) {
        // FORWARD: earliest right ts ≥ left ts. Left ts ascending ⇒
        // the right pointer only moves forward; the matching row is
        // the CURRENT (un-consumed) lookahead, so no held state at all
        // (ties resolve to least tieBreak — first in sort order).
        lIter.map { lRow =>
          val lk = lKeyProj(lRow)
          val lt = lTsProj(lRow)
          var advancing = true
          while (rHas && advancing) {
            val c = keyOrd.compare(rKeyRow, lk)
            if (c < 0 || (c == 0 && tsOrd.compare(rTsRow, lt) < 0)) advanceRight()
            else advancing = false
          }
          val m =
            if (rHas && keyOrd.compare(rKeyRow, lk) == 0) payloadProj(rRow)
            else nullPayload
          outProj(joined(lRow, m))
        }
      } else lIter.map { lRow =>
        // no copies: lKeyProj/lTsProj buffers stay valid until the next
        // left row, and every use of lk/lt happens within this row
        val lk = lKeyProj(lRow)
        val lt = lTsProj(lRow)
        var advancing = true
        while (rHas && advancing) {
          val c = keyOrd.compare(rKeyRow, lk)
          if (c < 0) {
            advanceRight() // stale key; match validity re-checked below
          } else if (c == 0 && tsOrd.compare(rTsRow, lt) <= 0) {
            matchPayload = payloadProj(rRow).copy()
            matchKey = rKeyRow
            advanceRight()
          } else {
            advancing = false
          }
        }
        val m =
          if (matchPayload != null && matchKey != null &&
            keyOrd.compare(matchKey, lk) == 0) matchPayload
          else nullPayload
        outProj(joined(lRow, m))
      }
    }
  }
}
