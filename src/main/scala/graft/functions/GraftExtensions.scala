package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers the native vector, text
  * hashing and sketch functions into the SQL function registry, so
  * `spark.sql("SELECT vec_dot(a, b) ...")`, `simhash64(text)`,
  * `minhash_sig(text, 3, 32)` and `space_saving_topk(key, 20, 4096)`
  * work next to the DataFrame-level [[VectorFunctions]] /
  * [[TextHashFunctions]] / [[SketchFunctions]].
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or config `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    e.injectFunction((
      new FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSet].getName, "shingle_hash_set"),
      (children: Seq[Expression]) =>
        ShingleHashSet(children(0), intLit(children(1), "k"))))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children(0),
        intLit(children(1), "k"), intLit(children(2), "numHashes"))))
    e.injectFunction((
      new FunctionIdentifier("space_saving_topk"),
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "space_saving_topk"),
      (children: Seq[Expression]) => SpaceSavingTopK(children(0),
        intLit(children(1), "k"), intLit(children(2), "capacity"))
        .toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => BloomAgg(children(0),
        intLit(children(1), "numBits"), intLit(children(2), "numHashes"))
        .toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("bloom_union_agg"),
      new ExpressionInfo(classOf[BloomUnionAgg].getName, "bloom_union_agg"),
      (children: Seq[Expression]) => BloomUnionAgg(children(0),
        intLit(children(1), "numBits")).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1),
        intLit(children(2), "numHashes"))))
    e.injectFunction((
      new FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[CmsAgg].getName, "cms_agg"),
      (children: Seq[Expression]) => CmsAgg(children(0),
        intLit(children(1), "depth"), intLit(children(2), "width"))
        .toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children(0), children(1),
        intLit(children(2), "depth"))))
    e.injectFunction((
      new FunctionIdentifier("kmv_agg"),
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_agg"),
      (children: Seq[Expression]) => KmvAgg(children(0),
        intLit(children(1), "k")).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("vec_fixed_sum"),
      new ExpressionInfo(classOf[VecFixedSum].getName, "vec_fixed_sum"),
      (children: Seq[Expression]) => VecFixedSum(children(0),
        intLit(children(1), "dim"), 1e12).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("vec_outer_fixed_sum"),
      new ExpressionInfo(classOf[VecOuterFixedSum].getName, "vec_outer_fixed_sum"),
      (children: Seq[Expression]) => VecOuterFixedSum(children(0),
        intLit(children(1), "dim"), 1e9).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("tdigest_quantiles"),
      new ExpressionInfo(classOf[TDigestQuantiles].getName, "tdigest_quantiles"),
      (children: Seq[Expression]) => TDigestQuantiles(children(0),
        intLit(children(1), "compression"),
        children.drop(2).map {
          // SQL `0.5` parses as a Decimal literal, `0.5D` as Double
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v match {
              case d: org.apache.spark.sql.types.Decimal => d.toDouble
              case n: java.lang.Number => n.doubleValue()
              case other => throw new IllegalArgumentException(
                s"quantile must be a numeric literal, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"quantile must be a numeric literal, got $other")
        }).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("tdigest_agg"),
      new ExpressionInfo(classOf[TDigestAgg].getName, "tdigest_agg"),
      (children: Seq[Expression]) => TDigestAgg(children(0),
        intLit(children(1), "compression")).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("tdigest_merge_quantiles"),
      new ExpressionInfo(classOf[TDigestMergeQuantiles].getName, "tdigest_merge_quantiles"),
      (children: Seq[Expression]) => TDigestMergeQuantiles(children(0),
        intLit(children(1), "compression"),
        children.drop(2).map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v match {
              case d: org.apache.spark.sql.types.Decimal => d.toDouble
              case n: java.lang.Number => n.doubleValue()
              case other => throw new IllegalArgumentException(
                s"quantile must be a numeric literal, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"quantile must be a numeric literal, got $other")
        }).toAggregateExpression()))
    // post-pushdown lint: similarity measures must not be the sole join
    // condition (see SimilarityJoinGuard)
    e.injectOptimizerRule(session => SimilarityJoinGuard(session))
  }
}
