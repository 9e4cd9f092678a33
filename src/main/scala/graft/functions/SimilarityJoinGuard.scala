package graft.functions

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, Levenshtein}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Injected optimizer rule encoding PERF.md lesson 2 as an engine
  * guard: a SIMILARITY predicate (vector dot / cosine, edit distance)
  * that ends up in a join condition WITHOUT any equi-conjunct forces a
  * nested-loop join evaluating the expensive measure per candidate
  * pair — the O(n²)-interpreted shape that cost this engine a 60×
  * swing before the inverted-index/bucket formulations. The correct
  * shapes (equi-join on a bucket/posting key, similarity as a filter)
  * keep at least one equality conjunct after predicate pushdown, so
  * they pass untouched.
  *
  * Inspect-only (never rewrites). `spark.graft.similarityJoinGuard`:
  *  - `warn` (default): log a warning naming the offending expression
  *  - `strict`: fail the query with [[graft.api.GraftException]]
  *  - `off`: disabled
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`, so it
  * runs post-pushdown and sees the join condition the executor would.
  */
case class SimilarityJoinGuard(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def similarity(e: Expression): Option[String] = {
    var hit: Option[String] = None
    e.foreach {
      case _: VecDot => hit = Some("vec_dot")
      case _: VecMatDots => hit = Some("vec_mat_dots")
      case _: Levenshtein => hit = Some("levenshtein")
      case _ =>
    }
    hit
  }

  private def hasEquiConjunct(e: Expression): Boolean = {
    var found = false
    e.foreach {
      case _: EqualTo | _: EqualNullSafe => found = true
      case _ =>
    }
    found
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = spark.conf.get("spark.graft.similarityJoinGuard", "warn")
    if (mode != "off") {
      plan.foreach {
        case j: Join =>
          j.condition.foreach { cond =>
            similarity(cond).foreach { name =>
              if (!hasEquiConjunct(cond)) {
                val msg = s"similarity predicate '$name' is a join condition with no " +
                  "equi-conjunct: this plans as a nested-loop join evaluating the " +
                  "measure per candidate pair. Block on an equi key (bucket/posting/" +
                  "prefix) and apply the similarity as a post-join filter instead. " +
                  "(set spark.graft.similarityJoinGuard=off to silence)"
                if (mode == "strict") throw new graft.api.GraftException(msg)
                else logWarning(msg)
              }
            }
          }
        case _ =>
      }
    }
    plan
  }
}
