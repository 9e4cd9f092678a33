package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Automated SCALE-SHAPE audit over every registered query's physical
  * plan — the anti-pattern sweep the round verdicts run by hand,
  * mechanized: a query whose plan contains an unexplained
  * nested-loop join would quietly stop scaling long before it stops
  * passing its oracle.
  *
  * Rules (structural, not name-based):
  *  - CartesianProduct — never acceptable (a broadcast frame plans as
  *    BroadcastNestedLoopJoin, not Cartesian).
  *  - BroadcastNestedLoopJoin — acceptable iff the BROADCAST side is
  *    provably bounded: its subtree contains a global (no-grouping)
  *    aggregate (≤1 row — the crossJoin(broadcast(agg)) fence/total
  *    pattern), a GlobalLimit ≤ 20k (top-N vocab/fence frames), or a
  *    LocalTableScan (literal frames). Everything else is flagged.
  *  - A small per-query allowlist covers the ANN exact-certification
  *    terms, where the broadcast side is the deterministic QUERY
  *    SUBSET of the corpus (vec_id % 50 = 0 — corpus/50 rows, the
  *    measurement design of the recall gates, not a scale path).
  *
  * Exits nonzero on any unallowlisted hit — wired into gate.sh.
  */
object PlanLint {
  private val allow: Map[String, String] = Map(
    "q34_cosine_topk" -> "brute-force baseline IS the operator (query-subset broadcast)",
    "q119_quantized_ann" -> "quantized brute force: query-subset broadcast is the operator",
    "q163_pq_ann" -> "flat-PQ ADC is definitionally a full compressed scan; q179 is the pruned path",
    "q35_ann_lsh" -> "recall-certification term: exact top-k of the query subset",
    "q52_ann_ivf" -> "recall-certification term; the IVF side joins on cell id",
    "q179_ivfpq_ann" -> "recall-certification term; the IVF-PQ side joins on cell id",
    "q191_ivfpq_residual" -> "recall-certification term; the IVF-PQ side joins on cell id",
    "q36_cosine_neardup" -> "sampled exact-truth check next to the LSH-bucketed operator",
    "q195_embedding_outliers" -> "512-byte centroid literal vs corpus — map-only in effect",
    // domain-bounded grouped aggregates (the linter cannot prove key
    // cardinality; these are metadata-sized dimensions by design)
    "q125_kmv_overlap" -> "build side = per-SOURCE sketch frame (#sources rows × ≤2 KB); the pairwise stage runs on sketches, never data",
    "q92_resample" -> "build side = distinct event_type (5-value domain) crossed with the hour grid — the resample frame itself",
    "q204_naive_bayes" -> "build side = the class list (per-source aggregate, 20-value domain) — the score-every-class fan-out IS the NB classifier")

  private def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case other => other.children
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p +: unwrap(p).flatMap(nodes)

  /** The subtree can only ever produce a bounded (model-sized) number
    * of rows: global aggregate (≤1), explicit small limit, or a
    * literal local relation. */
  private def bounded(p: SparkPlan): Boolean =
    nodes(p).exists {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      case h: ObjectHashAggregateExec => h.groupingExpressions.isEmpty
      case h: SortAggregateExec => h.groupingExpressions.isEmpty
      case g: GlobalLimitExec => g.limit <= 20000
      case t: TakeOrderedAndProjectExec => t.limit <= 20000
      case _: LocalTableScanExec => true
      case _ => false
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val filter = args.drop(1).headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    var checked = 0
    var allowed = 0
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val all = nodes(df.queryExecution.executedPlan)
        checked += 1
        val offenders = all.flatMap {
          case c: CartesianProductExec => Some("CartesianProduct" -> c)
          case j: BroadcastNestedLoopJoinExec =>
            // the broadcast (build) side must be bounded
            val build = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case _ => j.right
            }
            if (bounded(build)) None
            else Some("BroadcastNestedLoopJoin[unbounded build side]" -> j)
          case _ => None
        }
        for ((kind, node) <- offenders) {
          if (allow.contains(name)) allowed += 1
          else {
            bad += 1
            println(s"[planlint] FLAG $name: $kind\n    " +
              node.simpleStringWithNodeId())
          }
        }
      } catch {
        // streaming queries can't produce a batch executedPlan without
        // running; they are covered by their own streaming specs
        case _: Throwable => ()
      }
    }
    println(s"[planlint] checked $checked query plans; " +
      s"$bad unallowlisted hits, $allowed allowlisted (ANN certification terms)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
