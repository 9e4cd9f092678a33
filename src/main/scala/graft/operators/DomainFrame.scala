package graft.operators

import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Materialize a metadata-sized DOMAIN frame (a dimension: event
  * types, sources, labels, dates, sensitive values, per-class
  * centroids) as a driver-local relation — the round-13 mechanism
  * that retired PlanLint's last allowlist entries.
  *
  * Why: these frames are the build sides of the engine's sanctioned
  * BroadcastNestedLoopJoins (the resample grid, pairwise-JSD /
  * KMV-overlap source pairs, the NB / label-margin score-every-class
  * fan-outs, the t-closeness value domain, Theil-Sen's daily frame).
  * Structurally they are grouped aggregates, and the recursive
  * `bounded()` judgment in PlanLint cannot prove a grouped
  * aggregate's key cardinality — each needed a human-vouched
  * allowlist entry. Materializing the frame turns it into a
  * `LocalTableScan`, which IS provably bounded: the gate's last
  * trust-based claims become theorems (r12 verdict #1).
  *
  * The mechanics double as the loud domain-drift guard the verdict
  * asked to pair with the bound: the collect itself goes through
  * `limit(cap + 1)` so even a drifted (no-longer-metadata-sized)
  * domain ships at most cap+1 rows to the driver, and the `require`
  * then fails the query LOUDLY instead of letting a bound silently
  * truncate the domain. And it is perf-neutral-or-better: a broadcast
  * build side is collected to the driver at execution anyway, so
  * collecting it once at build time removes the domain lineage (often
  * a full scan) from the executed plan — frames referenced twice
  * (q125's pair sides, q293's self-join) drop a whole recomputation.
  *
  * The returned frame is a point-in-time snapshot with deterministic
  * VALUES (every caller's domain lineage is a deterministic
  * aggregate); collected row ORDER is not guaranteed, which is fine
  * for the join/aggregate consumers here — never feed the result into
  * an order-sensitive limit.
  */
object DomainFrame {

  /** Collect `df` (at most cap+1 rows reach the driver) and rebuild
    * it as a LocalRelation. Fails loudly if the domain exceeds `cap`.
    * `what` names the domain in the failure message. */
  def materialize(df: DataFrame, cap: Int, what: String): DataFrame = {
    val spark = df.sparkSession
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"domain guard: $what produced ${rows.length} rows (cap $cap) — " +
        "the frame is no longer metadata-sized; fix the upstream domain " +
        "or raise the cap consciously (it sizes a broadcast fan-out)")
    spark.createDataFrame(rows.toSeq.asJava, df.schema)
  }
}
