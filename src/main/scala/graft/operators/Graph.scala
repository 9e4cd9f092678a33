package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph algorithms beyond connected components
  * ([[Dedup.connectedComponents]]). Same scale discipline: per-round
  * shuffles carry (8-byte id, 8-byte value) pairs only, lineage is
  * truncated per round, and only O(1) counters reach the driver.
  */
object Graph {

  /** Fixed-iteration PageRank in EXACT fixed-point integer arithmetic.
    *
    * Ranks are maintained as `BIGINT` fixed-point (scale = 1e9):
    *   r0(v)   = scale / N
    *   r_k+1(v) = (15·scale)/(100·N) + (85 · Σ_{(u,v)∈E} r_k(u) div deg(u)) div 100
    * — every step is integral division on longs, so the result is
    * bit-identical across engines AND across partitionings (long sums
    * are associative; no IEEE rounding anywhere). A float formulation
    * would pin the oracle to summation order — the same reason k-means
    * training sums fixed-point ([[graft.functions.VecFixedSum]]).
    *
    * Fixed `iters` (power iteration truncated, not converged): the
    * deterministic-replay contract a DuckDB oracle can unroll. Rank
    * mass from dangling nodes (deg = 0) is dropped, per the classic
    * simplified formulation — callers wanting circulation add reverse
    * edges.
    *
    * Scale shape: edges persist once ((src, dst) longs); each round is
    * one join edges⋈ranks (co-partitioned on src after the first
    * round), one partial-aggregated groupBy(dst), one left join back
    * to the node list. Unlike the CC loop — which takes a per-round
    * ACTION (the convergence count) and therefore must truncate every
    * round — this loop runs a fixed number of rounds with no
    * mid-loop action, so ranks are truncated only every
    * `checkpointInterval` rounds (the GraphX/Pregel convention): short
    * chains evaluate as ONE fused DAG (measured 5.5 → ~2 s for 3
    * rounds at sf0.1), long chains stay bounded in plan depth.
    * Truncation is `localCheckpoint`, or reliable `checkpoint(dir)`
    * under `checkpointDir` on a cluster — same contract as
    * [[Dedup.connectedComponents]]. Only N (a count) reaches the
    * driver. Returns (id, rank_fx) for every node.
    */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int = 3, scale: Long = 1000000000L,
                    checkpointDir: Option[String] = None,
                    checkpointInterval: Int = 5): DataFrame = {
    val cut: DataFrame => DataFrame = checkpointDir match {
      case Some(d) =>
        edges.sparkSession.sparkContext.setCheckpointDir(d)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(true)
    }
    val e = cut(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct())
    val nodes = cut(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val base = 15L * scale / (100L * n)
    var ranks = nodes.select(col("id"), lit(scale / n).as("r"))
    for (k <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("cs"))
      val next = nodes
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) + expr(s"(85 * coalesce(cs, 0L)) div 100")).as("r"))
      ranks = if (k % checkpointInterval == 0 && k < iters) cut(next) else next
    }
    ranks.select(col("id"), col("r").as("rank_fx"))
  }
}
