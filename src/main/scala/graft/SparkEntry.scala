package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from the domain modules:
  *   - [[graft.queries.Relational]] — reference-parity operators
  *     (SURVEY.md §2: scan/select/filter/orderBy/group/aggregate/join
  *     + union/distinct/limit/topk)
  */
object SparkEntry {
  /** Flagship query (the reference's own TPC-H Q1 adaptation,
    * client.py:259-331) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01TpchQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.Stats.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Sampling.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Analytics.oracle ++
      graft.queries.Pipeline.oracle ++
      graft.queries.Temporal.oracle ++
      graft.queries.Stats.oracle ++
      graft.queries.Scalars.oracle ++
      graft.queries.Curation.oracle ++
      graft.queries.Sampling.oracle
}
