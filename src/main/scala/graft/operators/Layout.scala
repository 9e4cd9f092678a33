package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.LayoutFunctions.interleave_bits

/** Data-layout operators: multi-dimensional clustering for data
  * skipping. At 100 TB the fastest scan is the one that never happens —
  * parquet keeps per-file/row-group min/max footers for every column,
  * and the reader prunes whole files whose range can't match a pushed
  * predicate. That only helps if rows are CLUSTERED so ranges are
  * tight: a single-column sort gives tight ranges on one column and
  * random ranges on every other; the Z-order (Morton) curve spreads
  * tightness across k columns, so box predicates on any subset of them
  * prune.
  *
  * Pipeline shape: one stats pass (min/max per dimension — a scalar,
  * never the data), bin each dimension to 16 bits, interleave into the
  * z key (native codegen'd [[graft.functions.InterleaveBits]]),
  * `repartitionByRange` on the key (one shuffle, range-sampled
  * balanced output files), sort within partitions, write. The key
  * itself is dropped — the layout IS the artifact.
  */
object Layout {

  /** Bin a numeric column into 0..65535 against a fixed [mn, mx] range
    * (from the stats pass). Values at mx land in the top bin; a
    * degenerate range collapses to bin 0. */
  def binned(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0)
    else least(lit(65535),
      floor((c.cast("double") - lit(mn)) * lit(65536.0 / (mx - mn)))).cast("int")

  /** Attach the z-order key `__z` over the given numeric dimensions:
    * stats pass → 16-bit binning → native bit interleave. */
  def withZKey(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggCols = dims.flatMap(d => Seq(
      min(col(d)).cast("double").as(s"mn_$d"),
      max(col(d)).cast("double").as(s"mx_$d")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val binCols = dims.zipWithIndex.map { case (d, i) =>
      require(!stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
        s"zorder: dimension '$d' has no non-null values " +
          "(empty input or all-null column) — cannot derive a bin range")
      binned(col(d), stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }
    df.withColumn("__z", interleave_bits(binCols: _*))
  }

  /** Z-order-clustered parquet write: range-partition by the z key into
    * `numFiles` balanced files, sorted within each. One shuffle. */
  def zorderWrite(df: DataFrame, dims: Seq[String], path: String,
                  numFiles: Int): Unit =
    withZKey(df, dims)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Linear (single-column sort) write — the comparison layout. */
  def linearWrite(df: DataFrame, sortCol: String, path: String,
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** Data-skipping evidence: how many files of `path` are CANDIDATES
    * for a box predicate — i.e. their per-file [min, max] on every
    * bounded column overlaps the box. This is exactly the decision the
    * parquet reader makes from footer stats, computed explicitly so a
    * spec can assert layout quality (a z-ordered layout admits far
    * fewer candidates than a single-column sort for 2-D boxes).
    */
  def candidateFiles(spark: SparkSession, path: String,
                     bounds: Seq[(String, Double, Double)]): Long = {
    val aggCols = bounds.flatMap { case (c, _, _) =>
      Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))
    }
    val perFile = spark.read.parquet(path)
      .select(input_file_name().as("__f") +:
        bounds.map { case (c, _, _) => col(c) }: _*)
      .groupBy(col("__f"))
      .agg(aggCols.head, aggCols.tail: _*)
    val overlap = bounds.map { case (c, lo, hi) =>
      col(s"mx_$c") >= lit(lo) && col(s"mn_$c") <= lit(hi)
    }.reduce(_ && _)
    perFile.filter(overlap).count()
  }
}
