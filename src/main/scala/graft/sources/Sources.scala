package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.api.GraftFrame

/** Data sources for the engine.
  *
  * The reference reads exactly one format: headerless `|`-delimited CSV
  * with a caller-supplied schema, split into ~10 MB spans parsed in
  * parallel (reference: src/reader.rs:75-219). Spark's CSV source does
  * the same split-parallel read across executors — at 100 TB the same
  * declaration scales from 32 local threads to thousands of tasks with
  * zero code change.
  *
  * The driver testdata is Parquet (TESTDATA.md), so parquet is the
  * primary scan path: columnar, predicate-pushdown and column-pruning
  * capable — the scan properties the reference approximates with its
  * per-column pool are native here.
  */
object Sources {

  /** Reference-parity CSV read (reference: src/dataframe.rs:286-295).
    * Headerless, `|`-separated, schema required — never inferred
    * (reference: src/schema.rs / src/dataframe.rs:286).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          sep: String = "|"): GraftFrame =
    GraftFrame(
      spark.read.schema(schema)
        .option("header", "false")
        .option("sep", sep)
        // the reference's sample rows carry a trailing `|` whose extra
        // positional field is ignored (data/line_items.csv); Spark drops
        // trailing unmatched fields under PERMISSIVE mode too
        .option("mode", "PERMISSIVE")
        .csv(path))

  /** Parquet scan — primary path for the driver testdata. */
  def parquet(spark: SparkSession, path: String): GraftFrame =
    GraftFrame(spark.read.parquet(path))

  /** Load one named testdata table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** In-memory source (reference: src/dataframe.rs:271-284 /
    * from_vecs!). Spark-side: `spark.createDataFrame` / `Seq(...).toDF`
    * — used by the golden-parity tests.
    */
  def inMemory(df: DataFrame): GraftFrame = GraftFrame(df)

  /** Sink: the reference has none (results leave via collect/HTTP —
    * SURVEY.md §2.1); ours writes any result as parquet, partitioned
    * for scale when partition columns are given.
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** JSON-lines read — schema required, like the CSV source (inference
    * would scan the data twice; at 100 TB schema-on-read is declared,
    * not discovered). One JSON object per line; the line-splittable
    * format parallelizes across executors exactly as CSV spans do.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): GraftFrame =
    GraftFrame(spark.read.schema(schema).json(path))

  /** JSON-lines sink (one object per line, partitionable). */
  def writeJsonl(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }

  /** ORC read — the other columnar format with predicate pushdown and
    * column pruning; same scan properties as parquet (vectorized
    * reader, min/max skipping), interchangeable at 100 TB where a
    * lakehouse standardized on ORC.
    */
  def orc(spark: SparkSession, path: String): GraftFrame =
    GraftFrame(spark.read.orc(path))

  /** ORC sink (columnar, partitionable). */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
