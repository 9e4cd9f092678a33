package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.api._

/** Port of the reference's 22 golden integration tests
  * (reference: tests/lib.rs:50-394) to the GraftFrame surface.
  *
  * Two deliberate, documented semantic upgrades vs the reference:
  *  - group_by list columns are value-sorted (sort_array) rather than
  *    "pre-sort row order" — the only distributed-deterministic choice
  *    (see GraftFrame.groupBy scaladoc); assertions use sorted lists.
  *  - Float NaN is represented as SQL null (GraftFrame.nanToNull).
  */
class GoldenParitySpec extends SparkSpec {
  import spark.implicits._

  private def boolInt = GraftFrame(
    Seq((true, 1L), (false, 2L), (true, 3L)).toDF("bool", "int"))

  // tests/lib.rs:50-59 — no-op collect
  test("collect returns all rows") {
    assert(boolInt.collect().toSeq ===
      Seq(Row(true, 1L), Row(false, 2L), Row(true, 3L)))
  }

  // tests/lib.rs:61-71 — select one column
  test("select projects a single column") {
    assert(boolInt.select(col("int")).collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 3L))
  }

  // tests/lib.rs:73-92 — select with arithmetic incl. int/int div → float
  test("select with arithmetic and constants") {
    val got = boolInt.select(
      (col("int") + col("int")).as("dbl"),
      (col("int") * lit(10L)).as("mul"),
      (col("int") / col("int")).as("div"))
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 4L, 6L))
    assert(got.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    // int/int division yields double (reference: src/block.rs:496-501)
    assert(got.map(_.getDouble(2)).toSeq === Seq(1.0, 1.0, 1.0))
  }

  // tests/lib.rs:94-106 — filter on int
  test("filter int greater-than") {
    val got = boolInt.filter("int", Predicate(Comparator.GreaterThan, 1L))
    assert(got.collect().map(_.getLong(1)).toSeq === Seq(2L, 3L))
  }

  // tests/lib.rs:107-116 — filter on string
  test("filter string equality") {
    val df = GraftFrame(Seq(("foo", 1L), ("bar", 2L), ("baz", 3L)).toDF("string", "int"))
    val got = df.filter("string", Predicate(Comparator.Equal, "bar"))
    assert(got.collect().toSeq === Seq(Row("bar", 2L)))
  }

  // tests/lib.rs:118-131 — filter then select
  test("filter then select composes") {
    val got = boolInt
      .filter("int", Predicate(Comparator.LessThanOrEq, 2L))
      .select(col("bool"))
    assert(got.collect().map(_.getBoolean(0)).toSeq === Seq(true, false))
  }

  // tests/lib.rs:134-146 — order_by single int column
  test("orderBy single column ascending") {
    val df = GraftFrame(Seq(4L, 1L, 6L, 4L, 1L).toDF("int"))
    assert(df.orderBy("int").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 1L, 4L, 4L, 6L))
  }

  // tests/lib.rs:147-156 — order_by string
  test("orderBy string column") {
    val df = GraftFrame(Seq("foo", "bar", "baz").toDF("string"))
    assert(df.orderBy("string").collect().map(_.getString(0)).toSeq ===
      Seq("bar", "baz", "foo"))
  }

  // tests/lib.rs:158-177 — multi-column order_by
  test("orderBy multiple columns lexicographically") {
    val df = GraftFrame(Seq((4L, 3L), (1L, 1L), (6L, 1L), (4L, 1L), (1L, 2L))
      .toDF("a", "b"))
    assert(df.orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (1L, 2L), (4L, 1L), (4L, 3L), (6L, 1L)))
  }

  // tests/lib.rs:179-185 — group_by keys only (distinct sorted keys)
  test("groupBy keys-only yields sorted distinct keys") {
    val df = GraftFrame(Seq(2L, 1L, 2L, 3L).toDF("int"))
    assert(df.groupBy("int").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
  }

  // tests/lib.rs:188-203 — group_by nests non-keys into lists
  test("groupBy nests non-key column into sorted list") {
    val got = boolInt.groupBy("int").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_.getSeq[Boolean](1)).toSeq ===
      Seq(Seq(true), Seq(false), Seq(true)))
  }

  // tests/lib.rs:206-239 — string group keys and string lists
  test("groupBy string key with int list") {
    val df = GraftFrame(Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("s", "i"))
    val got = df.groupBy("s").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(got.map(_.getSeq[Long](1)).toSeq === Seq(Seq(1L, 3L), Seq(2L)))
  }

  // tests/lib.rs:241-259 — multi-key group_by
  test("groupBy multiple keys") {
    val df = GraftFrame(Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 1L, 30L))
      .toDF("k1", "k2", "v"))
    val got = df.groupBy("k1", "k2").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq ===
      Seq((1L, 1L, Seq(10L, 30L)), (1L, 2L, Seq(20L))))
  }

  // tests/lib.rs:261-275 — group then aggregate over list columns.
  // Sum output type follows the reference rule (src/aggregate.rs:96-102):
  // Int list → Int (long), not silently widened to double.
  test("groupBy then aggregate collapses lists") {
    val got = boolInt.groupBy("bool")
      .aggregate(Map("int" -> Aggregator.Sum)).collect()
    assert(got.map(r => (r.getBoolean(0), r.getLong(1))).toSeq ===
      Seq((false, 2L), (true, 4L)))
  }

  // src/aggregate.rs:96-102 — grouped Sum over a Float list stays double
  test("grouped Sum keeps Int->Int and Float->Float output types") {
    val df = GraftFrame(Seq((true, 1L, 0.5), (true, 2L, 0.25), (false, 3L, 1.0))
      .toDF("k", "i", "f"))
    val got = df.groupBy("k")
      .aggregate(Map("i" -> Aggregator.Sum, "f" -> Aggregator.Sum))
    val schema = got.df.schema
    assert(schema("i").dataType === org.apache.spark.sql.types.LongType)
    assert(schema("f").dataType === org.apache.spark.sql.types.DoubleType)
    val rows = got.collect()
    assert(rows.map(r => (r.getBoolean(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((false, 3L, 1.0), (true, 3L, 0.75)))
  }

  // src/dataframe.rs:317-318 — Error::AliasRequired: computed select
  // expressions must be explicitly aliased; bare column refs pass.
  test("select rejects unaliased computed expressions (AliasRequired)") {
    val e = intercept[GraftException] {
      boolInt.select(col("int") + lit(1L))
    }
    assert(e.getMessage.contains("AliasRequired"))
    // aliased computed expr and bare refs are fine
    assert(boolInt.select(col("bool"), (col("int") + lit(1L)).as("succ"))
      .collect().length === 3)
  }

  // src/block.rs:89-107 — strict mode reproduces the reference's
  // same-type arithmetic rule: Int∘Float mixing is a type error;
  // Int∘Int (incl. div → float, src/block.rs:496-501) stays legal.
  test("strict mode rejects Int/Float mixed arithmetic") {
    val e = intercept[GraftException] {
      boolInt.strict.select((col("int") + lit(1.5)).as("bad"))
    }
    assert(e.getMessage.contains("type mismatch"))
    // same-family arithmetic passes in strict mode...
    assert(boolInt.strict.select((col("int") * lit(2L)).as("ok"))
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 4L, 6L))
    // ...and the default (non-strict) frame keeps Spark coercion
    assert(boolInt.select((col("int") + lit(1.5)).as("ok"))
      .collect().map(_.getDouble(0)).toSeq === Seq(2.5, 3.5, 4.5))
    // strictness survives chaining through other operators
    val e2 = intercept[GraftException] {
      boolInt.strict.filter(col("int") + lit(0.5) > lit(1L))
    }
    assert(e2.getMessage.contains("type mismatch"))
  }

  // tests/lib.rs:277-323 — each aggregator, ungrouped (global)
  test("ungrouped aggregators: sum/avg/count/first/max/min") {
    val df = GraftFrame(Seq(2L, 1L, 2L, 3L).toDF("int"))
    def agg1(a: Aggregator) = df.aggregate(Map("int" -> a)).collect()(0)
    assert(agg1(Aggregator.Sum).getLong(0) === 8L)
    assert(agg1(Aggregator.Average).getDouble(0) === 2.0)
    assert(agg1(Aggregator.Count).getLong(0) === 4L)
    assert(agg1(Aggregator.First).getLong(0) === 2L)
    assert(agg1(Aggregator.Max).getLong(0) === 3L)
    assert(agg1(Aggregator.Min).getLong(0) === 1L)
  }

  // tests/lib.rs:325-343 — multi-column aggregate
  test("multi-column aggregate with mixed aggregators") {
    val df = GraftFrame(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("a", "b"))
    val got = df.aggregate(Map("a" -> Aggregator.Sum, "b" -> Aggregator.Max)).collect()(0)
    assert(got.getLong(0) === 6L)
    assert(got.getLong(1) === 30L)
  }

  // tests/lib.rs:345-368 — join with duplicate keys on both sides
  test("inner join multiplies duplicate keys, keeps both key columns") {
    val l = GraftFrame(Seq((3L, "l3"), (2L, "l2"), (1L, "l1a"), (1L, "l1b"))
      .toDF("l_int", "l_str"))
    val r = GraftFrame(Seq((3L, "r3"), (2L, "r2a"), (2L, "r2b"), (1L, "r1a"), (1L, "r1b"))
      .toDF("r_int", "r_str"))
    val got = l.join(r, "l_int", "r_int")
    assert(got.df.columns.toSeq === Seq("l_int", "l_str", "r_int", "r_str"))
    // key 1: 2×2, key 2: 1×2, key 3: 1×1 → 7 rows, ordered by left key
    assert(got.count() === 7L)
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L))
  }

  // tests/lib.rs:370-394 — CSV read with schema
  test("pipe-delimited headerless CSV read with schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "small.csv")
    java.nio.file.Files.writeString(f.toPath,
      "true|1|1.0|hello world|\nfalse|4|1.2|fOObAr|\n")
    val schema = StructType(Seq(
      StructField("bool", BooleanType), StructField("int", LongType),
      StructField("float", DoubleType), StructField("string", StringType)))
    val got = graft.sources.Sources.csv(spark, f.getAbsolutePath, schema)
    assert(got.collect().toSeq === Seq(
      Row(true, 1L, 1.0, "hello world"),
      Row(false, 4L, 1.2, "fOObAr")))
  }

  // validation parity (reference: src/dataframe.rs:126-128, 407-424)
  test("validation errors mirror the reference") {
    intercept[GraftException](boolInt.filter("nope", Predicate(Comparator.Equal, 1)))
    intercept[GraftException](boolInt.orderBy())
    intercept[GraftException](
      boolInt.groupBy("bool").aggregate(Map("bool" -> Aggregator.Sum)))
    intercept[GraftException](boolInt.groupBy("bool").aggregate(Map()))
    val dup = GraftFrame(Seq((1L, 2L)).toDF("a", "b"))
    intercept[GraftException](dup.join(dup, "a", "a"))
  }

  // NaN→null ingest convention (reference: src/value.rs:43-81)
  test("NaN maps to null; min/max skip it; nulls sort first") {
    val df = GraftFrame.nanToNull(
      Seq(1.0, Double.NaN, 3.0).toDF("f"))
    val g = GraftFrame(df)
    val agg = g.aggregate(Map("f" -> Aggregator.Max)).collect()(0)
    assert(agg.getDouble(0) === 3.0)
    val sorted = g.orderBy("f").collect()
    assert(sorted(0).isNullAt(0)) // null (was NaN) first
  }

  // driver smoke: flagship entry returns rows
  // reference src/pool.rs:57-62 — computed columns are memoized in the
  // process pool and reused across queries in a session; the Spark
  // equivalent is the explicit cache() mark on the shared frame
  test("cache() memoizes a shared subtree across queries (pool parity)") {
    val shared = boolInt.select(
      (col("int") * lit(10L)).as("mul"), col("bool")).cache()
    try {
      // two downstream "session queries" over the same cached frame
      assert(shared.filter("mul", Predicate(Comparator.GreaterThan, 10L))
        .collect().map(_.getLong(0)).toSeq.sorted === Seq(20L, 30L))
      assert(shared.count() === 3L)
      // the mark is a real InMemoryRelation in the second query's plan
      assert(shared.df.queryExecution.withCachedData.toString
        .contains("InMemoryRelation"),
        "expected cached subtree reuse in the plan")
    } finally shared.uncache()
  }

  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
