package graft

import org.apache.spark.sql.functions._
import graft.functions.LayoutFunctions.interleave_bits
import graft.operators.Layout

/** Z-order layout: curve math against a reference implementation, and
  * the actual data-skipping claim — a 2-D box predicate admits fewer
  * candidate files under a z-ordered layout than under a single-column
  * sort, with identical query results.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(u: Long, e: Long): Long = {
    var z = 0L
    for (j <- 0 until 16) {
      z |= (((u & 0xFFFFL) >>> j) & 1L) << (2 * j)
      z |= (((e & 0xFFFFL) >>> j) & 1L) << (2 * j + 1)
    }
    z
  }

  test("interleave_bits matches the reference morton curve (codegen path)") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (65536L, 65537L)) // masked to 16 bits
    val out = samples.toDF("u", "e")
      .select(col("u"), col("e"),
        interleave_bits(col("u").cast("int"), col("e").cast("int")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (u, e, z) => assert(z === mortonRef(u, e), s"($u,$e)") }
  }

  test("null in any dimension gives a null key") {
    val out = Seq((Some(3), None: Option[Int]), (Some(1), Some(2)))
      .toDF("a", "b")
      .select(interleave_bits(col("a"), col("b")).as("z"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
  }

  test("z-ordered layout prunes more files than a linear sort for 2-D boxes") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"), col("user_id"))
    val zPath = "/tmp/graft_layout_z"
    val linPath = "/tmp/graft_layout_lin"
    Layout.zorderWrite(ev, Seq("user_id", "event_id"), zPath, 16)
    Layout.linearWrite(ev, "event_id", linPath, 16)

    val Row = ev.agg(min("user_id"), max("user_id"),
      min("event_id"), max("event_id")).collect()(0)
    val (uMn, uMx) = (Row.getLong(0), Row.getLong(1))
    val (eMn, eMx) = (Row.getLong(2), Row.getLong(3))
    // box: tight 5% band of users, middle half of event ids
    val uLo = uMn.toDouble
    val uHi = uMn + math.max(1L, (uMx - uMn) / 20)
    val eLo = eMn + (eMx - eMn) / 4.0
    val eHi = eMx - (eMx - eMn) / 4.0
    val bounds = Seq(("user_id", uLo, uHi.toDouble), ("event_id", eLo, eHi))

    val zCand = Layout.candidateFiles(spark, zPath, bounds)
    val linCand = Layout.candidateFiles(spark, linPath, bounds)
    assert(zCand < linCand,
      s"z-order candidates ($zCand) should be < linear candidates ($linCand)")

    // layouts are physical only: identical rows back for the box query
    def boxed(p: String) = spark.read.parquet(p)
      .filter(col("user_id").between(uLo, uHi) &&
        col("event_id").between(eLo, eHi))
    assert(boxed(zPath).except(boxed(linPath)).count() === 0L)
    assert(boxed(linPath).except(boxed(zPath)).count() === 0L)
    assert(boxed(zPath).count() === boxed(linPath).count())
  }
}
