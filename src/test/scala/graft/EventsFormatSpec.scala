package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format-drift gate for the events reader (round-4 postmortem: the
  * driver regenerated events.parquet with a different physical ts
  * encoding and 15 queries broke, 5 of them silently).
  *
  * Writes the SAME tiny event set in all three encodings the reader
  * supports — raw int64 nanos (what `nanosAsLong` surfaces for
  * TIMESTAMP(NANOS) files), TIMESTAMP_NTZ micros, and TIMESTAMP_LTZ —
  * and asserts [[graft.sources.Events]] normalizes every one to the
  * identical TIMESTAMP_LTZ instants, through both the plain read and
  * an hourly windowed aggregate (the shape the streaming twin uses).
  */
class EventsFormatSpec extends SparkSpec {

  // 2024-03-01T00:00:00Z plus offsets spanning several hours
  private val baseUs = 1709251200000000L
  private val offsetsUs =
    Seq(0L, 59_000_000L, 3_600_000_000L, 3_661_000_000L, 7_300_000_000L)

  /** Write the fixture with `ts` produced by `tsCol` (from micros). */
  private def writeFixture(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    offsetsUs.zipWithIndex
      .map { case (off, i) => (i.toLong, baseUs + off, i.toLong % 2, s"t$i", 1.5 * i) }
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readNormalized(dir: String): DataFrame =
    graft.sources.Events.ev(spark, dir)

  test("all three ts encodings normalize to identical LTZ instants") {
    val root = java.nio.file.Files.createTempDirectory("graft_evfmt").toString
    val nanosDir = s"$root/nanos"; val ntzDir = s"$root/ntz"; val ltzDir = s"$root/ltz"
    // raw long nanos — what spark.sql.legacy.parquet.nanosAsLong=true
    // surfaces for an INT64 TIMESTAMP(NANOS) file
    writeFixture(nanosDir, (col("us") * 1000L).cast(LongType))
    // INT64 micros, isAdjustedToUTC=0 → TIMESTAMP_NTZ
    writeFixture(ntzDir, timestamp_micros(col("us")).cast(TimestampNTZType))
    // INT64 micros, isAdjustedToUTC=1 → TIMESTAMP_LTZ (passthrough)
    writeFixture(ltzDir, timestamp_micros(col("us")))

    val frames = Seq(nanosDir, ntzDir, ltzDir).map(readNormalized)
    frames.foreach { f =>
      assert(f.schema("ts").dataType === TimestampType,
        "normalizer must yield TIMESTAMP_LTZ for every encoding")
    }
    val expected = offsetsUs.map(baseUs + _)
    frames.foreach { f =>
      val got = f.orderBy("event_id")
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      assert(got === expected)
    }
    // the windowed-aggregate shape (streaming twin) agrees across encodings
    val rollups = frames.map { f =>
      f.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("w"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(rollups(0) === rollups(1))
    assert(rollups(1) === rollups(2))
    assert(rollups(0).nonEmpty)
    graft.util.TempDirs.deleteRecursively(new java.io.File(root))
  }

  test("the live testdata timeline is not collapsed (q148 canary shape)") {
    val span = graft.queries.Analytics.queries("q148_events_span")(spark, sf)
      .collect()(0)
    val mn = span.getTimestamp(0).toInstant.toString
    val mx = span.getTimestamp(1).toInstant.toString
    assert(mn.startsWith("2024"), s"events min ts is $mn — timeline collapse?")
    assert(mx.startsWith("2024"), s"events max ts is $mx — timeline collapse?")
    assert(span.getLong(2) === span.getLong(3),
      "every event should fall in 2024 at this sf")
  }
}
