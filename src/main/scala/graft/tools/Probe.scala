package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Ad-hoc local profiling harness (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    timed("shingles only") {
      docs.select(col("doc_id"),
        TextAnalysis.shingles(col("text"), 3).as("sh")).selectExpr("sum(size(sh))").collect()
    }
    timed("exploded distinct shingles") {
      docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), 3))).as("s")).count()
    }
    val sigs = timed("minhash signatures") {
      val s = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32).cache()
      s.count(); s
    }
    timed("banded + candidates") {
      val rowsPerBand = 4
      val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(7)),
          b => xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ",")))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_sig")
      val l = banded.select(col("doc_id").as("id_a"), col("band"), col("band_sig"))
      val r = banded.select(col("doc_id").as("id_b"), col("band"), col("band_sig"))
      val n = l.join(r, Seq("band", "band_sig")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      println(s"[probe] candidate pairs: $n")
    }
    timed("full minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.2).count()
    }
    spark.stop()
  }
}
