package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc: q164 prefix-filter all-pairs — isolated timing + stage
  * split (benched 3.05 s at sf0.1 on first inclusion; where do the
  * seconds go: postings, df agg, per-doc sort/arrays, candidate join,
  * or verification?). */
object Q164Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("warm scan")(docs.count())
    timed("q164 run1")(graft.queries.Pipeline.queries("q164_allpairs_exact")(spark, dir).count())
    timed("q164 run2")(graft.queries.Pipeline.queries("q164_allpairs_exact")(spark, dir).count())

    val post = graft.operators.Dedup.shingleHashes(docs, "doc_id", "text", 3)
    timed("postings (shingle_hash_set explode)")(post.count())
    timed("df agg")(post.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .agg(bit_xor(col("df"))).collect().length.toLong)
    val (arrs, cands) = graft.operators.Dedup
      .prefixFilterCandidates(docs, "doc_id", "text", 3, 0.5)
    timed("arrs (freq join + per-doc sort)")(
      arrs.agg(sum(col("n")), bit_xor(size(col("arr")).cast("long"))).collect().length.toLong)
    timed("candidates (prefix join + distinct)")(cands.count())
    timed("q164 run3")(graft.queries.Pipeline.queries("q164_allpairs_exact")(spark, dir).count())
    spark.stop()
  }
}
