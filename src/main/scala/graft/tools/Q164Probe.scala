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

    // EXPERIMENT: hash-canonical order (no df join — 1 shuffle instead
    // of 3 in the signature stage). How much does the candidate set
    // balloon without rarest-first prefixes?
    {
      val threshold = 0.5
      val post = graft.operators.Dedup.shingleHashes(docs, "doc_id", "text", 3)
      val arrs2 = post.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("sh"))).as("arr"))
        .select(col("doc_id").as("id"), col("arr"),
          size(col("arr")).cast("long").as("n"))
      val prefixed = arrs2.select(col("id"), col("n"),
        slice(col("arr"), lit(1),
          (col("n") - ceil(lit(threshold) * col("n")) + lit(1)).cast("int"))
          .as("prefix"))
      val index = prefixed.select(col("id"), col("n"),
        posexplode(col("prefix")).as(Seq("pos", "g")))
      val floorI = lit(threshold / (1.0 + threshold)) *
        (col("n_a") + col("n_b")).cast("double") - lit(1e-6)
      val cands2 = index.select(col("g"), col("id").as("id_a"),
          col("n").as("n_a"), col("pos").as("pos_a"))
        .join(index.select(col("g"), col("id").as("id_b"),
          col("n").as("n_b"), col("pos").as("pos_b")), "g")
        .filter(col("id_a") < col("id_b") &&
          least(col("n_a"), col("n_b")).cast("double") >=
            lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double") &&
          least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b"))
            .cast("double") >= floorI)
        .select(col("id_a"), col("id_b")).distinct()
      timed("HASH-order arrs build")(
        arrs2.agg(sum(col("n"))).collect()(0).getLong(0))
      timed("HASH-order candidates")(cands2.count())
    }
    spark.stop()
  }
}
