package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 stage-attribution probes (rule 12/13: blame by
  * measurement in an isolated fresh JVM, never narrative) for the
  * verdict's "never profiled" heavies: q233 pair alignment, q261
  * phash canonical, q208 SSSP, and the unigram train chain
  * (q262/q263). Each phase is forced through an aggregate that keeps
  * the expensive columns alive (rule 11 — no pruned counts).
  */
object R14Probe {
  def spark32(): SparkSession = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def force(df: DataFrame): Long =
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(bit_xor(col("h"))).collect()(0).getLong(0)
}

object R14Q233Probe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val spark = spark32()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    import graft.operators.{Curation => C}
    val fps = timed("phase 1: winnowFingerprints + distinct (full corpus)") {
      val f = C.winnowFingerprints(d, "doc_id", "text", k = 4, w = 5)
        .select(col("doc_id"), col("fp")).distinct().localCheckpoint(true)
      println("  fps rows: " + f.count()); f
    }
    val pairs = timed("phase 2: df filter + fp self-join -> pairs") {
      val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 50)).select(col("fp"))
      val sh = fps.join(keep, "fp")
      val p = sh.as("a").join(sh.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3).localCheckpoint(true)
      println("  pairs: " + p.count()); p
    }
    val grams = timed("phase 3: positionalGrams over participating docs") {
      val docsIn = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b"))).distinct()
      val g = C.positionalGrams(d.join(docsIn, "doc_id"),
        "doc_id", "text", k = 4).localCheckpoint(true)
      println("  gram rows: " + g.count()); g
    }
    timed("phase 4: alignSharedRuns (pair join + runs + argmax)") {
      println("  out hash: " + force(
        C.alignSharedRuns(pairs, grams, "doc_id", k = 4)))
    }
    timed("fused q233 (fresh plan, end to end)") {
      println("  out hash: " + force(
        graft.queries.Curation.q233PairAlignment(spark, dir)))
    }
    spark.stop()
  }
}

object R14Q261Probe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val spark = spark32()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.operators.{Dedup, Multimodal}
    val ph = timed("phase 1: phashTable (decode + dhash)") {
      val p = Multimodal.phashTable(Multimodal.mediaTable(spark, dir)).toDF()
        .select(col("media_id"), col("dhash")).localCheckpoint(true)
      println("  media rows: " + p.count()); p
    }
    val reps = timed("phase 2: exact-hash collapse (reps)") {
      val r = ph.groupBy(col("dhash")).agg(min(col("media_id")).as("rep"))
        .localCheckpoint(true)
      println("  distinct hashes: " + r.count()); r
    }
    val pairs = timed("phase 3: signaturePairs (Hamming<=3 pigeonhole)") {
      val p = Dedup.signaturePairs(
          reps.select(col("rep").as("media_id"), col("dhash").as("sig")),
          "media_id", maxHamming = 3, maxBucket = 4096)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      println("  rep pairs: " + p.count()); p
    }
    val cc = timed("phase 4: connectedComponents over rep pairs") {
      val c = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .localCheckpoint(true)
      println("  cc rows: " + c.count()); c
    }
    timed("phase 5: keep-list join + canonical window") {
      val hashCluster = reps.join(cc, reps("rep") === cc("id"), "left_outer")
        .select(col("dhash"), coalesce(col("cluster"), col("rep")).as("cluster"))
      val sized = Multimodal.mediaTable(spark, dir).toDF()
        .select(col("media_id"), length(col("payload")).cast("long").as("n_bytes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(desc("n_bytes"), asc("media_id"))
      println("  out hash: " + force(
        ph.join(hashCluster, Seq("dhash"))
          .join(sized, Seq("media_id"))
          .select(col("media_id"), col("dhash"), col("n_bytes"), col("cluster"))
          .withColumn("keep_id", first(col("media_id")).over(w))))
    }
    timed("fused q261 (fresh plan, end to end)") {
      println("  out hash: " + force(
        graft.queries.Pipeline.q261PhashCanonical(spark, dir)))
    }
    spark.stop()
  }
}

object R14Q208Probe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val spark = spark32()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.types.DecimalType
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val rel = timed("phase 1: orders JOIN lineitem -> weighted rel agg") {
      val r = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long")).as("w")).localCheckpoint(true)
      println("  rel rows: " + r.count()); r
    }
    timed("phase 2: ssspFixed 3 rounds (incl edge dedup cut)") {
      val edges = rel.select(col("c").as("src"), col("s").as("dst"), col("w"))
        .unionByName(rel.select(col("s").as("src"), col("c").as("dst"), col("w")))
      val sources = rel.select(col("c").as("id")).distinct()
        .filter(expr("(id div 2) % 50 = 0"))
      println("  out hash: " + force(
        graft.operators.Graph.ssspFixed(edges, "src", "dst", "w",
          sources, "id", rounds = 3)))
    }
    timed("fused q208 (fresh plan, end to end)") {
      println("  out hash: " + force(
        graft.queries.Pipeline.q208Sssp(spark, dir)))
    }
    spark.stop()
  }
}

object R14UnigramProbe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val spark = spark32()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    import graft.operators.{Curation => C}
    // corpus prep (types + positions), replicated from unigramCorpus
    val types = timed("phase 1a: word-type frame (tokenize + groupBy)") {
      val t = d.select(explode(graft.operators.TextAnalysis
          .tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("wc")).localCheckpoint(true)
      println("  types: " + t.count()); t
    }
    timed("phase 1b: per-char positions frame") {
      println("  rows: " + types
        .select(col("w"), col("wc"), length(col("w")).as("len"),
          posexplode(split(col("w"), "(?<=.)(?=.)")))
        .count())
    }
    timed("phase 2: round-0 seed (substring freq + top-64 collect)") {
      val pos = types.select(col("w"), col("wc"), length(col("w")).as("len"),
          posexplode(split(col("w"), "(?<=.)(?=.)")))
        .select(col("w"), col("wc"), col("len"), (col("pos") + 1).as("pos"))
      println("  vocab head: " + pos
        .select(col("w"), col("wc"), col("pos"), col("len"),
          explode(array((2 to 4).map(l => lit(l)): _*)).as("l"))
        .filter(col("pos") + col("l") - 1 <= col("len"))
        .select(expr("substring(w, pos, l)").as("piece"), col("wc"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
        .orderBy(desc("cnt"), asc("piece")).limit(64)
        .collect().take(3).mkString(","))
    }
    timed("fused q262 unigram_rounds (2 rounds, end to end)") {
      println("  out hash: " + force(
        graft.queries.Curation.q262UnigramRounds(spark, dir)))
    }
    timed("fused q263 unigram_heldout (train 97% + apply 3%)") {
      println("  out hash: " + force(
        graft.queries.Curation.q263UnigramHeldout(spark, dir)))
    }
    timed("q265 unigram_fertility (warm: shares starts memo with q263)") {
      println("  out hash: " + force(
        graft.queries.Curation.q265UnigramFertility(spark, dir)))
    }
    spark.stop()
  }
}

object R14Q74Probe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val spark = {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    val dir = "/root/testdata/sf0.1"
    // warm once (JIT/codegen), then 5 timed runs — the bench shape
    graft.queries.Stats.q74HeavyHitters(spark, dir).count()
    for (i <- 1 to 5) {
      System.gc()
      timed(s"q74 run $i (local[$cpus])")(
        graft.queries.Stats.q74HeavyHitters(spark, dir).count())
    }
    println("[probe] scan partitions of lineitem: " +
      spark.read.parquet(s"$dir/lineitem.parquet").rdd.getNumPartitions)
    spark.stop()
  }
}

/** Generic isolated query timer: fresh JVM, run the named queries in
  * order, N timed repetitions each (first = fresh-plan cost, rest =
  * warm). Usage: R14QueryProbe q272_louvain_move[,q177_label_prop...] [runs] [dir]
  */
object R14QueryProbe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val runs = if (args.length > 1) args(1).toInt else 2
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = spark32()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to runs) {
        System.gc()
        timed(s"$name run $i")(fn(spark, dir).count())
      }
    }
    spark.stop()
  }
}

/** A/B the two CC variants on q261's actual rep-pair graph. */
object R14CcProbe {
  import R14Probe._
  def main(args: Array[String]): Unit = {
    val spark = spark32()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.operators.{Dedup, Multimodal}
    val ph = Multimodal.phashTable(Multimodal.mediaTable(spark, dir)).toDF()
      .select(col("media_id"), col("dhash"))
    val reps = ph.groupBy(col("dhash")).agg(min(col("media_id")).as("rep"))
    val pairs = Dedup.signaturePairs(
        reps.select(col("rep").as("media_id"), col("dhash").as("sig")),
        "media_id", maxHamming = 3, maxBucket = 4096)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    println("  pairs: " + pairs.count())
    for (i <- 1 to 2) {
      timed(s"min-label CC run $i")(
        println("  h: " + force(Dedup.connectedComponents(pairs, "id_a", "id_b"))))
      timed(s"alternating CC run $i")(
        println("  h: " + force(Dedup.connectedComponentsAlternating(pairs, "id_a", "id_b"))))
    }
    spark.stop()
  }
}
