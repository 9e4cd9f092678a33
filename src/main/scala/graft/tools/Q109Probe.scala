package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Ad-hoc: cost split of q109's bucketed writes, as-is vs
  * pre-repartitioned by the bucket key (one bucket per task → one file
  * per bucket instead of tasks×buckets small files). */
object Q109Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    items.count()
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q109probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def files(p: String): Int = {
      val d = new java.io.File(p)
      if (d.isDirectory) d.listFiles().count(_.getName.startsWith("part-")) else 0
    }
    for (round <- 1 to 2) {
      // baseline arm: the RAW bucketBy write, every input task writing
      // slices of every bucket — Scale.writeBucketed pre-repartitions
      // internally now, so the baseline must bypass it to stay a
      // baseline (it was silently identical to the fast arm for a
      // while; the 2.5× below is only reproducible via this raw path)
      val t1 = graft.util.TempDirs.scratch("q109p_a")
      timed(s"r$round write raw bucketBy") {
        spark.sql("DROP TABLE IF EXISTS q109p_a")
        items.write.mode("overwrite")
          .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").option("path", s"$t1/t").saveAsTable("q109p_a")
      }
      println(s"[q109probe]   files: ${files(s"$t1/t")}")
      val t2 = graft.util.TempDirs.scratch("q109p_b")
      timed(s"r$round write pre-repartitioned (Scale.writeBucketed)")(
        Scale.writeBucketed(items, "q109p_b", "o_orderkey", 16, Some(s"$t2/t")))
      println(s"[q109probe]   files: ${files(s"$t2/t")}")
    }
    spark.stop()
  }
}
