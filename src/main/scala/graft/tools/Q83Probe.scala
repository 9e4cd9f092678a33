package graft.tools
import org.apache.spark.sql.SparkSession
object Q83Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.queries.Curation.q83BloomDecontaminate(spark, dir).count()
      println(f"[probe] q83 run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    val t0 = System.nanoTime()
    val n = graft.queries.Curation.q57Decontaminate(spark, dir).count()
    println(f"[probe] q57: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    spark.stop()
  }
}
