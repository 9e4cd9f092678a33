package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.api._

/** Algebraic invariants (SURVEY.md §5 item 3) checked over generated
  * inputs: filter commutativity, sort idempotence, aggregation
  * decomposition, join cardinality for duplicate keys.
  */
class PropertySpec extends Properties("graft") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(-100L, 100L)))

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8) // each case spins Spark jobs; keep small

  property("chained filters commute") = Prop.forAll(rowsGen) { rows =>
    rows.isEmpty || {
      val df = GraftFrame(rows.toDF("k", "v"))
      val a = df.filter("k", Predicate(Comparator.GreaterThan, 1L))
        .filter("v", Predicate(Comparator.LessThanOrEq, 50L))
      val b = df.filter("v", Predicate(Comparator.LessThanOrEq, 50L))
        .filter("k", Predicate(Comparator.GreaterThan, 1L))
      a.orderBy("k", "v").collect().toSeq == b.orderBy("k", "v").collect().toSeq
    }
  }

  property("sort is idempotent") = Prop.forAll(rowsGen) { rows =>
    rows.isEmpty || {
      val df = GraftFrame(rows.toDF("k", "v"))
      df.orderBy("k", "v").collect().toSeq ==
        df.orderBy("k", "v").orderBy("k", "v").collect().toSeq
    }
  }

  property("grouped sums decompose to global sum") = Prop.forAll(rowsGen) { rows =>
    rows.isEmpty || {
      val df = rows.toDF("k", "v")
      val global = df.agg(sum("v")).collect()(0).getLong(0)
      val grouped = df.groupBy("k").agg(sum("v").as("s"))
        .agg(sum("s")).collect()(0).getLong(0)
      global == grouped
    }
  }

  property("join cardinality = sum of per-key count products") =
    Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      l.isEmpty || r.isEmpty || {
        val joined = l.toDF("lk", "lv")
          .join(r.toDF("rk", "rv"), col("lk") === col("rk"), "inner").count()
        val lc = l.groupBy(_._1).view.mapValues(_.size).toMap
        val rc = r.groupBy(_._1).view.mapValues(_.size).toMap
        joined == lc.map { case (k, n) => n.toLong * rc.getOrElse(k, 0).toLong }.sum
      }
    }
}
