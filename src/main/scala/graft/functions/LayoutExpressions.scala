package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit-interleave (Morton / Z-order) of k unsigned 16-bit values into
  * one long: output bit (j·k + i) = bit j of input i. Sorting by this
  * key clusters rows so that EVERY interleaved dimension is locally
  * dense — the standard multi-dimensional data-skipping layout: after
  * a z-ordered write, parquet footer min/max on each dimension column
  * is tight per file, so a box predicate on any subset of the
  * dimensions prunes files/row-groups without any index structure.
  *
  * A native expression rather than a shiftleft/bitwiseOR tree: k=2
  * already needs 64 nested calls (plan bloat, the q75 lesson), and the
  * generated loop is the same machine code a hand-rolled spread-bits
  * routine gives.
  *
  * Inputs are masked to 16 bits (callers bin arbitrary columns into
  * 0..65535 first — [[graft.operators.Layout.binned]]); null in any
  * dimension → null key (sorts together, harmless for layout).
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  require(children.nonEmpty && children.size <= 4,
    s"interleave_bits takes 1-4 dimensions, got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == IntegerType || c.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires int/bigint dims, got ${children.map(_.dataType.sql).mkString(", ")}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = children.size
    var z = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      val x = (v match {
        case l: Long => l
        case n: Int => n.toLong
      }) & 0xFFFFL
      var j = 0
      while (j < 16) {
        z |= ((x >>> j) & 1L) << (j * k + i)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val dimCode = evals.zipWithIndex.map { case (e, i) =>
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) {
         |  long $x = ((long) ${e.value}) & 0xFFFFL;
         |  for (int $j = 0; $j < 16; $j++) {
         |    ${ev.value} |= (($x >>> $j) & 1L) << ($j * $k + $i);
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
         |boolean ${ev.isNull} = false;
         |long ${ev.value} = 0L;
         |$dimCode
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "interleave_bits"
}

object LayoutFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def interleave_bits(dims: Column*): Column =
    column(InterleaveBits(dims.map(expression)))
}
