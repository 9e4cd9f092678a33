package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters summary: batched Misra-Gries (a.k.a. SpaceSaving
  * family). Bounded memory (≤ 2·capacity live keys), one pass,
  * mergeable — the 100 TB top-k path: each task summarizes its
  * partition in fixed memory, partial summaries merge associatively,
  * and only capacity-sized states cross the shuffle, never the
  * (key, count) universe. Estimates UNDERCOUNT by at most `err`
  * (the classic MG bound: err ≤ N/capacity); when the true distinct
  * key count never exceeds `capacity`, no eviction happens and every
  * count is exact with err = 0 (the regime the DuckDB oracle checks;
  * the sketch regime is spec-tested under capacity pressure).
  *
  * Mergeability of MG summaries is the Agarwal et al. "Mergeable
  * Summaries" (PODS'12) result; the batched eviction keeps update
  * amortized O(1): on overflow past 2·capacity, subtract the
  * (capacity+1)-th largest count θ from every entry, drop the ≤ 0
  * ones (≤ capacity survive by construction), and add θ to the
  * sketch-wide error bound.
  */
final class MgSummary(val capacity: Int) {
  val counts = new java.util.HashMap[UTF8String, Array[Long]](capacity * 2)
  var err: Long = 0L

  def add(key: UTF8String, inc: Long): Unit = {
    val slot = counts.get(key)
    if (slot != null) slot(0) += inc
    else {
      // copy: the incoming UTF8String aliases a reusable row buffer
      counts.put(UTF8String.fromBytes(key.getBytes), Array(inc))
      if (counts.size > capacity * 2) prune()
    }
  }

  private def prune(): Unit = {
    val vals = new Array[Long](counts.size)
    var i = 0
    val it = counts.values().iterator()
    while (it.hasNext) { vals(i) = it.next()(0); i += 1 }
    java.util.Arrays.sort(vals)
    val theta = vals(vals.length - capacity - 1) // (capacity+1)-th largest
    val entries = counts.entrySet().iterator()
    while (entries.hasNext) {
      val e = entries.next()
      if (e.getValue()(0) <= theta) entries.remove()
      else e.getValue()(0) -= theta
    }
    err += theta
  }

  def mergeIn(other: MgSummary): Unit = {
    err += other.err
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val slot = counts.get(e.getKey)
      if (slot != null) slot(0) += e.getValue()(0)
      else {
        counts.put(e.getKey, Array(e.getValue()(0))) // already owned bytes
        if (counts.size > capacity * 2) prune()
      }
    }
  }

  /** Top-k entries by (count desc, key asc — binary UTF8 order, which
    * matches VARCHAR collation in the oracle). */
  def topK(k: Int): Array[(UTF8String, Long)] = {
    val arr = new Array[(UTF8String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue()(0)); i += 1 }
    java.util.Arrays.sort(arr, new java.util.Comparator[(UTF8String, Long)] {
      def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    arr.take(k)
  }
}

/** `space_saving_topk(key, k, capacity)` — native aggregate returning
  * `array<struct<key: string, cnt: bigint, err: bigint>>`: the top-k
  * keys by estimated frequency, each with the sketch's global
  * undercount bound.
  */
case class SpaceSavingTopK(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  require(k > 0 && capacity >= k, s"need capacity ($capacity) >= k ($k) > 0")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk requires a string key column, got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: MgSummary, other: MgSummary): MgSummary = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: MgSummary): Any =
    new GenericArrayData(buffer.topK(k).map { case (key, cnt) =>
      new GenericInternalRow(Array[Any](key, cnt, buffer.err))
    })

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.err)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSummary(capacity)
    s.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(UTF8String.fromBytes(b), Array(in.readLong()))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "space_saving_topk"
}

object SketchFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def space_saving_topk(key: Column, k: Int, capacity: Int): Column =
    column(SpaceSavingTopK(expression(key), k, capacity).toAggregateExpression())
}
