package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

/** Bloom-filter bit math shared by the aggregate (interpreted update
  * path) and the probe expression (codegen mirrors it exactly).
  * Double hashing (Kirsch–Mitzenmacher): bit_i of key x is
  * (h1 + i·h2) mod numBits with h1 = x, h2 = fmix64(x) | 1 — the
  * caller pre-hashes arbitrary values to a long with `xxhash64`, so
  * the filter itself only ever sees 8-byte keys.
  *
  * Bit layout: bit b lives at byte (b >>> 3), mask (1 << (b & 7)) of
  * the serialized array — the aggregate's long words are emitted
  * little-endian so the probe can address the binary directly.
  */
object BloomHash {
  def mix64(x0: Long): Long = {
    var h = x0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }
  def bitOf(x: Long, i: Int, numBits: Long): Long =
    ((x + i.toLong * (mix64(x) | 1L)) & Long.MaxValue) % numBits
}

/** Mutable Bloom buffer: a fixed array of words; mergeable by OR. */
final class BloomBuf(val numBits: Int) {
  val words = new Array[Long]((numBits + 63) >>> 6)
  def add(x: Long, numHashes: Int): Unit = {
    var i = 0
    while (i < numHashes) {
      val b = BloomHash.bitOf(x, i, numBits.toLong)
      words((b >>> 6).toInt) |= (1L << (b & 63)) // (1L << s) uses s mod 64
      i += 1
    }
  }
  def orIn(o: BloomBuf): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
  }
  /** little-endian so byte (b>>>3) / mask (1<<(b&7)) addresses bit b */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }
}

/** `bloom_agg(hash64, numBits, numHashes)` — build a Bloom filter over
  * a pre-hashed long column; returns the filter as BINARY
  * (numBits/8 bytes, independent of key count).
  *
  * The 100 TB shape this enables: a membership set (eval-benchmark
  * n-grams, a blocklist, yesterday's doc fingerprints) compressed to
  * ~10 bits/key and broadcast as ONE scalar value, probed map-side by
  * a codegen'd expression — where broadcasting the keys themselves as
  * a hash relation costs 50+ bytes/key and a join. No false negatives
  * ever; false positives at rate ~(1-e^(-kn/m))^k are removed by an
  * exact confirm join over the (pre-filtered, now tiny) survivor set.
  */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuf] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits ($numBits) must be a positive multiple of 64")
  require(numHashes > 0, s"numHashes ($numHashes) must be > 0")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg takes a pre-hashed BIGINT key (use xxhash64), got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuf = new BloomBuf(numBits)

  override def update(buffer: BloomBuf, input: InternalRow): BloomBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: BloomBuf, other: BloomBuf): BloomBuf = {
    buffer.orIn(other); buffer
  }

  override def eval(buffer: BloomBuf): Any = buffer.toBytes

  override def serialize(buffer: BloomBuf): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): BloomBuf = {
    val s = new BloomBuf(numBits)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().get(s.words)
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_union_agg(sketch, numBits)` — OR-merge a column of serialized
  * Bloom filters ([[BloomAgg]] output): the sketch-TABLE union for the
  * membership family (HLL = q110, t-digest = q181, Bloom = this).
  * Per-snapshot decontamination indexes persist as binaries and a new
  * snapshot extends the index by merging ITS filter in — history is
  * never re-hashed. OR is associative/idempotent, so the union is
  * byte-identical to a filter built over the combined key set.
  */
case class BloomUnionAgg(child: Expression, numBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuf] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits ($numBits) must be a positive multiple of 64")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_union_agg takes a serialized bloom filter (binary), got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuf = new BloomBuf(numBits)

  override def update(buffer: BloomBuf, input: InternalRow): BloomBuf = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == (numBits + 63 >>> 6) * 8,
        s"bloom_union_agg: sketch of ${bytes.length} bytes does not match numBits $numBits")
      val s = new BloomBuf(numBits)
      java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(s.words)
      buffer.orIn(s)
    }
    buffer
  }

  override def merge(buffer: BloomBuf, other: BloomBuf): BloomBuf = {
    buffer.orIn(other); buffer
  }

  override def eval(buffer: BloomBuf): Any = buffer.toBytes

  override def serialize(buffer: BloomBuf): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): BloomBuf = {
    val s = new BloomBuf(numBits)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(s.words)
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_union_agg"
}

/** `bloom_might_contain(filter, hash64)` — probe a [[BloomAgg]] binary
  * with a pre-hashed long key. numBits is derived from the binary's
  * length, so filter and probe can't disagree on sizing; numHashes
  * must match the build side. Codegen'd tight loop (the probe sits on
  * the full-corpus side of the pre-filter — the hot path).
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, bigint), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(f: Any, v: Any): Any = {
    val bytes = f.asInstanceOf[Array[Byte]]
    val x = v.asInstanceOf[Long]
    val numBits = bytes.length.toLong << 3
    var i = 0
    while (i < numHashes) {
      val b = BloomHash.bitOf(x, i, numBits)
      if ((bytes((b >>> 3).toInt) & (1 << (b & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) => {
      val nb = ctx.freshName("nb")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val ok = ctx.freshName("ok")
      // mirrors BloomHash.mix64 / bitOf exactly
      s"""
         |long $nb = ((long) $f.length) << 3;
         |long $h2 = $v;
         |$h2 ^= $h2 >>> 33; $h2 *= 0xff51afd7ed558ccdL;
         |$h2 ^= $h2 >>> 33; $h2 *= 0xc4ceb9fe1a85ec53L;
         |$h2 ^= $h2 >>> 33; $h2 |= 1L;
         |boolean $ok = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $b = (($v + (long) $i * $h2) & Long.MAX_VALUE) % $nb;
         |  if (($f[(int)($b >>> 3)] & (1 << ($b & 7))) == 0) { $ok = false; break; }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}

/** Count-Min sketch buffer: depth × width long counters, row-major;
  * mergeable by elementwise add (counts are sums, so merge order is
  * irrelevant — exact associativity, like every sketch here). Row r's
  * counter for pre-hashed key x reuses [[BloomHash.bitOf]] (Kirsch–
  * Mitzenmacher double hashing) with r as the hash index and width as
  * the modulus, so the probe expression mirrors the math exactly.
  * Estimates are min over rows: never below the true count, above it
  * by ≤ ε·N (ε ≈ e/width) with probability 1 − e^−depth per key.
  */
final class CmsBuf(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)
  def add(x: Long, inc: Long): Unit = {
    var r = 0
    while (r < depth) {
      counts(r * width + BloomHash.bitOf(x, r, width.toLong).toInt) += inc
      r += 1
    }
  }
  def addIn(o: CmsBuf): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
  }
  /** little-endian longs; counter (r, c) at byte offset (r·width+c)·8 */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(counts.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(counts)
    bb.array()
  }
}

/** `cms_agg(hash64, depth, width)` — build a Count-Min sketch over a
  * pre-hashed long key column; returns the sketch as BINARY
  * (depth·width·8 bytes, independent of key count). The
  * frequency-estimation sibling of [[BloomAgg]] (membership) and
  * [[SpaceSavingTopK]] (top-k): probe any key's approximate count
  * from the collected model without a groupBy over the corpus —
  * mergeable across partitions, days, or shards by elementwise add,
  * the same incremental-stats pattern as the q110 HLL sketch tables.
  */
case class CmsAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuf] {

  require(depth > 0 && depth <= 16, s"depth ($depth) must be in 1..16")
  require(width >= 16, s"width ($width) must be >= 16")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_agg takes a pre-hashed BIGINT key (use xxhash64), got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CmsBuf = new CmsBuf(depth, width)

  override def update(buffer: CmsBuf, input: InternalRow): CmsBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long], 1L)
    buffer
  }

  override def merge(buffer: CmsBuf, other: CmsBuf): CmsBuf = {
    buffer.addIn(other); buffer
  }

  override def eval(buffer: CmsBuf): Any = buffer.toBytes

  override def serialize(buffer: CmsBuf): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): CmsBuf = {
    val s = new CmsBuf(depth, width)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().get(s.counts)
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "cms_agg"
}

/** `cms_estimate(sketch, hash64, depth)` — point-query a [[CmsAgg]]
  * binary (broadcast as a plan literal, the Bloom pattern): min over
  * the depth row counters. Width is derived from the binary length.
  */
case class CmsEstimate(left: Expression, right: Expression, depth: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, bigint), got ${l.sql}, ${r.sql}")
    }

  private def readLong(bytes: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (bytes(off + i) & 0xffL); i -= 1 }
    v
  }

  override def nullSafeEval(s: Any, v: Any): Any = {
    val bytes = s.asInstanceOf[Array[Byte]]
    val x = v.asInstanceOf[Long]
    val width = bytes.length / (8 * depth)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = BloomHash.bitOf(x, r, width.toLong).toInt
      val cnt = readLong(bytes, (r * width + c) * 8)
      if (cnt < best) best = cnt
      r += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, v) => {
      val w = ctx.freshName("w")
      val h2 = ctx.freshName("h2")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val cnt = ctx.freshName("cnt")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      // mirrors BloomHash.mix64 / bitOf and the little-endian layout
      s"""
         |int $w = $s.length / (8 * $depth);
         |long $h2 = $v;
         |$h2 ^= $h2 >>> 33; $h2 *= 0xff51afd7ed558ccdL;
         |$h2 ^= $h2 >>> 33; $h2 *= 0xc4ceb9fe1a85ec53L;
         |$h2 ^= $h2 >>> 33; $h2 |= 1L;
         |long $best = Long.MAX_VALUE;
         |for (int $r = 0; $r < $depth; $r++) {
         |  int $c = (int)((($v + (long) $r * $h2) & Long.MAX_VALUE) % (long) $w);
         |  int $off = ($r * $w + $c) * 8;
         |  long $cnt = 0L;
         |  for (int $j = 7; $j >= 0; $j--) {
         |    $cnt = ($cnt << 8) | ($s[$off + $j] & 0xffL);
         |  }
         |  if ($cnt < $best) $best = $cnt;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

/** KMV (k-minimum-values / bottom-k theta) buffer: the k smallest
  * DISTINCT hash values seen so far. Set semantics fall out for free
  * (duplicates collapse in the tree), merge is union-with-cap, and —
  * unlike HLL — two sketches support INTERSECTION estimates: with a
  * shared hash function, the bottom-k of the union is a uniform sample
  * of the union, so |{x ∈ A∩B : x ≤ θ}| / k estimates the Jaccard
  * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD'07; the DataSketches theta family).
  *
  * Deterministic by construction: the result depends only on the SET
  * of input hashes, never on partitioning or arrival order — so with a
  * portable hash (md5-derived) the whole sketch replays bit-identical
  * in another engine, giving these estimates an EXACT oracle.
  */
final class KmvBuf(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.remove(set.last()); () }
    }
  }
  def mergeIn(o: KmvBuf): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
  }
  /** ascending array of the ≤ k retained values */
  def toArray: Array[Long] = {
    val arr = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }
}

/** `kmv_agg(hash64, k)` — bottom-k distinct-value sketch over a
  * pre-hashed BIGINT column; returns the k smallest distinct hashes as
  * a sorted ARRAY<BIGINT> (8k bytes max, independent of cardinality).
  *
  * The 100 TB shape: per-group distinct statistics and CROSS-GROUP set
  * overlap (vocabulary intersection between sources, train/eval
  * contamination mass, snapshot churn) from one pass — only k-value
  * sketches cross the shuffle, never the value universe, and sketches
  * from different days/shards merge losslessly (union-with-cap). HLL
  * (q68/q110) gives cheaper distinct counts but cannot intersect;
  * KMV is the member of the sketch family that does sets.
  */
case class KmvAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  require(k > 0 && k <= 65536, s"k ($k) must be in 1..65536")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg takes a pre-hashed BIGINT key, got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(buffer: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuf, other: KmvBuf): KmvBuf = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: KmvBuf): Any = new GenericArrayData(buffer.toArray)

  override def serialize(buffer: KmvBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new KmvBuf(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { s.set.add(in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kmv_agg"
}

/** Mergeable quantile digest — Dunning's merging t-digest (Dunning &
  * Ertl, "Computing Extremely Accurate Quantiles Using t-Digests",
  * 2019), the one sketch family missing from the HLL/CMS/KMV/MG set:
  * bounded-memory rank/quantile summaries whose partial states merge
  * associatively-enough for partial aggregation (merge = concatenate
  * centroids + recompress; accuracy degrades gracefully, never
  * catastrophically — the "mergeable summaries" regime, PODS'12).
  *
  * The k1 scale function k(q) = δ/(2π)·asin(2q−1) caps each
  * centroid's q-span so rank error is O(q(1−q)·N/δ) — tightest at the
  * tails (where quantile queries matter) and ≤ ~N/(2δ) at the median.
  * Exact observed min/max are tracked separately so q→0/1 never
  * extrapolates.
  *
  * 100 TB shape: each task folds its partition into ≤ ~2δ centroids
  * in O(1) memory; only (mean, weight) pairs — ~3 KB at δ=100 — cross
  * the shuffle. The alternative exact quantile is a full sort of the
  * column. Estimates are NOT cross-engine bit-stable (interpolation
  * over merge-order-dependent centroids), so the oracle checks rank
  * brackets, not values: the exact rank of each estimate must sit
  * within tolerance of q·N (q166's containment oracle).
  */
final class TDigestBuf(val compression: Int) {
  private val capacity = compression * 4 + 8
  var means = new Array[Double](capacity)
  var weights = new Array[Double](capacity)
  var used = 0          // merged prefix is sorted; suffix is raw buffer
  var sortedPrefix = 0
  var total = 0.0
  var min = Double.PositiveInfinity
  var max = Double.NegativeInfinity

  def add(x: Double, w: Double): Unit = {
    if (used == capacity) compress()
    means(used) = x; weights(used) = w; used += 1
    total += w
    if (x < min) min = x
    if (x > max) max = x
  }

  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** Sort all live centroids by mean and greedily re-merge under the
    * k1 size bound. Deterministic for a given centroid multiset. */
  def compress(): Unit = {
    if (used == 0) return
    // sort (mean, weight) pairs by mean, ties by weight — stable result
    val idx = (0 until used).sortBy(i => (means(i), weights(i)))
    val m = idx.map(means).toArray
    val w = idx.map(weights).toArray
    var outN = 0
    var curMean = m(0); var curW = w(0)
    var wSoFar = 0.0
    var i = 1
    while (i < used) {
      val proposedW = curW + w(i)
      val qRight = (wSoFar + proposedW) / total
      val qLeft = wSoFar / total
      if (kScale(qRight) - kScale(qLeft) <= 1.0) {
        // merge into current centroid (weighted mean)
        curMean = (curMean * curW + m(i) * w(i)) / proposedW
        curW = proposedW
      } else {
        means(outN) = curMean; weights(outN) = curW; outN += 1
        wSoFar += curW
        curMean = m(i); curW = w(i)
      }
      i += 1
    }
    means(outN) = curMean; weights(outN) = curW; outN += 1
    used = outN
    sortedPrefix = outN
  }

  def mergeIn(other: TDigestBuf): Unit = {
    var i = 0
    while (i < other.used) { add(other.means(i), other.weights(i)); i += 1 }
    if (other.total > 0) {
      if (other.min < min) min = other.min
      if (other.max > max) max = other.max
    }
  }

  /** Midpoint-interpolated quantile estimate, clamped to [min, max]. */
  def quantile(q: Double): Double = {
    compress()
    if (used == 0) return Double.NaN
    if (used == 1) return means(0)
    val target = q * total
    // cumulative midpoint positions: c_i = sum_{k<i} w_k + w_i/2
    var cumPrev = weights(0) / 2.0
    if (target <= cumPrev) {
      // interpolate between observed min (rank 0) and first midpoint
      val f = target / cumPrev
      return math.max(min, math.min(max, min + f * (means(0) - min)))
    }
    var acc = 0.0
    var i = 0
    while (i < used - 1) {
      val cI = acc + weights(i) / 2.0
      val cNext = acc + weights(i) + weights(i + 1) / 2.0
      if (target <= cNext) {
        val f = (target - cI) / (cNext - cI)
        return means(i) + f * (means(i + 1) - means(i))
      }
      acc += weights(i)
      i += 1
    }
    val cLast = acc + weights(used - 1) / 2.0
    val f = math.min(1.0, (target - cLast) / math.max(total - cLast, 1e-300))
    math.max(min, math.min(max, means(used - 1) + f * (max - means(used - 1))))
  }

  /** Compressed wire form (shared by every t-digest aggregate so
    * sketch TABLES built by one aggregate deserialize in another). */
  def toBytes: Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(8 * 3 + 4 + 16 * used)
    bb.putDouble(total); bb.putDouble(min); bb.putDouble(max)
    bb.putInt(used)
    var i = 0
    while (i < used) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigestBuf {
  def fromBytes(compression: Int, bytes: Array[Byte]): TDigestBuf = {
    require(bytes.length >= 28,
      s"t-digest blob truncated: ${bytes.length} bytes < 28-byte header")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new TDigestBuf(compression)
    val total = bb.getDouble(); val mn = bb.getDouble(); val mx = bb.getDouble()
    val n = bb.getInt()
    // a sketch serialized under a LARGER compression can carry more
    // centroids than this merger's capacity — fail with the mismatch
    // named instead of an opaque ArrayIndexOutOfBounds (mirrors
    // BloomUnionAgg's length-vs-numBits require)
    require(n >= 0 && n <= compression * 4 + 8,
      s"t-digest blob holds $n centroids > capacity ${compression * 4 + 8} " +
        s"for compression=$compression: was it serialized with a larger " +
        "compression parameter than the merging aggregate's?")
    require(bytes.length >= 28 + 16 * n,
      s"t-digest blob truncated: ${bytes.length} bytes < ${28 + 16 * n} " +
        s"needed for $n centroids")
    var i = 0
    while (i < n) {
      val m = bb.getDouble(); val w = bb.getDouble()
      s.means(i) = m; s.weights(i) = w; i += 1
    }
    s.used = n; s.sortedPrefix = n; s.total = total; s.min = mn; s.max = mx
    s
  }
}

/** `tdigest_quantiles(x, compression, qs)` — native mergeable quantile
  * aggregate returning `array<struct<q: double, est: double>>`. */
case class TDigestQuantiles(child: Expression, compression: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] {

  require(compression >= 10, s"compression ($compression) too small")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantiles requires a numeric column, got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", DoubleType, nullable = false),
    StructField("est", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buffer: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case other => other.asInstanceOf[Number].doubleValue()
      }
      buffer.add(x, 1.0)
    }
    buffer
  }

  override def merge(buffer: TDigestBuf, other: TDigestBuf): TDigestBuf = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TDigestBuf): Any =
    new GenericArrayData(qs.map { q =>
      new GenericInternalRow(Array[Any](q, buffer.quantile(q)))
    }.toArray[Any])

  override def serialize(buffer: TDigestBuf): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.fromBytes(compression, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_quantiles"
}

/** `tdigest_agg(x, compression)` — build a t-digest and emit it as
  * BINARY: the sketch-TABLE builder (q110's HLL-table pattern for the
  * rank/quantile family). Per-snapshot digests persist as ordinary
  * columns and later merge LOSSLESSLY-IN-SKETCH-SPACE via
  * [[TDigestMergeQuantiles]] — incremental quantile monitoring
  * without rescanning history. ~3 KB per group at δ=100.
  */
case class TDigestAgg(child: Expression, compression: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] {

  require(compression >= 10, s"compression ($compression) too small")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tdigest_agg requires a numeric column, got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buffer: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].doubleValue(), 1.0)
    buffer
  }

  override def merge(buffer: TDigestBuf, other: TDigestBuf): TDigestBuf = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TDigestBuf): Any = buffer.toBytes

  override def serialize(buffer: TDigestBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.fromBytes(compression, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_agg"
}

/** `tdigest_merge_quantiles(sketch, compression, qs)` — union-merge a
  * column of serialized t-digests ([[TDigestAgg]] output) and evaluate
  * quantiles of the COMBINED distribution: the quantile twin of
  * `hll_union_agg` (q110). Only sketch bytes cross the shuffle; the
  * underlying value streams are never revisited.
  */
case class TDigestMergeQuantiles(child: Expression, compression: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] {

  require(compression >= 10, s"compression ($compression) too small")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge_quantiles requires a binary sketch column, got ${t.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", DoubleType, nullable = false),
    StructField("est", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buffer: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeIn(TDigestBuf.fromBytes(compression, v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: TDigestBuf, other: TDigestBuf): TDigestBuf = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TDigestBuf): Any =
    new GenericArrayData(qs.map { q =>
      new GenericInternalRow(Array[Any](q, buffer.quantile(q)))
    }.toArray[Any])

  override def serialize(buffer: TDigestBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.fromBytes(compression, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_merge_quantiles"
}

object SketchFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def space_saving_topk(key: Column, k: Int, capacity: Int): Column =
    column(SpaceSavingTopK(expression(key), k, capacity).toAggregateExpression())

  def bloom_agg(hash64: Column, numBits: Int, numHashes: Int): Column =
    column(BloomAgg(expression(hash64), numBits, numHashes).toAggregateExpression())

  def bloom_might_contain(filter: Column, hash64: Column, numHashes: Int): Column =
    column(BloomMightContain(expression(filter), expression(hash64), numHashes))

  def bloom_union_agg(sketch: Column, numBits: Int): Column =
    column(BloomUnionAgg(expression(sketch), numBits).toAggregateExpression())

  def cms_agg(hash64: Column, depth: Int, width: Int): Column =
    column(CmsAgg(expression(hash64), depth, width).toAggregateExpression())

  def cms_estimate(sketch: Column, hash64: Column, depth: Int): Column =
    column(CmsEstimate(expression(sketch), expression(hash64), depth))

  def kmv_agg(hash64: Column, k: Int): Column =
    column(KmvAgg(expression(hash64), k).toAggregateExpression())

  def tdigest_quantiles(x: Column, compression: Int, qs: Seq[Double]): Column =
    column(TDigestQuantiles(expression(x), compression, qs).toAggregateExpression())

  def tdigest_agg(x: Column, compression: Int): Column =
    column(TDigestAgg(expression(x), compression).toAggregateExpression())

  def tdigest_merge_quantiles(sketch: Column, compression: Int,
                              qs: Seq[Double]): Column =
    column(TDigestMergeQuantiles(expression(sketch), compression, qs)
      .toAggregateExpression())
}
