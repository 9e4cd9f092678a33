package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-hashing kernels: per-document shingle sets,
  * MinHash signatures, LSH band signatures and SimHash — each a
  * map-only expression over the text column, so dedup signature
  * generation needs ZERO shuffles (the previous formulation exploded
  * tokens through a window + hash-aggregate: 2 shuffles of every
  * (doc, token) pair before the first candidate appears).
  *
  * Hash parity: token/shingle hashes are XXH64 over the gram's UTF-8
  * bytes with Spark's seed (42) — bit-identical to
  * `xxhash64(concat_ws(" ", tokens...))` — so the oracled consumers
  * (q33/q55 n-gram Jaccard, SimHash planted-dup specs) produce the
  * same values as the exploded formulation they replace.
  * Tokenization mirrors `split(trim(text), "\\s+")` exactly
  * (space-only trim, Java regex split with limit -1).
  *
  * The expressions emit a single static call from generated code
  * (the RegExpReplace pattern) — whole-stage codegen is never broken,
  * and the kernel is a tight JVM loop, not an interpreted HOF tree.
  */
object TextHash {

  private val ws = Pattern.compile("\\s+")

  /** `split(trim(text), "\\s+")` exactly: trim spaces (0x20 only, as
    * Spark's trim does), then Java regex split with limit -1. */
  def tokens(text: UTF8String): Array[String] =
    ws.split(text.trim().toString, -1)

  private def hashUtf8(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  /** Distinct k-word shingle hashes (xxhash64 of the space-joined gram,
    * seed 42). Shorter-than-k docs yield their single truncated gram —
    * the same convention as every consumer's oracle. */
  def shingleHashSet(text: UTF8String, k: Int): ArrayData = {
    val t = tokens(text)
    val nGrams = math.max(t.length - k + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nGrams * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, t.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(t(j))
        j += 1
      }
      seen.add(hashUtf8(sb.toString, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** H-wide MinHash signature: min over shingles of the seed-mixed
    * hash. Mixing matches the exploded formulation's
    * `xxhash64(sh, lit(s))`: fold XXH64 over (sh, s) from seed 42.
    * Duplicates can't change a min, so no distinct pass is needed. */
  def minhashSig(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val sh = shingleHashSet(text, k)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    val n = sh.numElements()
    while (i < n) {
      val h0 = XXH64.hashLong(sh.getLong(i), 42L)
      var s = 0
      while (s < numHashes) {
        val m = XXH64.hashLong(s.toLong, h0)
        if (m < mins(s)) mins(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** B LSH band signatures over the H-wide MinHash signature — the
    * band sig is xxhash64 of the comma-joined decimal mins (parity
    * with the array_join formulation it replaces). */
  def minhashBandSigs(text: UTF8String, k: Int, numHashes: Int, bands: Int): ArrayData = {
    val sig = minhashSig(text, k, numHashes)
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(24 * rowsPerBand)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sig.getLong(b * rowsPerBand + r))
        r += 1
      }
      out(b) = hashUtf8(sb.toString, 42L)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash, identical to the exploded vote-sum formulation:
    * token hash = xxhash64(token) (seed 42); signature bit b is 1 iff
    * strictly more than half the token hashes have bit b set. */
  def simhash64(text: UTF8String): Long = {
    val t = tokens(text)
    val ones = new Array[Int](64)
    var i = 0
    while (i < t.length) {
      val h = hashUtf8(t(i), 42L)
      var b = 0
      while (b < 64) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > t.length) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Base for the string → static-kernel expressions. */
abstract class TextHashExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.sql}")
  }
  /** Java source of the static call on a UTF8String variable. */
  protected def staticCall(childVar: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${staticCall(c)};")
}

case class ShingleHashSet(child: Expression, k: Int) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHash.shingleHashSet(t.asInstanceOf[UTF8String], k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.shingleHashSet($c, $k)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSig(child: Expression, k: Int, numHashes: Int) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHash.minhashSig(t.asInstanceOf[UTF8String], k, numHashes)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.minhashSig($c, $k, $numHashes)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashBandSigs(child: Expression, k: Int, numHashes: Int, bands: Int)
    extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHash.minhashBandSigs(t.asInstanceOf[UTF8String], k, numHashes, bands)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.minhashBandSigs($c, $k, $numHashes, $bands)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash64(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    TextHash.simhash64(t.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash.simhash64($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points. */
object TextHashFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def shingle_hash_set(text: Column, k: Int): Column =
    column(ShingleHashSet(expression(text), k))
  def minhash_sig(text: Column, k: Int, numHashes: Int): Column =
    column(MinHashSig(expression(text), k, numHashes))
  def minhash_band_sigs(text: Column, k: Int, numHashes: Int, bands: Int): Column =
    column(MinHashBandSigs(expression(text), k, numHashes, bands))
  def simhash64(text: Column): Column =
    column(SimHash64(expression(text)))
}
