package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst aggregate: MinHash signature in ONE pass.
  *
  * Input: one `array<struct<...k string fields>>` of word k-shingles per
  * document row (built with native `slice`+`arrays_zip`, no lambdas).
  * Buffer: `numHashes` running minima (a primitive long array). Each
  * shingle is hashed once by chaining `XXH64.hashUTF8String` over its k
  * tokens, then remixed per hash-function with `XXH64.hashLong(h, k)` —
  * the same primitives Spark's `xxhash64` builds on, deterministic across
  * runs and executors.
  *
  * vs. the compositional form (explode + 32×min(xxhash64)): no explode —
  * the pre-aggregation row count stays at |docs|, not |docs|·|shingles|,
  * and partial aggregation ships exactly `numHashes` longs per doc. At
  * 100 TB the explode multiplies the aggregate's input by average document
  * length (~100×); this aggregate removes that multiplier entirely.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    numTokens: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var e = 0
      val n = arr.numElements()
      while (e < n) {
        val sh = arr.getStruct(e, numTokens)
        var h = 42L
        var f = 0
        while (f < numTokens) {
          h = XXH64.hashUTF8String(sh.getUTF8String(f), h)
          f += 1
        }
        var k = 0
        while (k < numHashes) {
          val mixed = XXH64.hashLong(h, k)
          if (mixed < buf(k)) buf(k) = mixed
          k += 1
        }
        e += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): MinHashAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MinHashAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashAgg {
  /** minhash(shingleStructs, numHashes, k-tokens) as an aggregate Column. */
  def minhash(shingleStructs: Column, numHashes: Int, numTokens: Int): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(shingleStructs), numHashes, numTokens)
        .toAggregateExpression())
}

/** Single-pass per-ROW MinHash signature kernel for [[MinHashSig]].
  *
  * Produces bit-identical signatures to {tokensOf → shingleZip →
  * groupBy(doc).agg([[MinHashAgg]])} (differential spec), but as a SCALAR:
  * no token array, no k `slice`s, no zipped struct array, and — because
  * doc ids are unique — no hash-aggregate Exchange at all; the signature
  * column is computed inside the scan's codegen stage.
  *
  * Zero-copy tokenization: tokens are byte slices [t0, t1) of the doc's
  * own UTF8String (whitespace is ASCII, so slicing is UTF-8-safe), hashed
  * in place with `XXH64.hashUnsafeBytes` — the same bytes+seed chain the
  * aggregate's `hashUTF8String` walk produces. Tokens follow the shared
  * Pattern.split(-1) rule (leading empty on a non-space-whitespace start,
  * trailing empty kept, '' → ['']). A rolling k-window of (offset, len)
  * pairs replaces the shingle structs; each complete window chains its k
  * slices from seed 42, then remixes into all `numHashes` minima. Docs
  * with < k tokens return the all-MaxValue sentinel, as the aggregate's
  * untouched buffer does. */
object MinHashSigUtil {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def signature(text: UTF8String, numHashes: Int, k: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    // SQL trim: ASCII spaces only
    var start = 0
    var end = n
    while (start < end && text.getByte(start) == ' ') start += 1
    while (end > start && text.getByte(end - 1) == ' ') end -= 1

    val winOff = new Array[Int](k)
    val winLen = new Array[Int](k)
    var filled = 0 // tokens seen so far (window holds min(filled, k))
    def emit(t0: Int, len: Int): Unit = {
      val slot = filled % k
      winOff(slot) = t0; winLen(slot) = len
      filled += 1
      if (filled >= k) {
        var h = 42L
        var f = 0
        while (f < k) { // oldest-first = (filled - k) .. (filled - 1)
          val s = (filled - k + f) % k
          h = XXH64.hashUnsafeBytes(base, off + winOff(s), winLen(s), h)
          f += 1
        }
        var kh = 0
        while (kh < numHashes) {
          val mixed = XXH64.hashLong(h, kh)
          if (mixed < sig(kh)) sig(kh) = mixed
          kh += 1
        }
      }
    }
    if (start == end) emit(start, 0) // empty input → one empty token
    else {
      var p = start
      if (isWs(text.getByte(p))) emit(p, 0) // leading separator → leading empty
      while (p < end) {
        while (p < end && isWs(text.getByte(p))) p += 1
        if (p < end) {
          val t0 = p
          while (p < end && !isWs(text.getByte(p))) p += 1
          emit(t0, p - t0)
        } else emit(p, 0) // trailing separator run → trailing empty
      }
    }
    new GenericArrayData(sig)
  }
}

/** MinHash signature as a native scalar expression (see [[MinHashSigUtil]]). */
case class MinHashSig(child: Expression, numHashes: Int, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.signature(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], numHashes, k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigUtil.signature($c, $numHashes, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSig {
  def minhash(text: Column, numHashes: Int, k: Int): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(text.cast("string")), numHashes, k))
}
