package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
