package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StructField, StructType}

/** Exact integer bivariate moments in ONE pass with primitive 128-bit
  * accumulators: (n, Σx, Σy, Σxy, Σx², Σy²) over cent-scaled longs.
  *
  * The decimal(38,0) `sum` form this replaces is exact but pays a Decimal
  * allocation + scale-check per row per sum — six of them (q29 was the
  * slowest non-staging relational query in the sf1 probe at 9.4 s). Here
  * each product is one long multiply (cent-scaled inputs bound every
  * product under 2^63) and each accumulation a two-long add-with-carry;
  * the buffer is 13 primitive longs, map-side combinable, and only the
  * seven final groups ever touch BigInteger/Decimal. Values are
  * bit-identical to the decimal form (differential spec) because signed
  * 128-bit accumulation is exact — no rounding exists anywhere.
  *
  * At 100 TB: Σy² grows ~1e14 per row, overflowing a plain long around
  * 9e4 rows — the 128-bit pair holds ~1.7e24 rows per group. Inputs
  * `x`, `y` must be cent-scaled longs small enough that x·y fits a long
  * (|x|,|y| < 3e9), which cent-scaled money satisfies by construction.
  */
case class ExactMomentsAgg(
    xExpr: Expression,
    yExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = xExpr :: yExpr :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ExactMomentsAgg.schema

  // buffer layout: [n, sxHi, sxLo, syHi, syLo, sxyHi, sxyLo,
  //                 sxxHi, sxxLo, syyHi, syyLo] (hi = signed high 64)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](11)

  /** 128-bit += signed 64-bit value at buffer slots (hiIdx, hiIdx+1). */
  private def add128(buf: Array[Long], hiIdx: Int, v: Long): Unit = {
    val lo = buf(hiIdx + 1)
    val newLo = lo + v
    // unsigned carry out of the low word
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    buf(hiIdx) += (v >> 63) + carry // v sign-extends into the high word
    buf(hiIdx + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = xExpr.eval(input)
    val yv = yExpr.eval(input)
    if (xv != null && yv != null) {
      val x = xv.asInstanceOf[Long]
      val y = yv.asInstanceOf[Long]
      // 3037000499 = floor(sqrt(Long.Max)): beyond it a product would
      // silently wrap — corrupt statistics must be impossible, so fail
      // fast (the astype rule); cent-scaled money is ~1e7 at most
      if (math.abs(x) > 3037000499L || math.abs(y) > 3037000499L)
        throw new IllegalArgumentException(
          s"ExactMomentsAgg input ($x, $y) exceeds the exact-product range ±3037000499")
      buf(0) += 1
      add128(buf, 1, x)
      add128(buf, 3, y)
      add128(buf, 5, x * y)
      add128(buf, 7, x * x)
      add128(buf, 9, y * y)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    a(0) += b(0)
    var s = 1
    while (s < 11) {
      // add b's 128-bit value into a: low first (carry), then high
      val lo = a(s + 1)
      val newLo = lo + b(s + 1)
      val carry = ((lo & b(s + 1)) | ((lo | b(s + 1)) & ~newLo)) >>> 63
      a(s) += b(s) + carry
      a(s + 1) = newLo
      s += 2
    }
    a
  }

  private def toDecimal(hi: Long, lo: Long): Decimal = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(1, ByteBuffer.allocate(8).putLong(lo).array()))
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  override def eval(buf: Array[Long]): Any =
    new GenericInternalRow(Array[Any](
      Decimal(buf(0), 38, 0),
      toDecimal(buf(1), buf(2)), toDecimal(buf(3), buf(4)),
      toDecimal(buf(5), buf(6)), toDecimal(buf(7), buf(8)),
      toDecimal(buf(9), buf(10))))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(88)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(11)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): ExactMomentsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ExactMomentsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(xExpr = c(0), yExpr = c(1))
}

object ExactMomentsAgg {
  val schema: StructType = StructType(Seq(
    StructField("n", DecimalType(38, 0), nullable = false),
    StructField("sx", DecimalType(38, 0), nullable = false),
    StructField("sy", DecimalType(38, 0), nullable = false),
    StructField("sxy", DecimalType(38, 0), nullable = false),
    StructField("sxx", DecimalType(38, 0), nullable = false),
    StructField("syy", DecimalType(38, 0), nullable = false)))

  /** moments(x, y) over cent-scaled long columns as an aggregate Column. */
  def moments(x: Column, y: Column): Column =
    GraftSqlBridge.column(
      ExactMomentsAgg(GraftSqlBridge.expression(x.cast("long")),
        GraftSqlBridge.expression(y.cast("long"))).toAggregateExpression())
}
