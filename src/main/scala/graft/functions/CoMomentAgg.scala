package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom Catalyst aggregate: the PCA column co-moment matrix G[a][b] =
  * Σ_i x_ia·x_ib PLUS the per-column sums, in ONE pass over grouped rows.
  *
  * Input: one `array<struct<j: long, v: double>>` of stored cells per matrix
  * row (built with `collect_list(struct(j, v))` after the single groupBy(i)
  * data shuffle). Buffer: a primitive double array packing the upper
  * triangle of G (a ≤ b, row-major, ncols·(ncols+1)/2 entries) followed by
  * the ncols column sums.
  *
  * vs. the compositional form (explode × explode + groupBy(a,b) + sum):
  * no explode — the pre-aggregation row count stays at |rows|, not
  * |rows|·nnz², and partial aggregation ships exactly ONE buffer per task
  * instead of ncols² (a,b) partials flowing through a hash aggregate with
  * ~100× per-tuple Catalyst overhead over a fused multiply-add. At the
  * scanpy scale (2k highly-variable columns) the explode emits up to 4M
  * generated tuples per matrix row; this aggregate removes that multiplier
  * entirely. The column sums ride in the same buffer, so the separate
  * sums pass over the matrix lineage disappears too.
  */
case class CoMomentAgg(
    child: Expression,
    ncols: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val triLen = ncols * (ncols + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](triLen + ncols)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // snapshot the row's cells once: the pair loop below reads each O(nnz)
      // times and re-decoding UnsafeRow structs there would be quadratic cost
      val js = new Array[Int](n)
      val vs = new Array[Double](n)
      var e = 0
      while (e < n) {
        val cell = arr.getStruct(e, 2)
        val j = cell.getLong(0)
        if (j < 0 || j >= ncols)
          throw new IllegalArgumentException(
            s"CoMomentAgg: column index $j outside [0, $ncols) — ncols does not match the matrix")
        js(e) = j.toInt
        vs(e) = cell.getDouble(1)
        e += 1
      }
      var p = 0
      while (p < n) {
        val jp = js(p)
        val vp = vs(p)
        buf(triLen + jp) += vp
        var q = p
        while (q < n) {
          val a = math.min(jp, js(q))
          val b = math.max(jp, js(q))
          buf(a * ncols - a * (a - 1) / 2 + (b - a)) += vp * vs(q)
          q += 1
        }
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(off: Int): CoMomentAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CoMomentAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object CoMomentAgg {
  /** Packed layout helpers shared with the driver-side unpack in Pca.fit. */
  def triIndex(ncols: Int, a: Int, b: Int): Int =
    a * ncols - a * (a - 1) / 2 + (b - a)
  def triLen(ncols: Int): Int = ncols * (ncols + 1) / 2

  /** comoments(rowCells, ncols) as an aggregate Column over per-row
    * `array<struct<j, v>>` cell lists. */
  def comoments(rowCells: Column, ncols: Int): Column =
    GraftSqlBridge.column(
      CoMomentAgg(GraftSqlBridge.expression(rowCells), ncols).toAggregateExpression())
}
