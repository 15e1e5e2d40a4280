package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * `zip_with` + `aggregate` compute a dot product correctly but run as
  * interpreted higher-order functions that allocate an intermediate array
  * per row — at 100 TB (and measurably at sf0.1) that is the ANN/near-dup
  * bottleneck. `DotProduct` generates a tight primitive loop inside
  * whole-stage codegen instead: no allocation, no virtual dispatch.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> children (VectorExprs casts)
  override def dataType: DataType = DoubleType

  // dimension mismatch → null (not a truncated partial product): a corrupt
  // or short embedding must drop out of ranking/filters, never rank with a
  // plausible-looking cosine
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) null
    else {
      var s = 0.0
      var k = 0
      while (k < n) { s += x.getDouble(k) * y.getDouble(k); k += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $s += $a.getDouble($k) * $b.getDouble($k);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** out = M·x for a LITERAL row-major matrix M (the OPQ rotation hot
  * path). A 64×64 rotation expressed as 4096 `lit(m)·element_at(x,k)`
  * terms blows the plan to megabytes, falls out of whole-stage codegen,
  * and runs interpreted (measured ~7 s extra on the sf0.1 OPQ encode);
  * this generates one tight two-level primitive loop over a referenced
  * double[] instead — same shape as [[DotProduct]], a matrix high.
  * Dimension mismatch → null (the DotProduct contract: corrupt vectors
  * drop out, never encode as a plausible code). */
case class MatVec(child: Expression, matrix: Array[Double], rows: Int, cols: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(matrix.length == rows * cols, "matrix shape mismatch")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != cols) null
    else {
      val out = new Array[Double](rows)
      var i = 0
      while (i < rows) {
        var s = 0.0
        var k = 0
        val off = i * cols
        while (k < cols) { s += matrix(off + k) * x.getDouble(k); k += 1 }
        out(i) = s
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |if ($a.numElements() != $cols) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$rows];
         |  for (int $i = 0; $i < $rows; $i++) {
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $cols; $k++) {
         |      $s += $m[$i * $cols + $k] * $a.getDouble($k);
         |    }
         |    $out[$i] = $s;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExprs {

  private def asDoubleArray(c: Column): Column = c.cast("array<double>")

  /** dot(a, b) over array<double> (casts applied), codegen'd. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(asDoubleArray(a)),
      GraftSqlBridge.expression(asDoubleArray(b))))

  /** L2 norm via self-dot. */
  def norm2(a: Column): Column = {
    val ad = asDoubleArray(a)
    org.apache.spark.sql.functions.sqrt(dot(ad, ad))
  }

  /** M·x for a literal matrix (rows of m), codegen'd. */
  def matVec(x: Column, m: Array[Array[Double]]): Column =
    GraftSqlBridge.column(MatVec(
      GraftSqlBridge.expression(asDoubleArray(x)),
      m.flatten, m.length, m(0).length))
}
