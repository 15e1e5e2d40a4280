package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.DataType

/** Linear interval-coverage strip for [[graft.ops.Dedup.dupSpanStrip]]:
  * given a doc's token array and the SORTED list of removal span starts
  * (each span covering [s, s+n)), return the tokens NOT covered by any
  * span. A two-pointer walk — token index forward, start pointer forward,
  * carrying the running max cover-end — is O(tokens + starts), replacing
  * the interpreted `filter(toks, exists(_starts, …))` form whose cost is
  * O(tokens × starts) on pathological documents (every gram duplicated).
  * Semantics are EXACTLY the exists() form's: token i survives iff no
  * start s has s ≤ i < s+n (property-tested equal in DedupSpec). */
object SpanStripUtil {
  def strip(toks: ArrayData, starts: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val nStarts = starts.numElements()
    val out = new java.util.ArrayList[AnyRef](len)
    var p = 0
    var coverEnd = -1
    var i = 0
    while (i < len) {
      while (p < nStarts && starts.getInt(p) <= i) {
        val e = starts.getInt(p) + n
        if (e > coverEnd) coverEnd = e
        p += 1
      }
      if (i >= coverEnd) out.add(toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `doGenCode` emits one static call, keeping the strip inside
  * whole-stage codegen (no interpreted lambda per token). */
case class SpanStrip(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = first.dataType

  override protected def nullSafeEval(toks: Any, starts: Any, n: Any): Any =
    SpanStripUtil.strip(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, n) =>
      s"graft.functions.SpanStripUtil.strip($t, $s, $n)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object SpanStrip {
  /** tokens: array<string>; starts: SORTED array<int>; n: span length. */
  def strip(toks: Column, starts: Column, n: Int): Column =
    GraftSqlBridge.column(SpanStrip(
      GraftSqlBridge.expression(toks),
      GraftSqlBridge.expression(starts),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(n))))
}
