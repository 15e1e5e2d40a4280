package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe for a Count-Min sketch built by Spark's built-in
  * `count_min_sketch` aggregate (whose serialized bytes are otherwise
  * write-only on the SQL surface — there is no estimate function). The
  * sketch argument must be FOLDABLE (a literal / re-entered scalar): it is
  * deserialized ONCE per executor into an expression-instance field and
  * every row probes that object — the same pattern as Spark's own
  * BloomFilterMightContain, and the reason the probe can sit in the
  * PRE-SHUFFLE hot path (see [[graft.ops.TextOps.heavyHitters]]).
  *
  * Byte compatibility: CountMinSketchAgg updates StringType children via
  * `addBinary(utf8.getBytes)`, so the probe hashes `UTF8String.getBytes`
  * for strings and the boxed long for BIGINT children — bit-identical to
  * what the aggregate inserted. Estimates are upper bounds by
  * construction (estimate ≥ true count, w.h.p. within ε·N above), the
  * property the two-pass exact heavy-hitter pipeline relies on.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (sketch.dataType != BinaryType)
      TypeCheckFailure(s"sketch must be BINARY, got ${sketch.dataType}")
    else if (!sketch.foldable)
      TypeCheckFailure("sketch must be a foldable literal")
    else if (item.dataType != StringType && item.dataType != LongType)
      TypeCheckFailure(s"item must be STRING or BIGINT, got ${item.dataType}")
    else TypeCheckSuccess
  }

  @transient private lazy val cms: CountMinSketch = {
    val bytes = sketch.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(s: Any, i: Any): Any = i match {
    case u: UTF8String => cms.estimateCount(u.getBytes)
    case l: java.lang.Long => cms.estimateCount(l)
    case other => cms.estimateCount(other)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    val itemGen = item.genCode(ctx)
    val probe = item.dataType match {
      case StringType => s"$cmsRef.estimateCount(${itemGen.value}.getBytes())"
      case _ => s"$cmsRef.estimateCount((Object)(Long)${itemGen.value})"
    }
    // a null foldable sketch (e.g. count_min_sketch over zero rows) must
    // yield null like the interpreted BinaryExpression path — without the
    // guard the generated code probes a null reference and NPEs
    ev.copy(code =
      code"""
        ${itemGen.code}
        boolean ${ev.isNull} = ($cmsRef == null) || ${itemGen.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) { ${ev.value} = $probe; }
      """)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(sketch = l, item = r)
}

object CmsEstimate {
  import org.apache.spark.sql.{Column, GraftSqlBridge}
  /** `estimate(sketchBytes, col)` — probe as a Column. */
  def estimate(sketchBytes: Array[Byte], item: Column): Column =
    GraftSqlBridge.column(CmsEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal(sketchBytes, BinaryType),
      GraftSqlBridge.expression(item)))
}
