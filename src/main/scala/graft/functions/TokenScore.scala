package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** X15: literal-model token scoring kernels for the serving stream
  * family — the fourth occurrence of the X13/DsirScore/X14 finding: a
  * per-record `aggregate(toks, ...)(element_at(literal_map, t))` lambda
  * chain is CodegenFallback, evaluating every token through interpreted
  * HOF plumbing (measured 92 s stream_classify / 86 s stream_ppl_filter
  * at the sf10 gate). Each kernel makes ONE token walk per record with
  * one HashMap probe per token (per model), inside whole-stage codegen.
  *
  * Tokenization is the exact column-twin: split(trim(text), "\s+") with
  * Spark's space-only trim and Java limit -1 split
  * ([[FingerprintUtil.wsSplit]]); the EMPTY token of a blank document
  * probes the maps like any other (the aggregate form did too). */
object TokenScoreUtil {
  private def toks(text: UTF8String): Array[String] = {
    var s = text.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    FingerprintUtil.wsSplit(s.substring(start, end))
  }

  /** [Σ model(t) over HITS, hit count] — the ppl-filter pair (misses
    * contribute 0 to the sum and 0 to the count), as one 2-long array. */
  def nllSumCount(text: UTF8String,
                  model: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val ts = toks(text)
    var s = 0L
    var n = 0L
    var i = 0
    while (i < ts.length) {
      val v = model.get(ts(i))
      if (v != null) { s += v.longValue(); n += 1 }
      i += 1
    }
    new GenericArrayData(Array(s, n))
  }

  /** Per-model Σ_tok model_i.getOrElse(tok, fallback_i) — the NB cost
    * sums (priors are added by the caller), one walk for ALL models. */
  def nbCosts(text: UTF8String,
              models: Array[java.util.HashMap[String, java.lang.Long]],
              fallbacks: Array[Long]): ArrayData = {
    val ts = toks(text)
    val acc = new Array[Long](models.length)
    var i = 0
    while (i < ts.length) {
      var m = 0
      while (m < models.length) {
        val v = models(m).get(ts(i))
        acc(m) += (if (v != null) v.longValue() else fallbacks(m))
        m += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

/** [[TokenScoreUtil.nllSumCount]] as a native expression → array<long>
  * of [sum, hits]. */
case class NllSumCount(child: Expression,
                       model: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenScoreUtil.nllSumCount(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("model", model, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScoreUtil.nllSumCount($c, $m)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TokenScoreUtil.nbCosts]] as a native expression → array<long> of
  * per-model cost sums (model order = constructor order). */
case class NbCosts(child: Expression,
                   models: Array[java.util.HashMap[String, java.lang.Long]],
                   fallbacks: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenScoreUtil.nbCosts(input.asInstanceOf[UTF8String], models, fallbacks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("models", models, "java.util.HashMap[]")
    val f = ctx.addReferenceObj("fallbacks", fallbacks, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScoreUtil.nbCosts($c, $m, $f)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenScore {
  private def jmap(m: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long](m.size * 2)
    m.foreach { case (k, v) => h.put(k, java.lang.Long.valueOf(v)) }
    h
  }

  /** `[Σ model(tok) over hits, hit count]` for the ppl-filter shape. */
  def nllSumCount(c: Column, model: Map[String, Long]): Column =
    GraftSqlBridge.column(NllSumCount(
      GraftSqlBridge.expression(c.cast("string")), jmap(model)))

  /** Per-model cost sums (without priors), model order preserved. */
  def nbCosts(c: Column, models: Seq[Map[String, Long]],
              fallbacks: Seq[Long]): Column =
    GraftSqlBridge.column(NbCosts(
      GraftSqlBridge.expression(c.cast("string")),
      models.map(jmap).toArray, fallbacks.toArray))
}
