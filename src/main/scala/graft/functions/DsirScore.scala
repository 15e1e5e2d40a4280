package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[DsirScore]]: tokenize + per-gram md5 bucket +
  * delta-table lookup — the whole DSIR importance weight of one document
  * in ONE static call, so the streaming admission path stays inside
  * whole-stage codegen. The HOF form this replaces (aggregate/zip_with
  * lambdas evaluating Concat+Md5+Conv+Substring per gram, interpreted)
  * measured 236 s at the sf10 gate for the same work; per-gram cost here
  * is one MessageDigest update + one array index.
  *
  * Semantics are the EXACT batch twin of [[graft.ops.Sampling]]'s
  * hashedGrams + model join: tokens = split(trim(text), "\s+") (space-only
  * trim, limit -1 — FingerprintUtil's rule), unigram grams skip the empty
  * token, bigrams join adjacent RAW tokens with chr(1), bucket =
  * md5Hash60(gram) % buckets, absent buckets contribute 0 (the array is
  * dense with zero fill). Every term is an exact BIGINT micro-nat, so the
  * fold order (doc order here, shuffle order in the batch join) cannot
  * matter. */
object DsirScoreUtil {
  def score(text: UTF8String, deltas: Array[Long]): Long = {
    var s = text.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    s = s.substring(start, end)
    val toks = FingerprintUtil.wsSplit(s)
    val b = deltas.length
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        acc += deltas((FingerprintUtil.md5Hash60(toks(i)) % b).toInt)
      if (i + 1 < toks.length)
        acc += deltas((FingerprintUtil.md5Hash60(
          toks(i) + "\u0001" + toks(i + 1)) % b).toInt)
      i += 1
    }
    acc
  }
}

/** DSIR importance weight as a native expression: `doGenCode` emits one
  * static call against a referenced long[] delta table (model-sized —
  * `buckets` entries regardless of corpus size). */
case class DsirScore(child: Expression, deltas: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DsirScoreUtil.score(input.asInstanceOf[UTF8String], deltas)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("deltas", deltas, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirScoreUtil.score($c, $d)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DsirScore {
  /** `score(text)` under a dense bucket→delta table (zero = absent).
    * NULL text scores 0L, not NULL — the oracle's LEFT JOIN + coalesce
    * scores a gram-less document 0, and a null-propagating kernel would
    * silently diverge from it (and from the top-k cut) on null rows. */
  def score(c: Column, deltas: Array[Long]): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(
      GraftSqlBridge.column(DsirScore(GraftSqlBridge.expression(c.cast("string")), deltas)),
      lit(0L))
  }
}
