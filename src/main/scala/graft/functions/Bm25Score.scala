package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** X14: the whole per-document Okapi BM25 micro-nat score against a
  * fixed literal term model in ONE static codegen'd call — the serving
  * hot path of S24/S25. The HOF form this replaces (one
  * `size(filter(_toks, _ === term))` per query term) is CodegenFallback:
  * each of the 8 filters re-walks the token array interpreted AND
  * allocates the filtered array — per-record cost measured in the tens
  * of milliseconds at the sf10 gate (the DsirScore/X13 finding, third
  * occurrence). Here the token walk happens once, tf counting is |terms|
  * string compares per token, and each hit term costs one BigInteger
  * multiply+divide.
  *
  * Semantics are the EXACT twin of the batch scorer
  * ([[graft.ops.Similarity.bm25KwPoolDf]]'s arithmetic) and of the HOF
  * column form it replaces:
  *  - tokens = split(trim(text), "\s+") with Spark's space-only trim and
  *    Java limit -1 split ([[FingerprintUtil.wsSplit]] — the
  *    differential-tested tokenizer twin), doc length = token count
  *    ('' → [''] → 1);
  *  - tf_t = exact-equality count (terms are distinct, so a token
  *    matches at most one);
  *  - score = Σ_t floor(A_t·tf_t / (20·tl·tf_t + 6·tl + 18·n·len)) with
  *    A_t = idf_micro_t·44·tl precomputed driver-side as BigInteger, the
  *    whole term evaluated in BigInteger (at real corpus scale both
  *    A_t·tf and 20·tl·tf exceed Long — the same reason the batch side
  *    computes in decimal(38,0)). All values positive, so BigInteger
  *    divide (truncation) IS the batch floor division. */
object Bm25ScoreUtil {
  def score(text: UTF8String, terms: Array[String],
            aNum: Array[java.math.BigInteger],
            d1: Long, d2: Long, d3: Long): Long = {
    var s = text.toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    s = s.substring(start, end)
    val toks = FingerprintUtil.wsSplit(s)
    val len = toks.length.toLong
    val tf = new Array[Long](terms.length)
    var i = 0
    while (i < toks.length) {
      var j = 0
      while (j < terms.length) {
        if (terms(j) == toks(i)) { tf(j) += 1; j = terms.length }
        else j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < terms.length) {
      if (tf(j) > 0) {
        // full BigInteger term: at real corpus scale both A_t·tf AND
        // 20·tl·tf can exceed Long (the reason the batch side computes
        // in decimal(38,0)); ≤ |terms| hit terms per doc, so the few
        // allocations are off any hot loop
        val den = java.math.BigInteger.valueOf(d1)
          .multiply(java.math.BigInteger.valueOf(tf(j)))
          .add(java.math.BigInteger.valueOf(d2))
          .add(java.math.BigInteger.valueOf(d3)
            .multiply(java.math.BigInteger.valueOf(len)))
        acc += aNum(j)
          .multiply(java.math.BigInteger.valueOf(tf(j)))
          .divide(den)
          .longValueExact()
      }
      j += 1
    }
    acc
  }
}

/** [[Bm25ScoreUtil.score]] as a native unary expression; the term list
  * and per-term numerators ride along as reference objects (model-sized:
  * |terms| entries). */
case class Bm25Score(child: Expression, terms: Array[String],
                     aNum: Array[java.math.BigInteger],
                     d1: Long, d2: Long, d3: Long) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Bm25ScoreUtil.score(input.asInstanceOf[UTF8String], terms, aNum, d1, d2, d3)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("terms", terms, "java.lang.String[]")
    val a = ctx.addReferenceObj("aNum", aNum, "java.math.BigInteger[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bm25ScoreUtil.score($c, $t, $a, ${d1}L, ${d2}L, ${d3}L)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Bm25Score {
  /** `score(text)` under the collected BM25 model (terms present in the
    * corpus, their idf micro-nats, corpus doc count n and total token
    * length tl). NULL text scores 0L (the DsirScore rule: the batch
    * aggregate scores an absent document 0, a null-propagating kernel
    * would diverge). Denominator-fits-Long is asserted here, once. */
  def score(c: Column, present: Seq[String], idf: Map[String, Long],
            n: Long, tl: Long): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    require(tl >= 0 && n >= 0, s"BM25 model scalars must be non-negative")
    val terms = present.toArray
    val aNum = terms.map(t => (BigInt(idf(t)) * 44 * BigInt(tl)).bigInteger)
    coalesce(
      GraftSqlBridge.column(Bm25Score(
        GraftSqlBridge.expression(c.cast("string")),
        terms, aNum, 20L * tl, 6L * tl, 18L * n)),
      lit(0L))
  }
}
