package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-row text statistics kernel for [[TextStats]]: ONE scan
  * computes every count the quality/repetition/stats signals need, so the
  * curation pipeline's per-row cost drops from {split + 2×array_distinct +
  * arrays_zip + 2 slices + 2 regexp_replace} — each allocating arrays or
  * re-scanning the text — to one call (sf1 probe: text_repetition was the
  * heaviest remaining per-row signal at 5.8 s).
  *
  * Field semantics replicate the SQL forms EXACTLY (differential spec):
  *  - n_tok   = `size(split(trim(t), "\s+"))`: SQL trim strips ASCII
  *              SPACES only; Java split with limit −1 keeps a leading
  *              empty token when the string starts with non-space
  *              whitespace and a trailing empty when it ends with any
  *              whitespace; "" yields [""] (n_tok = 1). Java's default
  *              `\s` is ASCII `[ \t\n\x0B\f\r]`.
  *  - d_tok   = `size(array_distinct(toks))` — exact string distinctness
  *              (a real HashSet, not hashes: a 64-bit-hash shortcut would
  *              silently merge colliding tokens at corpus scale).
  *  - d_big   = distinct adjacent-token pairs (the `arrays_zip` of the two
  *              shifted `slice`s); pairs joined with '\n', which cannot
  *              occur inside a token (it is a separator).
  *  - n_nonws = `length(regexp_replace(t, "\s", ""))` = code points not in
  *              ASCII whitespace.
  *  - n_punct = `length(regexp_replace(t, "[^.,!?;:]", ""))` = code points
  *              in the punctuation set.
  *  - n_chars = `length(t)` = code points (surrogate pairs count once).
  */
object TextStatsUtil {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':'

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    // SQL trim: ASCII spaces only (NOT the \s set)
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1

    var nNonWs = 0
    var nPunct = 0
    var nChars = 0
    var i = 0
    val len = s.length
    while (i < len) { // full (untrimmed) string for the char-class counts
      val c = s.charAt(i)
      if (!Character.isLowSurrogate(c)) nChars += 1 // code points, not UTF-16 units
      if (!isWs(c)) { if (!Character.isLowSurrogate(c)) nNonWs += 1 }
      if (isPunct(c)) nPunct += 1
      i += 1
    }

    // tokenize the TRIMMED span with Pattern.split(-1) semantics
    val toks = new java.util.HashSet[String]()
    val bigrams = new java.util.HashSet[String]()
    var nTok = 0
    var prev: String = null
    def emit(tok: String): Unit = {
      nTok += 1
      toks.add(tok)
      if (prev != null) bigrams.add(prev + "\n" + tok)
      prev = tok
    }
    if (start == end) emit("") // empty input → one empty token
    else {
      var p = start
      if (isWs(s.charAt(p))) emit("") // leading separator → leading empty
      while (p < end) {
        while (p < end && isWs(s.charAt(p))) p += 1
        if (p < end) {
          val t0 = p
          while (p < end && !isWs(s.charAt(p))) p += 1
          emit(s.substring(t0, p))
        } else emit("") // trailing separator run → trailing empty (limit −1)
      }
    }
    new GenericInternalRow(Array[Any](
      nTok, toks.size(), bigrams.size(), nNonWs, nPunct, nChars))
  }
}

/** All per-row text statistics as ONE native struct expression (see
  * [[TextStatsUtil]]); `doGenCode` emits a single static call so every
  * downstream signal reads fields of one in-register struct. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema

  override protected def nullSafeEval(input: Any): Any =
    TextStatsUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsUtil.stats($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("d_tok", IntegerType, nullable = false),
    StructField("d_big", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  def stats(c: Column): Column =
    GraftSqlBridge.column(TextStats(GraftSqlBridge.expression(c.cast("string"))))
}
