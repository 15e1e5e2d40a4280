package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID kernel for [[LangIdScore]]: one scan over the
  * UTF-8 BYTES scores every language's stopword hits AND the CJK charset
  * check together — replacing the 33-regex battery (4 langs × 8
  * `regexp_count("\bw\b")` + one CJK class scan) that made `text_langid`
  * the benchmark's most data-proportional query (sf1 probe: 8.3× on 10×
  * data; each regex re-scans the full text).
  *
  * Semantics match the regex form exactly on the marker alphabet: a token
  * is a maximal run of WORD characters under Java's `\b` rule — which,
  * with `\w` left ASCII, is `'_' || Character.isLetterOrDigit(cp)`; i.e.
  * a non-ASCII LETTER extends the run (so "théof" contains no `\bof\b` —
  * the property test caught the naive ASCII-boundary reading), while
  * marks/symbols/emoji break it. Runs containing any non-ASCII word char
  * can never equal the pure-ASCII markers, so they only need poisoning,
  * not accumulation. ASCII chars lowercase bytewise; token equality then
  * equals `\bword\b` match count. CJK dominance is the same `[一-鿿]`
  * test on the decoded code point. Known divergence from `lower()`+regex:
  * the handful of code points whose Unicode lowercase maps INTO ASCII
  * (U+0130, U+212A, U+017F) could form a marker under the old form only —
  * impossible on the marker languages' real text, and the differential +
  * property specs pin equality on testdata and adversarial strings.
  *
  * Tie-break replicates the `greatest((score, −index))` rule: earliest
  * listed language wins ties; score 0 and no CJK → "und".
  */
object LangIdUtil {
  private val markers = graft.ops.TextOps.langMarkers
  private val nLangs = markers.length
  private val maxLen = markers.flatMap(_._2).map(_.length).max

  /** ≤8 word-char bytes pack injectively into a long (no zero bytes). */
  private def pack(w: String): Long =
    w.foldLeft(0L)((a, c) => (a << 8) | (c & 0xFFL))

  private val (keys, vals) = {
    val pairs = (for (((_, ws), li) <- markers.zipWithIndex; w <- ws)
      yield (pack(w), li)).sortBy(_._1)
    require(pairs.map(_._1).distinct.size == pairs.size,
      "marker words must be globally unique across languages")
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  private val langStrs: Array[UTF8String] =
    (markers.map(_._1) :+ "und").map(UTF8String.fromString).toArray
  private val ZH = UTF8String.fromString("zh")

  def langId(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    val counts = new Array[Int](nLangs)
    var zh = false
    var tok = 0L
    var tlen = 0 // 0 = no open token; > maxLen = open but can't be a marker
    var i = 0
    def endToken(): Unit = {
      if (tlen > 0) {
        if (tlen <= maxLen) {
          val k = java.util.Arrays.binarySearch(keys, tok)
          if (k >= 0) counts(vals(k)) += 1
        }
        tok = 0L; tlen = 0
      }
    }
    while (i < n) {
      val b = text.getByte(i) & 0xFF
      if (b < 0x80) {
        val lc = if (b >= 'A' && b <= 'Z') b | 0x20 else b
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9') || lc == '_') {
          if (tlen < 8) tok = (tok << 8) | lc
          tlen += 1
        } else endToken()
        i += 1
      } else {
        // decode the full code point: Java's \b word set (with \w left
        // ASCII) is `'_' || Character.isLetterOrDigit` — a NON-ASCII
        // letter/digit EXTENDS the current word run (so "théof" holds no
        // \bof\b), while marks/symbols/emoji end it
        val seqLen =
          if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4
        var cp =
          if (b < 0xE0) b & 0x1F else if (b < 0xF0) b & 0x0F else b & 0x07
        var ok = i + seqLen <= n
        var s = 1
        while (ok && s < seqLen) {
          val cb = text.getByte(i + s) & 0xFF
          if ((cb & 0xC0) != 0x80) ok = false else cp = (cp << 6) | (cb & 0x3F)
          s += 1
        }
        if (!ok) { endToken(); i += 1 } // malformed byte: boundary, resync
        else {
          if (cp >= 0x4E00 && cp <= 0x9FFF) zh = true
          if (Character.isLetterOrDigit(cp)) {
            // wordy but non-ASCII: the run can never equal a marker
            tlen = maxLen + 1
          } else endToken()
          i += seqLen
        }
      }
    }
    endToken()
    if (zh) return ZH
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < nLangs) { // strict > keeps the earliest language on ties
      if (counts(l) > bestScore) { bestScore = counts(l); best = l }
      l += 1
    }
    if (bestScore > 0) langStrs(best) else langStrs(nLangs)
  }
}

/** Stopword/charset language ID as a native expression: `doGenCode` emits
  * one static call, so the whole curation pipeline stays inside one
  * whole-stage codegen span with ONE pass over the text instead of 33. */
case class LangIdScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    LangIdUtil.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.langId($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LangIdScore {
  def langId(c: Column): Column =
    GraftSqlBridge.column(LangIdScore(GraftSqlBridge.expression(c.cast("string"))))
}
