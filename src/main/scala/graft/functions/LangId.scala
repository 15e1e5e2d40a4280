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
  * is a maximal run of ASCII word chars `[A-Za-z0-9_]` (precisely Java's
  * and RE2's default `\b` boundary rule — both engines' `\w` is ASCII
  * unless Unicode flags are set, so every non-ASCII byte is a boundary),
  * lowercased ASCII-wise; marker words are pure lowercase ASCII so token
  * equality equals `\bword\b` match count. CJK dominance is the same
  * `[一-鿿]` test, detected inline from 3-byte UTF-8 lead
  * sequences. Known divergence from `lower()`+regex: exotic code points
  * whose Unicode lowercase MAPS INTO ASCII (U+0130, U+212A) would count
  * under the old form and not here — impossible on the marker languages'
  * real text, and the differential spec pins equality on the testdata.
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
    var tlen = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i) & 0xFF
      var isWord = false
      if (b < 0x80) {
        val lc = if (b >= 'A' && b <= 'Z') b | 0x20 else b
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9') || lc == '_') {
          isWord = true
          if (tlen < 8) tok = (tok << 8) | lc
          tlen += 1
        }
      } else if (!zh && b >= 0xE4 && b <= 0xE9 && i + 2 < n) {
        // 3-byte lead E4..E9 spans U+4000..U+9FFF; continuation bytes are
        // 0x80..0xBF so they can never false-trigger this branch
        val cp = ((b & 0x0F) << 12) |
          ((text.getByte(i + 1) & 0x3F) << 6) | (text.getByte(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) zh = true
      }
      if (!isWord && tlen > 0) {
        if (tlen <= maxLen) {
          val k = java.util.Arrays.binarySearch(keys, tok)
          if (k >= 0) counts(vals(k)) += 1
        }
        tok = 0L; tlen = 0
      }
      i += 1
    }
    if (tlen > 0 && tlen <= maxLen) {
      val k = java.util.Arrays.binarySearch(keys, tok)
      if (k >= 0) counts(vals(k)) += 1
    }
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
