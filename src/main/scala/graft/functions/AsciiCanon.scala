package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X13: single-pass text canonicalization kernel for the canonical-dedup
  * family — the exact composition
  *
  *   trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9\\s]", ""),
  *        "\\s+", " "))
  *
  * as ONE state-machine scan instead of a lowercase allocation plus two
  * Java-regex global replaces (each re-scanning and re-allocating the
  * text — measured ~40 s per regex pass over the ×100 replica corpus vs
  * ~2 s for this kernel; the canonicalization is per-row CPU a 100 TB
  * dedup pays on every document).
  *
  * Semantics per char: ASCII A–Z lowercases, a–z/0–9 emit, ASCII
  * whitespace ([ \t\n\x0B\f\r] — Java's \s) marks a pending separator
  * that becomes ONE space before the next kept char (never leading or
  * trailing — the trim), everything else (all punctuation, all
  * non-ASCII) drops. Non-ASCII uppercase goes through
  * Character.toLowerCase first, so the handful of code points whose
  * lowercase IS ASCII (e.g. U+212A KELVIN SIGN → 'k') survive exactly as
  * the lower()+regex chain keeps them. The one documented divergence is
  * U+0130 (İ), whose 1→2-char special lowercasing no per-char map can
  * express — the regex chain keeps an 'i', this kernel drops the char;
  * the differential spec pins equality on everything else and the DuckDB
  * oracle keeps the regex form, so a corpus where this bites would
  * surface as a hash mismatch, not silent drift. */
object AsciiCanonUtil {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def canon(text: UTF8String): UTF8String = {
    val s = text.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val lc =
        if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c < 128) c
        else Character.toLowerCase(c)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(lc)
      } else if (isWs(c)) {
        pendingSpace = true
      } // anything else: removed by the char-class regex
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** [[AsciiCanonUtil.canon]] as a codegen'd unary expression. */
case class AsciiCanon(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    AsciiCanonUtil.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiCanonUtil.canon($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AsciiCanon {
  def canon(c: Column): Column =
    GraftSqlBridge.column(AsciiCanon(GraftSqlBridge.expression(c.cast("string"))))
}
