package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[Md5Fingerprint]]: tokenize + per-token md5 + rolling
  * polynomial fold, all in one call so whole-stage codegen sees a single
  * static invocation (the previous `aggregate` higher-order-function form
  * ran interpreted with a per-row lambda — the last non-codegen hot text
  * path).
  *
  * The token hash is the first 15 hex chars (60 bits) of md5 — chosen over
  * xxhash64 because md5 is bit-identical in every engine (the DuckDB oracle
  * recomputes it with `substring(md5(t), 1, 15)`), and 60 bits always fits a
  * signed 64-bit int in both engines. Tokenization matches
  * `split(trim(text), "\s+")` exactly (space-only trim, trailing empties
  * kept — Spark's split uses limit -1).
  */
object FingerprintUtil {
  final val P = 1000000007L

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** `split(s, "\\s+")` with Spark's limit -1 rule (trailing empties
    * kept) — shared with the DSIR scoring kernel. */
  def wsSplit(s: String): Array[String] = ws.split(s, -1)

  /** First 60 bits of md5(token) = value of hex chars [0,15). */
  def md5Hash60(token: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(token.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (bytes(b) & 0xFFL); b += 1 }
    (h << 4) | ((bytes(7) & 0xF0L) >>> 4)
  }

  /** acc = 17; for each token: acc = (acc*31 + md5Hash60(tok) % P) % P.
    * acc < P < 2^30 and hash%P < 2^30, so acc*31 + h < 2^36 — never
    * overflows a long regardless of input. */
  def fingerprint(text: UTF8String): Long = {
    var s = text.toString
    // match SQL trim(): strip ASCII spaces only (not \t\n like String.trim)
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    s = s.substring(start, end)
    val toks = ws.split(s, -1)
    var acc = 17L
    var i = 0
    while (i < toks.length) {
      acc = (acc * 31 + md5Hash60(toks(i)) % P) % P
      i += 1
    }
    acc
  }
}

/** Rolling md5-polynomial document fingerprint as a native expression:
  * `doGenCode` emits one static call, keeping the whole pipeline inside
  * whole-stage codegen (no interpreted lambda, no intermediate token array
  * in the plan). Order-sensitive, unlike a bag-of-words hash. */
case class Md5Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    FingerprintUtil.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintUtil.fingerprint($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Fingerprint {
  def fingerprint(c: Column): Column =
    GraftSqlBridge.column(Md5Fingerprint(GraftSqlBridge.expression(c.cast("string"))))
}
