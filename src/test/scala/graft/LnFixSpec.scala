package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.LnFix

/** Invariants for the cross-engine fixed-point ln snap (LnFix):
  *  - accuracy: the integer result is within one micro-nat of the true
  *    round(−ln(a/b)·1e6) over a wide (a, b) grid including the domain
  *    edges (a=1, a=b, b at the documented 1.8e10 bound);
  *  - Spark parity: the selectExpr chain rendered for Catalyst computes
  *    exactly the local reference twin (the DuckDB rendering is the same
  *    step list by construction — one generator emits both dialects).
  */
class LnFixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val bs = Seq(1L, 2L, 3L, 7L, 10L, 97L, 1000L, 65536L, 999983L,
    123456789L, 4000000000L, 18000000000L)
  private def as(b: Long): Seq[Long] =
    Seq(1L, 2L, 3L, b / 7, b / 3, b / 2, b / 2 + 1, 2 * b / 3, b - 2, b - 1, b)
      .filter(a => a >= 1 && a <= b).distinct

  test("reference twin is within 0.6 micro-nats of true -ln(a/b)") {
    for (b <- bs; a <- as(b)) {
      val got = LnFix.referenceNegLnMicro(a, b)
      val want = -math.log(a.toDouble / b.toDouble) * 1e6
      assert(math.abs(got - want) < 0.6, s"a=$a b=$b got=$got want=$want")
    }
    assert(LnFix.referenceNegLnMicro(1, 1) == 0)
    // ln 2 in micro-nats
    assert(LnFix.referenceNegLnMicro(1, 2) == 693147)
  }

  test("Spark selectExpr rendering equals the reference twin bit-for-bit") {
    import spark.implicits._
    val pairs = for (b <- bs; a <- as(b)) yield (a, b)
    val df = pairs.toDF("a", "b")
    val got = LnFix.withNegLnMicro(df, "a", "b", "lnq")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- pairs)
      assert(got((a, b)) == LnFix.referenceNegLnMicro(a, b), s"a=$a b=$b")
  }

  test("out-of-domain b fails LOUDLY on both renderers (no silent wrap)") {
    import spark.implicits._
    // beyond b ≈ 1.8e10, (b−a')·1e9 overflows BIGINT: Spark (non-ANSI
    // fold) would wrap silently while DuckDB raises — the guard makes
    // both engines raise the same message instead of diverging
    val df = Seq((1L, 20000000000L)).toDF("a", "b")
    val e = intercept[Exception] {
      LnFix.withNegLnMicro(df, "a", "b", "lnq").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("LnFix domain")), msgs(e).mkString(" | "))
    // the DuckDB rendering carries the identical guard
    val ctes = LnFix.oracleCtes("p", "src", Seq("k"), "a", "b", "lnq")
    assert(ctes.contains("error('LnFix domain"))
    // ...and in-domain values still pass through the guard unchanged
    assert(LnFix.withNegLnMicro(Seq((1L, 18000000000L)).toDF("a", "b"),
        "a", "b", "lnq").head().getLong(2) ==
      LnFix.referenceNegLnMicro(1L, 18000000000L))
  }
}
