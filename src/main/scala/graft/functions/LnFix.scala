package graft.functions

import org.apache.spark.sql.DataFrame

/** Cross-engine EXACT logarithm snap.
  *
  * The perplexity queries (text_ppl / text_ppl_bigram) need
  * round(−ln(a/b)·1e6) per vocabulary entry, summed per document. A libm
  * `ln` is last-ulp engine-dependent, and at sf0.1 real values land close
  * enough to the rounding half-grid that Spark's StrictMath and DuckDB's
  * libm snapped one value apart — the only red rows of round 11.
  *
  * Fix: compute the snap with PURE NONNEGATIVE BIGINT arithmetic, which
  * every SQL engine executes bit-identically:
  *
  *  1. Range-reduce: find the smallest e with a·2^e ≥ b by six binary
  *     shifts (32,16,8,4,2,1). The shifted a' lands in [b/2, b], so
  *     −ln(a/b) = e·ln2 − ln(a'/b) = e·ln2 + 2·atanh(z),
  *     z = (b−a')/(b+a') ∈ [0, 1/3].
  *     Overflow-safe by construction: the factor is only applied when
  *     a·F < b, and it is applied as `a * (CASE … THEN F ELSE 1 END)` so
  *     even an engine that evaluated both CASE arms eagerly never forms
  *     an out-of-range product.
  *  2. Evaluate 2·atanh(z) in nano-nat fixed point (scale 1e9) with the
  *     odd series through z¹³ — truncation ≤ (1/3)¹³·(1/13)/(1−z²) ≈
  *     5·10⁻⁹, plus ≤ ~10 one-ulp floor-division truncations, so the
  *     total error vs the true ln is < 3·10⁻⁸ nats: far inside the
  *     1·10⁻⁶ output grid, and — the point — DETERMINISTIC, because no
  *     step depends on a math library.
  *  3. Snap to micro-nats: (U + 500) div 1000 (round half up; all
  *     operands nonneg, so `div` (Spark) and `//` (DuckDB) agree —
  *     truncation == floor on nonnegatives).
  *
  * Domain: 1 ≤ a ≤ b ≤ ~1.8·10¹⁰ (then (b−a')·10⁹ < 9.2·10¹⁸ stays in
  * BIGINT). Both callers have b = corpus_tokens + vocab, far below the
  * bound at any test SF; a 100 TB deployment crossing it would raise the
  * series to DECIMAL(38,0) — same algorithm, wider lanes.
  *
  * ONE step list feeds both renderers (Spark `selectExpr` chain, DuckDB
  * CTE chain), so the two engines cannot diverge by transcription.
  */
object LnFix {

  /** Per-stage (alias, expression) lists; `idiv` renders integer division
    * for the target dialect. Stage k may reference aliases of stages < k. */
  private def stages(idiv: (String, String) => String): Seq[Seq[(String, String)]] = {
    val shifts = Seq(("4294967296", 32), ("65536", 16), ("256", 8), ("16", 4), ("4", 2), ("2", 1))
    val shiftStages = shifts.zipWithIndex.map { case ((f, sh), i) =>
      val (ap, ep) = (s"_lf_a$i", s"_lf_e$i")
      val cond = s"$ap <= ${idiv("(_lf_b - 1)", f)}"
      Seq(
        s"_lf_a${i + 1}" -> s"$ap * (CASE WHEN $cond THEN $f ELSE 1 END)",
        s"_lf_e${i + 1}" -> s"$ep + (CASE WHEN $cond THEN $sh ELSE 0 END)")
    }
    val S = "1000000000"
    val tail = Seq(
      Seq("_lf_z" -> idiv(s"(_lf_b - _lf_a6) * $S", "(_lf_b + _lf_a6)")),
      Seq("_lf_z2" -> idiv("_lf_z * _lf_z", S)),
      Seq("_lf_p3" -> idiv("_lf_z * _lf_z2", S)),
      Seq("_lf_p5" -> idiv("_lf_p3 * _lf_z2", S)),
      Seq("_lf_p7" -> idiv("_lf_p5 * _lf_z2", S)),
      Seq("_lf_p9" -> idiv("_lf_p7 * _lf_z2", S)),
      Seq("_lf_p11" -> idiv("_lf_p9 * _lf_z2", S)),
      Seq("_lf_p13" -> idiv("_lf_p11 * _lf_z2", S)),
      Seq("_lf_u" -> (s"_lf_e6 * 693147181 + 2 * (_lf_z + ${idiv("_lf_p3", "3")} + " +
        s"${idiv("_lf_p5", "5")} + ${idiv("_lf_p7", "7")} + ${idiv("_lf_p9", "9")} + " +
        s"${idiv("_lf_p11", "11")} + ${idiv("_lf_p13", "13")})")))
    shiftStages ++ tail
  }

  private val sparkIdiv = (a: String, b: String) => s"(($a) div ($b))"
  private val duckIdiv = (a: String, b: String) => s"(($a) // ($b))"

  /** Documented domain bound for b: beyond it (b−a')·10⁹ overflows
    * BIGINT, where Spark (non-ANSI) silently wraps but DuckDB raises —
    * so both renderers guard b at runtime and fail LOUDLY AND IDENTICALLY
    * on an out-of-domain corpus instead of diverging. */
  private val maxB = 18000000000L

  private def guardB(b: String, raise: String => String): String =
    s"CASE WHEN ($b) > $maxB THEN ${raise(s"'LnFix domain: b exceeds $maxB'")} ELSE ($b) END"

  /** Spark side: append BIGINT column `out` = snapped −ln(a/b) in
    * micro-nats. `aSql`/`bSql` are SQL fragments over df's columns
    * (must evaluate to integers with 1 ≤ a ≤ b). Linear chain of narrow
    * projections over the (vocabulary-sized) input — Catalyst collapses
    * or pipelines them; nothing here shuffles. */
  def withNegLnMicro(df: DataFrame, aSql: String, bSql: String, out: String): DataFrame = {
    val bGuarded = guardB(s"CAST(($bSql) AS BIGINT)",
      msg => s"CAST(raise_error($msg) AS BIGINT)")
    var cur = df.selectExpr(df.columns.toSeq :+
      s"CAST(($aSql) AS BIGINT) AS _lf_a0" :+
      s"$bGuarded AS _lf_b" :+
      "CAST(0 AS BIGINT) AS _lf_e0": _*)
    for (st <- stages(sparkIdiv))
      cur = cur.selectExpr("*" +: st.map { case (n, e) => s"($e) AS $n" }: _*)
    cur.selectExpr(df.columns.toSeq :+ s"((_lf_u + 500) div 1000) AS $out": _*)
  }

  /** Oracle side: emit the identical computation as a DuckDB CTE chain.
    * Caller splices the result into a WITH list and reads from `<p>f`,
    * which has columns `keys :+ out`. `src` must provide the key columns
    * plus whatever `aExpr`/`bExpr` reference. */
  def oracleCtes(p: String, src: String, keys: Seq[String],
                 aExpr: String, bExpr: String, out: String): String = {
    val ks = keys.mkString(", ")
    val bGuarded = guardB(s"CAST(($bExpr) AS BIGINT)",
      msg => s"CAST(error($msg) AS BIGINT)")
    val head = s"${p}0 AS (SELECT $ks, CAST(($aExpr) AS BIGINT) AS _lf_a0, " +
      s"$bGuarded AS _lf_b, CAST(0 AS BIGINT) AS _lf_e0 FROM $src)"
    val sts = stages(duckIdiv).zipWithIndex.map { case (st, i) =>
      s"$p${i + 1} AS (SELECT *, ${st.map { case (n, e) => s"($e) AS $n" }.mkString(", ")} FROM $p$i)"
    }
    val fin = s"${p}f AS (SELECT $ks, ((_lf_u + 500) // 1000) AS $out FROM $p${stages(duckIdiv).size})"
    (head +: sts :+ fin).mkString(",\n")
  }

  /** Local reference twin (for the scalatest accuracy invariant). */
  def referenceNegLnMicro(a: Long, b: Long): Long = {
    require(a >= 1 && a <= b, s"domain: 1 <= a <= b, got ($a, $b)")
    var a1 = a; var e = 0L
    for ((f, sh) <- Seq((4294967296L, 32), (65536L, 16), (256L, 8), (16L, 4), (4L, 2), (2L, 1)))
      if (a1 <= (b - 1) / f) { a1 *= f; e += sh }
    val s = 1000000000L
    val z = (b - a1) * s / (b + a1)
    val z2 = z * z / s
    val p3 = z * z2 / s; val p5 = p3 * z2 / s; val p7 = p5 * z2 / s
    val p9 = p7 * z2 / s; val p11 = p9 * z2 / s; val p13 = p11 * z2 / s
    val u = e * 693147181L + 2 * (z + p3 / 3 + p5 / 5 + p7 / 7 + p9 / 9 + p11 / 11 + p13 / 13)
    (u + 500) / 1000
  }
}
