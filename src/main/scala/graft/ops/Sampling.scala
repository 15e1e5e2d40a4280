package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset sampling / splitting for training-data pipelines: deterministic
  * hash splits, skew-safe per-source quotas, source-mix rebalancing, and
  * concat-and-chunk sequence packing.
  *
  * Everything keys on a STABLE hash of the record id — never on position
  * (`monotonically_increasing_id`, partition index) and never on a seeded
  * RNG, so assignments survive repartitioning, retries, and incremental
  * re-runs: the properties a 100 TB pipeline actually needs from its
  * splitter. The hash is an md5 prefix, so the DuckDB oracle reproduces
  * every assignment bit-for-bit.
  */
object Sampling {

  /** 60-bit integer from the md5 of the id's decimal string — the shared
    * deterministic "random" key (same construction the DuckDB twin uses:
    * ('0x' || substring(md5(id), 1, 15))::BIGINT). */
  private def hashKey(id: Column): Column = Dedup.mdHash60(id.cast("string"))

  /** Deterministic train/val/test split: bucket = md5-hash(id) mod 100,
    * split by cumulative thresholds (default 80/10/10). A pure map over one
    * scan — no shuffle, no RNG, stable under any re-partitioning. */
  def hashSplit(docs: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct (must be >= 0, sum <= 100)")
    val bucket = pmod(hashKey(col(idCol)), lit(100))
    docs.select(col(idCol).as("doc_id"), bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** L36: EPOCH-WEIGHTED REPEAT materialization — the DoReMi/“repeat
    * high-quality sources” face of mix construction, where a source's
    * weight can EXCEED 1.0 and a doc appears ⌊w⌋ or ⌈w⌉ times: every doc
    * gets ⌊w·100⌋ div 100 base copies plus one more iff its md5 fraction
    * (mod 100) falls under the fractional part — so a source at w=2.5
    * repeats every doc 2× and half the docs (hash-chosen,
    * resharding-stable, no RNG) 3×. Output is one row per COPY
    * (doc_id, copy_idx) via a bounded sequence explode — the exploded
    * frame IS the training-mix manifest. Weights arrive ×100 as exact
    * integers, so both engines make identical copy decisions. */
  def repeatSample(docs: DataFrame, groupCol: String, idCol: String,
                   weightsX100: Map[String, Int]): DataFrame = {
    require(weightsX100.values.forall(w => w >= 0 && w <= 1000),
      s"weights must be 0..10.00, got $weightsX100")
    val w = weightsX100.map { case (g, v) =>
      (when(col("group_key") === g, lit(v)))
    }.reduce((a, b) => coalesce(a, b))
    val base = docs.select(col(idCol).as("doc_id"), col(groupCol).as("group_key"))
      .withColumn("_w", coalesce(w, lit(100)))
      .withColumn("_frac", pmod(hashKey(col("doc_id")), lit(100)))
      .withColumn("_n", expr("_w div 100") +
        when(col("_frac") < col("_w") % 100, 1L).otherwise(0L))
      .filter(col("_n") > 0)
    base.select(col("doc_id"), col("group_key"),
      explode(sequence(lit(0L), col("_n") - 1)).as("copy_idx"))
  }

  /** L38: WEIGHTED sampling without replacement (Efraimidis–Spirakis
    * 2006, the deterministic-hash variant): inclusion probability rises
    * with weight, no RNG. Classic A-ES keeps the n largest u^(1/w) —
    * equivalently the n SMALLEST −ln(u)/w, which is how we compute it
    * exactly: u = (md5-fraction + 1)/1000001 as a rational, −ln via the
    * shared [[graft.functions.LnFix]] integer series, key =
    * ln_micro·10⁴ div w_x100 — pure BIGINTs, so both engines select the
    * identical sample (ties → doc_id). One scan + TakeOrdered (partial
    * per-partition top-n, driver merges partitions·n rows). Returns the
    * chosen (doc_id, w_x100, key). */
  def weightedSample(docs: DataFrame, idCol: String, weightX100: Column,
                     n: Int): DataFrame = {
    val d = 1000001L
    val base = docs.select(col(idCol).as("doc_id"),
        weightX100.cast("long").as("w_x100"))
      .filter(col("w_x100") > 0)
      .withColumn("_u", pmod(hashKey(col("doc_id")), lit(d - 1)) + 1)
    graft.functions.LnFix.withNegLnMicro(base, "_u", d.toString, "_ln")
      .select(col("doc_id"), col("w_x100"),
        expr("(_ln * 10000) div w_x100").as("key"))
      .orderBy(col("key"), col("doc_id")).limit(n)
  }

  /** L15b: per-group quota by a SCORE (the C4-style domain cap that
    * keeps each source's BEST n documents rather than a uniform
    * sample): same two-stage salted shape as [[quotaSample]] — stage 1
    * caps hash-derived subgroups at n with bounded local sorts, stage 2
    * ranks the ≤ salts·n survivors — but ordered by (score desc, id)
    * instead of the hash. The subset argument is order-agnostic, so the
    * result equals the single global row_number the oracle runs. */
  def quotaByScore(docs: DataFrame, groupCol: String, idCol: String,
                   score: Column, n: Int, salts: Int = 16): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(groupCol).as("group_key"), score.as("_sc"))
    val h = Dedup.mdHash60(col("doc_id").cast("string"))
    val salted = Window.partitionBy(col("group_key"), pmod(h, lit(salts.toLong)))
      .orderBy(col("_sc").desc, col("doc_id"))
    val full = Window.partitionBy(col("group_key"))
      .orderBy(col("_sc").desc, col("doc_id"))
    base.withColumn("_srk", row_number().over(salted)).filter(col("_srk") <= n)
      .withColumn("rk", row_number().over(full)).filter(col("rk") <= n)
      .select(col("doc_id"), col("group_key"), col("_sc").as("score"),
        col("rk").cast("long").as("rk"))
  }

  /** Per-group quota: keep the n records of each group with the smallest
    * hash keys (a deterministic uniform sample of n per group, NOT "first n
    * by id"). Runs in two stages so a hot group cannot overwhelm one task:
    * stage 1 caps each of `salts` hash-derived subgroups at n (bounded
    * local sorts), stage 2 ranks the ≤ salts×n survivors per group. The
    * global top-n by hash order is a subset of the per-salt top-n's, so the
    * two-stage result equals a single global row_number — which is exactly
    * what the DuckDB twin runs. */
  def quotaSample(docs: DataFrame, groupCol: String, idCol: String,
                  n: Int, salts: Int = 16): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(groupCol).as("group_key"))
      .withColumn("_rk", hashKey(col("doc_id")))
    // salt from the HASH, not the raw id: a raw pmod degrades silently on
    // stride-patterned or non-numeric ids (all-even ids would use half the
    // subgroups; a string id casts to NULL and collapses stage 1 entirely)
    val salted = Window.partitionBy(col("group_key"), pmod(col("_rk"), lit(salts.toLong)))
      .orderBy(col("_rk"), col("doc_id"))
    val full = Window.partitionBy(col("group_key")).orderBy(col("_rk"), col("doc_id"))
    base.withColumn("_srk", row_number().over(salted)).filter(col("_srk") <= n)
      .withColumn("rk", row_number().over(full)).filter(col("rk") <= n)
      .select(col("doc_id"), col("group_key"), col("rk").cast("long").as("rk"))
  }

  /** L55: STRATIFIED train/val split with EXACT per-stratum quotas —
    * every source contributes floor(n·trainPct/100) training docs, not
    * the in-expectation share [[hashSplit]] gives (on a small or skewed
    * stratum the hash split's binomial noise is material; an eval set
    * needs the exact count). Deterministic: docs rank by the md5 key
    * inside their stratum, the first quota go to train.
    *
    * Scale contract (the r15 fix): exactness requires a per-stratum rank,
    * but a real pretraining corpus is exactly the skewed case (one crawl
    * source = 80% of rows), so the rank is TWO-LEVEL — the L29
    * [[shuffleOrder]] form applied WITHIN each stratum. Rows slab on the
    * hash key's top byte: 256 ranges that are PREFIXES of the stratum's
    * (hash, id) order (equal keys land in the same slab, so slab-major +
    * in-slab order IS the global stratum order). The (stratum, slab)
    * count table comes from one aggregate — #strata×256 rows,
    * dimension-sized; its offset/total windows run over that aggregate
    * (the adjudicated q32/q58 window class), and position = slab offset +
    * slab-local row_number. No task ever sorts more than ~1/256th of the
    * hottest stratum; the single-task fact-scale sort this replaces never
    * appears. The DuckDB twin stays the plain per-stratum row_number
    * (the two-level rank is exactly equal to it). */
  /** L60: token-BUDGET corpus selection — "fill the training budget with
    * the best documents first", the C4/Pile practice of truncating the
    * quality-ordered corpus at a token budget (prefix cut, NOT a
    * knapsack: the first document that would overflow the budget is cut
    * and so is everything after it in the order). Admission order is
    * (quality band DESC, md5 shuffle key, doc_id): quality is QUANTIZED
    * to 1e-3 bands — greedy at the knob's own resolution; within a band
    * the deterministic shuffle — which is exactly what makes the GLOBAL
    * running token sum computable without a single-task global sort.
    * Two-level prefix SUMS (the L29/L55 slab pattern extended from ranks
    * to sums): per-(band, hash-slab) token totals → ONE window over that
    * ≤(1001·256)-row aggregate (the dimension-window precedent) → the
    * within-slab running sum in slab-sized tasks (≤1/256 of a band even
    * when one band is the whole corpus). Emits the admitted documents
    * with band, token count, and cumulative position. */
  def budgetSelect(docs: DataFrame, idCol: String, textCol: String,
                   budgetTokens: Long): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        floor(TextOps.qualityCol(col(textCol)) * 1000).cast("long").as("band"),
        TextOps.nTokens(col(textCol)).cast("long").as("tokens"))
      .withColumn("_rk", hashKey(col("doc_id")))
      .withColumn("_b", shiftright(col("_rk"), 52))
    val slabs = base.groupBy(col("band"), col("_b"))
      .agg(sum(col("tokens")).as("_ts"))
    val wOff = Window.orderBy(col("band").desc, col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slabs
      .withColumn("_off", coalesce(sum(col("_ts")).over(wOff), lit(0L)))
      .select(col("band"), col("_b"), col("_off"))
    val wSlab = Window.partitionBy(col("band"), col("_b"))
      .orderBy(col("_rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("band", "_b"))
      .withColumn("cum_tokens", col("_off") + sum(col("tokens")).over(wSlab))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("band"), col("tokens"), col("cum_tokens"))
  }

  /** L67: LEAKAGE-SAFE train/val split — the eval-integrity refinement of
    * the plain hash split: duplicated documents must land on the SAME
    * side, or the val set silently contains training data (the classic
    * benchmark-inflation bug). The split decision hashes the CLUSTER
    * representative (canonical-dedup group keeper; near-dup closures
    * plug into the same seam through connectedComponents), so every
    * member of a duplicate cluster moves together. Canonical-empty docs
    * are their own singleton clusters (punctuation-only docs are not
    * duplicates of each other). Resharding-stable, deterministic, and
    * the per-cluster decision means changing the pct only moves whole
    * clusters at the margin. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       trainPct: Int = 80): DataFrame = {
    val canon = graft.functions.AsciiCanon.canon(col(textCol))
    val c = docs.select(col(idCol).as("doc_id"),
        md5(canon.cast("binary")).as("h"), (canon =!= "").as("_ok"))
      .localCheckpoint() // digest frame feeds the rep aggregate + the join
    val rep = c.filter(col("_ok"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("_rep"))
    c.join(rep, Seq("h"), "left_outer")
      .select(col("doc_id"),
        when(col("_ok"), col("_rep")).otherwise(col("doc_id")).as("cluster_rep"))
      .select(col("doc_id"), col("cluster_rep"),
        when(pmod(hashKey(col("cluster_rep")), lit(100)) < trainPct,
          lit("train")).otherwise(lit("val")).as("split"))
  }

  def stratifiedSplit(docs: DataFrame, groupCol: String, idCol: String,
                      trainPct: Int = 80): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(groupCol).as("group_key"))
      .withColumn("_rk", hashKey(col("doc_id")))
      .withColumn("_b", shiftright(col("_rk"), 52)) // top byte of the 60-bit key
    val slabs = base.groupBy(col("group_key"), col("_b"))
      .agg(count(lit(1)).as("_bn"))
    val wOff = Window.partitionBy(col("group_key")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slabs
      .withColumn("_off", coalesce(sum(col("_bn")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_bn")).over(Window.partitionBy(col("group_key"))))
      .select(col("group_key"), col("_b"), col("_off"), col("_n"))
    val wSlab = Window.partitionBy(col("group_key"), col("_b"))
      .orderBy(col("_rk"), col("doc_id"))
    base.join(broadcast(offsets), Seq("group_key", "_b"))
      .withColumn("_pos", col("_off") + row_number().over(wSlab))
      .select(col("doc_id"), col("group_key"),
        when(col("_pos") <= expr(s"(_n * $trainPct) div 100"), lit("train"))
          .otherwise(lit("val")).as("split"))
  }

  /** The mix keep rule as a column predicate — composable into a larger
    * single-scan filter (see pipeline_curate). */
  def mixPredicate(id: Column, group: Column, rates: Map[String, Double]): Column = {
    val rate = rates.foldLeft(lit(1.0)) { case (acc, (k, r)) =>
      when(group === k, lit(r)).otherwise(acc)
    }
    pmod(hashKey(id), lit(10000)).cast("double") < rate * 10000.0
  }

  /** Source-mix rebalancing: downsample each group to a configured keep
    * rate (default 1.0), deterministically — a record survives iff
    * hash(id) mod 10000 < rate×10000. The mix knob of a training-data
    * pipeline ("keep 25% of the low-quality crawl, all of the curated
    * sources") with resharding-stable membership; changing a rate only
    * adds/removes rows at the margin, it never reshuffles survivors. */
  /** Curriculum phasing: assign each document a training phase 1..4 by
    * quality quartile (phase 1 = top quartile — the easy/clean opener)
    * plus a deterministic md5 shuffle key for within-phase ordering at
    * read time. SCALABLE form deliberately: thresholds come from ONE
    * exact-percentile aggregate (3 doubles to the driver) and phases are
    * scan-local comparisons — no global ntile window, whose single-task
    * sort would be the bottleneck at corpus scale. Ties sit with the
    * higher phase on the boundary value, identically in both engines. */
  def curriculum(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val q = docs.select(col(idCol).as("doc_id"),
      TextOps.qualityCol(col(textCol)).as("quality"))
    val cuts = q.agg(expr("percentile(quality, 0.25)"),
      expr("percentile(quality, 0.5)"), expr("percentile(quality, 0.75)")).head()
    val (c25, c50, c75) = (cuts.getDouble(0), cuts.getDouble(1), cuts.getDouble(2))
    q.select(col("doc_id"), col("quality"),
      (lit(1) + when(col("quality") < c75, 1).otherwise(0)
        + when(col("quality") < c50, 1).otherwise(0)
        + when(col("quality") < c25, 1).otherwise(0)).as("phase"),
      hashKey(col("doc_id")).as("shuffle_key"))
  }

  def mixSample(docs: DataFrame, groupCol: String, idCol: String,
                rates: Map[String, Double]): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(groupCol).as("group_key"))
      .filter(mixPredicate(col("doc_id"), col("group_key"), rates))

  /** Temperature-scaled source rates from the observed source sizes: the
    * multilingual-pretraining rebalance, where sampling probability
    * p_s ∝ n_s^α (α ∈ (0,1]) flattens the source distribution. Realized as
    * per-source keep rates r_s = (n_min/n_s)^(1−α) — the smallest source
    * keeps everything, larger sources downsample toward the tempered mix.
    * Source counts are one aggregate collected driver-side (#sources is
    * parameter-sized); rates are rounded to 6dp. α=0.5 computes via sqrt,
    * which IEEE-guarantees correct rounding — the oracle-checked query pins
    * that α so both engines derive bit-identical rates (pow is only
    * 1-ulp-accurate and could flip a 6dp boundary). */
  def temperatureRates(docs: DataFrame, groupCol: String,
                       alpha: Double): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha outside (0, 1]")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureRates on an empty corpus")
    val nMin = counts.values.min
    counts.map { case (k, n) =>
      val ratio = nMin.toDouble / n.toDouble
      val r = if (alpha == 0.5) math.sqrt(ratio) else math.pow(ratio, 1.0 - alpha)
      k -> (BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }
  }

  /** Temperature mix sampling: [[temperatureRates]] + the deterministic
    * hash-keep rule of [[mixSample]] in one scan. Output carries the
    * applied rate for auditability. A null group is a real group (its
    * count participates in n_min) — the rate fold matches it with an
    * isNull branch, since `=== null` can never be true. */
  def temperatureSample(docs: DataFrame, groupCol: String, idCol: String,
                        alpha: Double = 0.5): DataFrame = {
    val rates = temperatureRates(docs, groupCol, alpha)
    val rateCol = rates.foldLeft(lit(1.0)) { case (acc, (k, r)) =>
      if (k == null) when(col(groupCol).isNull, lit(r)).otherwise(acc)
      else when(col(groupCol) === k, lit(r)).otherwise(acc)
    }
    docs.select(col(idCol).as("doc_id"), col(groupCol).as("group_key"),
        rateCol.as("rate"))
      .filter(pmod(hashKey(col("doc_id")), lit(10000)).cast("double")
        < col("rate") * 10000.0)
  }

  /** Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    * documents are concatenated in id order and cut into fixed token-budget
    * context windows; each document reports the pack it STARTS in and its
    * token offset inside that pack. The global prefix sum is computed
    * hierarchically — per-block window sums plus a broadcast of the tiny
    * block-offset table — so no stage ever sorts more than one block
    * (classic distributed scan; the id-ordered window in the DuckDB twin is
    * the single-node equivalent). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, blockSize: Long = 4096L): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.nTokens(col(textCol)).cast("long").as("n_tok"),
      (col(idCol) / blockSize).cast("long").as("_blk"))
    val inBlock = Window.partitionBy(col("_blk"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = toks.withColumn("_cum_local", sum(col("n_tok")).over(inBlock))
    // block totals are O(#blocks) rows — the single-partition window over
    // them is over a broadcast-scale table, not the data
    val blockOffsets = toks.groupBy(col("_blk")).agg(sum(col("n_tok")).as("_bt"))
      .withColumn("_boff",
        coalesce(sum(col("_bt")).over(Window.orderBy(col("_blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_blk"), col("_boff"))
    withLocal.join(broadcast(blockOffsets), Seq("_blk"))
      .select(col("doc_id"), col("n_tok"),
        (col("_boff") + col("_cum_local") - col("n_tok")).as("_start"))
      .select(col("doc_id"), col("n_tok"),
        // exact integer division (not float-divide-then-cast): stays equal
        // to the oracle's `_start // budget` even past 2^53 total tokens
        expr(s"_start div ${budget.toLong}L").as("pack_id"),
        pmod(col("_start"), lit(budget.toLong)).as("pack_offset"))
  }

  /** L29: deterministic GLOBAL training-order shuffle — the "shuffle the
    * corpus before each epoch" step, as a pure function of (id, salt):
    * position = global rank by md5(id‖salt). No RNG, resharding-stable,
    * and a new salt is a new epoch order.
    *
    * The global rank is computed WITHOUT a global sort: documents bucket
    * on the hash's first byte-pair (256 ranges that are PREFIXES of the
    * global order), per-bucket counts collect once (256 longs — the
    * driver's entire traffic), and position = bucket offset + the
    * bucket-local row_number. Each window sorts 1/256th of the corpus —
    * the two-level rank every distributed ORDER BY row_number needs at
    * 100 TB, where a single-partition global window is the classic
    * anti-pattern. The DuckDB oracle is the plain global row_number. */
  def shuffleOrder(docs: DataFrame, idCol: String,
                   salt: String = "epoch0"): DataFrame = {
    val spark = docs.sparkSession
    val h = md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary"))
    val d = docs.select(col(idCol).as("doc_id"), h.as("_h"),
      substring(h, 1, 2).as("_b"))
    val counts = d.groupBy(col("_b")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    // collect (not map): on an EMPTY input the scan yields one element and
    // sliding(2) emits a single size-1 window — a map would MatchError
    // where the correct result is simply an empty offset table
    val offsets = counts.scanLeft(("", 0L)) { case ((_, acc), (b, n)) =>
      (b, acc + n) }.sliding(2)
      .collect { case Array((_, off), (b, _)) => (b, off) }
      .toSeq
    val offDf = broadcast(spark.createDataFrame(offsets).toDF("_b", "_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("_h"), col("doc_id"))
    d.join(offDf, Seq("_b"))
      .select(col("doc_id"),
        (col("_off") + row_number().over(w)).as("position"))
  }

  /** Hashed-ngram feature stream for [[dsirSelect]]: one row per unigram
    * and per bigram occurrence, bucketed by the md5-prefix hash mod
    * `buckets` (the oracle-parity hash — DuckDB reproduces every bucket
    * bit-for-bit). Bigrams ride the Dedup shifted-slice construction:
    * native array ops, no interpreted lambda on the hot path. */
  private def hashedGrams(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("t"))
    val uni = base.select(col("doc_id"), explode(col("t")).as("gram"))
      .filter(col("gram") =!= "")
    val n1 = greatest(size(col("t")) - 1, lit(0))
    val bi = base
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), n1), slice(col("t"), lit(2), n1))).as("sh"))
      .select(col("doc_id"),
        concat(col("sh.0"), lit("\u0001"), col("sh.1")).as("gram"))
    uni.unionByName(bi)
      .select(col("doc_id"), (Dedup.mdHash60(col("gram")) % buckets).as("bucket"))
  }

  /** L41: DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023), the deterministic variant: pick the `keepN` raw-corpus
    * documents that look most like a TARGET domain, by importance weight
    * under two bag-of-hashed-ngram models.
    *
    *  1. Features: unigram + bigram occurrences hashed into `buckets`
    *     buckets ([[hashedGrams]]) — the model is `buckets` rows no matter
    *     the corpus size, the paper's trick for fitting 100 TB in a
    *     broadcast.
    *  2. Two Laplace-smoothed bucket models: p_target (from `target`) and
    *     p_raw (from `docs`). Log-probabilities are EXACT micro-nat
    *     integers from the shared LnFix series (no libm), so
    *     log w(doc) = Σ_grams [ln p_t(b) − ln p_r(b)]
    *                = Σ_grams [nll_r(b) − nll_t(b)]
    *     is a pure BIGINT sum — bit-equal across engines, fully
    *     oracle-checkable (unlike the paper's Gumbel-noise resampling,
    *     replaced here by the deterministic top-n with id tie-break).
    *  3. Selection: top-`keepN` by (weight desc, doc_id) as a TakeOrdered
    *     (never a global sort), flagged back onto the full scored frame
    *     with a broadcast join.
    *
    * Shapes at 100 TB: two feature scans (the target is eval-suite-sized
    * next to the corpus), two `buckets`-row aggregates, one broadcast
    * model join + per-doc sum, one TakeOrdered. Documents with no tokens
    * score 0 (the empty product). Returns (doc_id, score_micro, keep). */
  /** The ONE DSIR hashed-feature bucket count: the batch selector, the
    * streaming admission twin's delta array, and the generated oracle SQL
    * must all index the same model table, so they all read this constant
    * — a silent default-drift would mis-index the stream's dense array. */
  val DsirBuckets: Int = 4096

  /** The trained DSIR model alone: `(bucket, _delta)` with
    * _delta = nll_r − nll_t in exact micro-nats — `buckets` rows,
    * broadcast-sized by construction. Exposed so the streaming admission
    * twin scores with the identical literals. */
  def dsirModel(docs: DataFrame, target: DataFrame, idCol: String,
                textCol: String, buckets: Int = DsirBuckets): DataFrame = {
    import graft.functions.LnFix
    val gr = hashedGrams(docs, idCol, textCol, buckets)
    val gt = hashedGrams(target, idCol, textCol, buckets)
    val cr = gr.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    val ct = gt.groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    // raw-corpus buckets are a superset of anything a scored doc can emit,
    // so the model frame is keyed on cr; target-only smoothing mass enters
    // through tot_t + buckets exactly as in the oracle CTE chain
    val m0 = cr.join(ct, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("c_r"), coalesce(col("c_t"), lit(0L)).as("c_t"))
      .crossJoin(broadcast(cr.agg(sum(col("c_r")).as("tot_r"))))
      .crossJoin(broadcast(ct.agg(coalesce(sum(col("c_t")), lit(0L)).as("tot_t"))))
    LnFix.withNegLnMicro(
        LnFix.withNegLnMicro(m0, "c_r + 1", s"tot_r + $buckets", "nll_r"),
        "c_t + 1", s"tot_t + $buckets", "nll_t")
      .select(col("bucket"), (col("nll_r") - col("nll_t")).as("_delta"))
  }

  def dsirSelect(docs: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = DsirBuckets,
                 keepN: Int = 100): DataFrame = {
    // the fitted model is `buckets` longs BY CONSTRUCTION (that is the
    // hashing trick's whole point), so it collects as a parameter (the
    // ivfModel pattern) and scoring is ONE codegen'd kernel scan — no
    // gram explode, no join, no doc-keyed shuffle. (The fit side above it
    // stays fully distributed.) Exact BIGINT terms make the kernel's
    // in-document fold order equal the join+sum form bit-for-bit — the
    // pre-kernel join form measured 2.5× slower at the sf10 gate on the
    // scoring scan alone.
    val deltas = new Array[Long](buckets)
    dsirModel(docs, target, idCol, textCol, buckets)
      .collect().foreach(r => deltas(r.getLong(0).toInt) = r.getLong(1))
    val scored = docs.select(col(idCol).as("doc_id"),
      graft.functions.DsirScore.score(col(textCol), deltas).as("score_micro"))
    val top = scored.orderBy(col("score_micro").desc, col("doc_id"))
      .limit(keepN).select(col("doc_id"), lit(true).as("_keep"))
    scored.join(broadcast(top), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("score_micro"),
        coalesce(col("_keep"), lit(false)).as("keep"))
  }
}
