package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = (0L until 400L).map { i =>
    (i, s"src${i % 4}", ("tok " * (1 + (i % 7).toInt)).trim)
  }.toDF("doc_id", "source", "text")

  test("hashSplit partitions every record exactly once, near the target fractions") {
    val r = Sampling.hashSplit(docs, "doc_id").collect()
    assert(r.length == 400)
    val bySplit = r.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 80/10/10 within a generous tolerance at n=400
    assert(bySplit("train") > 280 && bySplit("train") < 360)
    assert(bySplit("val") > 10 && bySplit("test") > 10)
    // stable: same ids get same split on a re-run over a repartitioned input
    val again = Sampling.hashSplit(docs.repartition(13), "doc_id").collect()
      .map(x => x.getLong(0) -> x.getAs[String]("split")).toMap
    r.foreach(x => assert(again(x.getLong(0)) == x.getAs[String]("split")))
  }

  test("leakageSafeSplit: duplicate clusters move together; empties are singletons") {
    val base = (100L until 400L).map(i => (i, s"unique text number $i"))
      .toDF("doc_id", "text").unionByName(
        Seq((1L, "the same doc body"), (2L, "THE same, doc body!"),
          (3L, "the same doc body"), (4L, "?!."), (5L, "?!."),
          (6L, "another body entirely")).toDF("doc_id", "text"))
    val r = Sampling.leakageSafeSplit(base, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    // the whole duplicate cluster shares one rep and one side
    assert(Set(r(1L), r(2L), r(3L)).size == 1, s"cluster split apart: ${r(1L)}, ${r(2L)}, ${r(3L)}")
    assert(r(1L)._1 == 1L)
    // canonical-empty docs are NOT each other's duplicates
    assert(r(4L)._1 == 4L && r(5L)._1 == 5L)
    // both sides populated at n=306 and the split is resharding-stable
    val sides = r.values.map(_._2).toSet
    assert(sides == Set("train", "val"))
    val again = Sampling.leakageSafeSplit(base.repartition(7), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(again == r)
  }

  test("stratifiedSplit: EXACT floor(n*0.8) train docs per stratum, deterministic") {
    // 4 sources x 100 docs plus one ragged 7-doc stratum: the exactness
    // claim is floor quotas everywhere, including where hashSplit's
    // binomial noise would bite (7 docs -> exactly 5 train, never 4 or 6)
    val ragged = docs.unionByName(
      (1000L until 1007L).map(i => (i, "tiny", "t")).toDF("doc_id", "source", "text"))
    val r = Sampling.stratifiedSplit(ragged, "source", "doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    assert(r.length == 407)
    val trainBySrc = r.filter(_._3 == "train").groupBy(_._2).view.mapValues(_.size).toMap
    assert(trainBySrc == Map("src0" -> 80, "src1" -> 80, "src2" -> 80,
      "src3" -> 80, "tiny" -> 5), s"quotas wrong: $trainBySrc")
    // stable under repartitioning
    val again = Sampling.stratifiedSplit(ragged.repartition(13), "source", "doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
    assert(r.toSet == again)
  }

  test("budgetSelect: slabbed running sum == one global running-sum window, prefix-cut exact") {
    // differential vs the naive global window (the thing the slab scheme
    // replaces): same order keys -> identical admitted set AND identical
    // cumulative positions; the budget cuts mid-corpus
    val corpus = docs
    val budget = 600L
    val got = Sampling.budgetSelect(corpus, "doc_id", "text", budget).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val hk = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val ref = corpus.select(col("doc_id"),
        floor(graft.ops.TextOps.qualityCol(col("text")) * 1000).cast("long").as("band"),
        graft.ops.TextOps.nTokens(col("text")).cast("long").as("tokens"),
        hk.as("_hk"))
      .withColumn("cum", sum(col("tokens")).over(
        Window.orderBy(col("band").desc, col("_hk"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select(col("doc_id"), col("band"), col("tokens"), col("cum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ref.nonEmpty && ref.size < 400, s"degenerate budget: ${ref.size} admitted")
    assert(got == ref, s"slabbed prefix sum diverged: got=${got.size} ref=${ref.size}")
    // prefix-cut semantics: total admitted tokens within budget, and the
    // admitted set is exactly the cum<=budget prefix (no knapsack skips)
    assert(got.values.map(_._2).sum <= budget)
  }

  test("stratifiedSplit: two-level slab rank == one global stratum rank under 90% skew") {
    // the r16 skew fix's differential: one source owns 90% of rows (the
    // real pretraining shape) — the slabbed rank must reproduce the plain
    // per-stratum row_number split EXACTLY, doc by doc
    val skewed = (1L to 3000L)
      .map(i => (i, if (i % 10 == 0L) "curated" else "crawl", "t"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.stratifiedSplit(skewed, "source", "doc_id").collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    val hk = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val wRef = Window.partitionBy(col("source")).orderBy(col("_hk"), col("doc_id"))
    val ref = skewed.select(col("doc_id"), col("source"), hk.as("_hk"))
      .withColumn("_pos", row_number().over(wRef))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(col("doc_id"),
        when(col("_pos") <= expr("(_n * 80) div 100"), lit("train"))
          .otherwise(lit("val")).as("split"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got == ref, "slabbed rank diverged from the global stratum rank")
    assert(got.count(_._2 == "train") == 2160 + 240) // floor quotas: 2700*.8 + 300*.8
  }

  test("quotaSample keeps exactly n per group and matches the unsalted rank") {
    val r = Sampling.quotaSample(docs, "source", "doc_id", n = 15)
    val byGroup = r.groupBy("group_key").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byGroup.values.forall(_ == 15L))
    // two-stage salted result == single global row_number (the oracle shape)
    val hk = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    val direct = docs.select(col("doc_id"), col("source").as("group_key"), hk.as("_hk"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("group_key").orderBy(col("_hk"), col("doc_id"))))
      .filter(col("rk") <= 15).select("doc_id", "group_key", "rk")
    assert(r.select("doc_id", "group_key", "rk").except(direct).isEmpty)
  }

  test("mixSample downsamples only the configured groups, deterministically") {
    val rates = Map("src1" -> 0.25, "src3" -> 0.0)
    val r = Sampling.mixSample(docs, "source", "doc_id", rates)
    val byGroup = r.groupBy("group_key").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byGroup("src0") == 100L && byGroup("src2") == 100L) // untouched
    assert(!byGroup.contains("src3"))                          // rate 0 drops all
    assert(byGroup("src1") > 5 && byGroup("src1") < 50)        // ~25 of 100
    // monotone in the rate: survivors at 0.25 survive at 0.5
    val more = Sampling.mixSample(docs, "source", "doc_id", Map("src1" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    r.filter(col("group_key") === "src1").collect()
      .foreach(x => assert(more.contains(x.getLong(0))))
  }

  test("hashSplit and mixSample are map-only plans (no Exchange)") {
    for (df <- Seq(Sampling.hashSplit(docs, "doc_id"),
                   Sampling.mixSample(docs, "source", "doc_id", Map("src1" -> 0.5)))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
    }
  }

  test("temperatureSample: rates follow n^(alpha-1), smallest source kept whole") {
    // skewed sources: src0 = 600 docs, src1 = 150, src2 = 50
    val skewed = ((0L until 600L).map(i => (i, "src0")) ++
      (600L until 750L).map(i => (i, "src1")) ++
      (750L until 800L).map(i => (i, "src2")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val rates = Sampling.temperatureRates(skewed, "source", alpha = 0.5)
    assert(rates("src2") == 1.0)
    assert(math.abs(rates("src1") - math.sqrt(50.0 / 150.0)) < 1e-6)
    assert(math.abs(rates("src0") - math.sqrt(50.0 / 600.0)) < 1e-6)
    val kept = Sampling.temperatureSample(skewed, "source", "doc_id", alpha = 0.5)
      .collect()
    val byGroup = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // expected kept ∝ n^alpha = sqrt(n): ~sqrt(600·50)=173, ~sqrt(150·50)=87, 50
    assert(byGroup("src2") == 50)                       // rate 1.0: all kept
    assert(byGroup("src1") > 60 && byGroup("src1") < 115, byGroup.toString)
    assert(byGroup("src0") > 130 && byGroup("src0") < 215, byGroup.toString)
    // alpha=1 keeps everything (no tempering)
    assert(Sampling.temperatureSample(skewed, "source", "doc_id", alpha = 1.0)
      .count() == 800)
    // deterministic: survivors identical across repartitionings
    val again = Sampling.temperatureSample(skewed.repartition(7), "source", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_.getLong(0)).toSet)
    // a null group is a real group: it participates in n_min and gets its
    // own rate (=== null would silently default it to rate 1.0)
    val withNull = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 500L).map(i => (i, null: String)))
      .toDF("doc_id", "source")
    val nullKept = Sampling.temperatureSample(withNull, "source", "doc_id", alpha = 0.5)
      .collect()
    val nullRows = nullKept.filter(_.isNullAt(1))
    assert(nullRows.length == 100)                       // smallest group: all kept
    assert(nullRows.forall(_.getDouble(2) == 1.0))
    val bigKept = nullKept.count(r => !r.isNullAt(1))
    assert(bigKept > 140 && bigKept < 260, s"big group kept $bigKept, want ~200")
    // empty corpus fails loudly, not with empty.min
    val e = intercept[IllegalArgumentException](
      Sampling.temperatureRates(withNull.filter(lit(false)), "source", alpha = 0.5))
    assert(e.getMessage.contains("empty"), e.getMessage)
  }

  test("packSequences: offsets chain contiguously and match the global prefix sum") {
    // small blockSize forces the hierarchical (multi-block) path
    val r = Sampling.packSequences(docs, "doc_id", "text", budget = 64, blockSize = 32L)
      .collect().sortBy(_.getLong(0))
    assert(r.length == 400)
    var cum = 0L
    r.foreach { row =>
      val (start, tok) = (row.getLong(2) * 64 + row.getLong(3), row.getLong(1))
      assert(start == cum, s"doc ${row.getLong(0)} starts at $start, expected $cum")
      cum += tok
    }
    assert(r.map(_.getLong(2)).max == (cum - r.last.getLong(1)) / 64)
  }

  test("curriculum: phases partition by quality quartile, boundaries consistent") {
    import org.apache.spark.sql.functions._
    val got = ops.Sampling.curriculum(
      Tables.documents(spark, TestSpark.sf), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
    assert(got.length == Tables.documents(spark, TestSpark.sf).count())
    assert(got.map(_._3).toSet.subsetOf(Set(1, 2, 3, 4)))
    // monotone: any phase-1 doc has quality >= any phase-4 doc
    val byPhase = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (a <- byPhase.keys; b <- byPhase.keys if a < b)
      assert(byPhase(a).min >= byPhase(b).max - 1e-12,
        s"phase $a min ${byPhase(a).min} < phase $b max ${byPhase(b).max}")
    // quartile-ish sizes: each phase holds >= 10% of docs on this corpus
    byPhase.values.foreach(v => assert(v.length >= got.length / 10))
    // deterministic shuffle key = the shared md5 rule
    got.take(20).foreach { case (id, _, _, k) =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      assert(k == java.lang.Long.parseLong(ref, 16))
    }
  }

  test("pack store: full sequences hold exactly the budget, u2+zstd on disk") {
    import org.apache.spark.sql.functions._
    val cells = SparkEntry.queries("sample_pack_store")(spark, TestSpark.sf)
    val perSeq = cells.groupBy("i").agg(count(lit(1)).as("n"), max(col("j")).as("mj"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxSeq = perSeq.map(_._1).max
    perSeq.foreach { case (i, n, mj) =>
      if (i < maxSeq) assert(n == 512 && mj == 511, s"seq $i holds $n tokens")
      else assert(n <= 512)
    }
    // the artifact on disk really is a v3 uint16 zstd store
    val sfName = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val meta = graft.zarr.Zarr.readMeta(s"${graft.GraftPaths.tmpRoot}/packstore_$sfName")
    assert(meta.dtype == "<u2" && meta.format == 3 && meta.comp == "zstd")
    // token ids are the frequency-rank vocab: 1..V
    val ids = cells.select(col("v").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.head == 1L && ids.last == ids.length,
      s"vocab ids not dense 1..V: ${ids.take(5).mkString(",")}..${ids.last}")
  }

  test("shuffleOrder: a permutation of 1..N, deterministic, salt changes the order") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val n = docs.count()
    def run(salt: String) = ops.Sampling.shuffleOrder(docs, "doc_id", salt)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run("epoch0")
    assert(a.size == n, "every document gets a position")
    assert(a.values.toSeq.sorted == (1L to n).toSeq, "positions are exactly 1..N")
    assert(a == run("epoch0"), "same salt → same order (resharding-stable)")
    val b = run("epoch1")
    assert(b.values.toSeq.sorted == (1L to n).toSeq)
    assert(a != b, "a new salt must give a new epoch order")
  }

  test("shuffleOrder: empty input yields an empty order, not a MatchError") {
    import org.apache.spark.sql.functions.col
    val none = Tables.documents(spark, TestSpark.sf).filter(col("doc_id") < 0)
    assert(ops.Sampling.shuffleOrder(none, "doc_id").count() == 0)
  }

  test("dsirSelect: target-vocabulary docs outrank, exact keepN, deterministic") {
    import spark.implicits._
    // planted corpus: docs 0..9 speak the target vocabulary, 10..29 a
    // disjoint crawl vocabulary, 30..31 mixed
    val mk = (id: Long, words: String) => (id, words)
    val tgtText = "alpha beta gamma alpha beta"
    val crawl = "zork quux blarg zork quux"
    val docs = ((0L until 10L).map(i => mk(i, tgtText)) ++
      (10L until 30L).map(i => mk(i, crawl)) ++
      Seq(mk(30L, "alpha beta zork quux"), mk(31L, "zork zork zork alpha")))
      .toDF("doc_id", "text")
    val target = docs.filter($"doc_id" < 10)
    val out = ops.Sampling.dsirSelect(docs, target, "doc_id", "text", keepN = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 32, "every doc is scored")
    assert(out.values.count(_._2) == 12, "exactly keepN kept")
    // every pure-target doc outscores every pure-crawl doc, the mixed
    // docs land strictly between
    val ts = (0L until 10L).map(out(_)._1).toSet
    val cs = (10L until 30L).map(out(_)._1).toSet
    assert(ts.size == 1 && cs.size == 1, "identical texts score identically")
    assert(ts.head > out(30L)._1 && out(30L)._1 > cs.head,
      s"target ${ts.head} > mixed ${out(30L)._1} > crawl ${cs.head}")
    // the 10 target docs + the 2 mixed docs are exactly the keepers
    assert((0L until 10L).forall(out(_)._2) && out(30L)._2 && out(31L)._2)
    // resharding-stable: a different partitioning computes the same map
    val out2 = ops.Sampling.dsirSelect(docs.repartition(7), target,
        "doc_id", "text", keepN = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == out2)
  }

  test("repeatSample: floor copies everywhere, ceil on the hash fraction, realized mass converges") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i < 500) "a" else "b")).toDF("doc_id", "src")
    val out = ops.Sampling.repeatSample(docs, "src", "doc_id",
      Map("a" -> 250, "b" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    // b: exactly one copy each; a: 2 or 3 copies each
    assert((500L until 1000L).forall(perDoc(_) == 1))
    assert((0L until 500L).forall(i => perDoc(i) == 2 || perDoc(i) == 3))
    // copy indices are 0..n-1 per doc
    out.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.map(_._3).sorted.sameElements(0L until cs.length)) }
    // realized epoch factor for a converges to 2.5 (hash-uniform fraction)
    val aCopies = out.count(_._2 == "a")
    assert(math.abs(aCopies / 500.0 - 2.5) < 0.15, s"a copies: $aCopies")
    // deterministic
    val again = ops.Sampling.repeatSample(docs, "src", "doc_id",
      Map("a" -> 250, "b" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.sorted.sameElements(out.sorted))
    // weight 0 drops the source entirely
    val none = ops.Sampling.repeatSample(docs, "src", "doc_id",
      Map("a" -> 0, "b" -> 100))
    assert(none.filter(col("group_key") === "a").count() == 0)
  }

  test("weightedSample: equals the local A-ES reference; weight raises inclusion") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) 1000L else 10L))
      .toDF("doc_id", "w")
    val got = ops.Sampling.weightedSample(docs, "doc_id", col("w"), n = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact local reference via the shared LnFix twin
    val ref = (0L until 2000L).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = ((h % 1000000L) + 1000000L) % 1000000L + 1
      val ln = graft.functions.LnFix.referenceNegLnMicro(u, 1000001L)
      val w = if (i % 2 == 0) 1000L else 10L
      (i, w, ln * 10000L / w)
    }.sortBy(t => (t._3, t._1)).take(200)
    assert(got.sortBy(t => (t._3, t._1)).sameElements(ref), "must equal local A-ES")
    // the heavy class (100x weight) must dominate the sample
    val heavy = got.count(_._2 == 1000L)
    assert(heavy > 150, s"heavy-weight docs should dominate, got $heavy/200")
  }
}
