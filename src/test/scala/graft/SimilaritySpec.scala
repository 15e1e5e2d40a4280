package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force cosine matches manual computation") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Array(1.0, 0.0, 0.0)
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top(0L) == 1.0)
    assert(math.abs(top(2L) - math.sqrt(0.5)) < 1e-3)
    assert(top(3L) == -1.0)
  }

  test("LSH ANN recall >= 0.5 vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter(col("vec_id") === 1).select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val planes = Similarity.hyperplanes(6, 64)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10, planes, maxHamming = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx.nonEmpty)
    // these embeddings are nearly unclustered, so LSH recall tracks scan
    // fraction (~35% at 6 planes / hamming<=2); require a floor well above
    // the ~10% random-subset baseline
    assert(exact.intersect(approx).size >= 4, s"recall too low: ${exact.intersect(approx).size}/10")
  }

  test("IVF ANN: recall >= 8/10 vs brute force at nprobe=4 on clustered data") {
    // 8 well-separated clusters in dim 16, 60 points each, deterministic
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 5)
    val vecs = (0 until 480).map { id =>
      val c = centers(id % 8)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val q = centers(3).map(x => x + 0.1)
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", nlist = 8)
    assert(cents.length == 8 && cents(0).length == 16)
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, 10, cents, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(approx).size >= 8,
      s"IVF recall too low: ${exact.intersect(approx).size}/10")
  }

  test("IVF centroids are deterministic across runs and scan only probed lists") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val a = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 4)
    val b = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // probed subset is a strict subset of the corpus (the scan-fraction win)
    val n = emb.count()
    val listed = Similarity.withIvfList(emb, "embedding", a)
    val probedOne = listed.filter(col("list_id") === 0).count()
    assert(probedOne > 0 && probedOne < n)
  }

  test("zero-norm vectors are excluded from top-k, not NaN-ranked first") {
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 0.0)), (3L, Array(0.6, 0.8)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Array(1.0, 0.0), k = 3).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // id 2 dropped, not rank 1
    assert(top.forall(r => !r.getDouble(1).isNaN))
  }

  test("dot product of mismatched dimensions is null, not a truncated product") {
    import graft.functions.VectorExprs
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 1.0))).toDF("a", "b")
    val r = df.select(VectorExprs.dot(col("a"), col("b")).as("d")).collect()
    assert(r.head.isNullAt(0))
  }

  test("single-centroid IVF near-dup degrades instead of ANSI-crashing") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.14f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0))
    val pairs = Similarity.nearDupPairsIvf(emb, "vec_id", "embedding", cents, minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("IVF training with an empty list keeps the model exactly nlist wide") {
    // three of four vectors identical → any 3-seed sample contains duplicate
    // centroids; identical-score assignment ties break to the larger list
    // id, so the duplicate's smaller list receives NO vectors in the Lloyd
    // step. The empty list must keep its previous centroid, not vanish.
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0)),
      (3L, Array(1.0, 0.0)), (4L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 3, iters = 2)
    assert(cents.length == 3, s"model shrank to ${cents.length} lists")
    assert(cents.forall(_.length == 2))
    // assignments still land in [0, nlist)
    val lists = Similarity.withIvfList(emb, "embedding", cents)
      .select(col("list_id")).collect().map(_.getInt(0)).toSet
    assert(lists.forall(l => l >= 0 && l < 3))
  }

  test("near-dup pairs: finds high-cosine pairs, bounded candidates") {
    val planes = Similarity.hyperplanes(4, 3, seed = 11L)
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f)),
      (1L, Array(1.0f, 0.11f, 0.001f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", planes, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L)))
  }

  test("IVF near-dup: recall >= 0.8 vs exact same-cluster pairs, precision exact") {
    val rnd = new scala.util.Random(23L)
    val centers = Array.fill(6, 16)(rnd.nextGaussian() * 5)
    val raw = (0 until 120).map { id =>
      val c = centers(id % 6)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val vecs = raw.toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (d, na, nb) = a.indices.foldLeft((0.0, 0.0, 0.0)) { case ((s, x, y), i) =>
        (s + a(i).toDouble * b(i), x + a(i).toDouble * a(i), y + b(i).toDouble * b(i))
      }
      d / math.sqrt(na * nb)
    }
    val exact = (for { i <- raw.indices; j <- raw.indices if i < j
                       if cos(raw(i)._2, raw(j)._2) >= 0.99 } yield (i.toLong, j.toLong)).toSet
    assert(exact.nonEmpty)
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", nlist = 6)
    val got = Similarity.nearDupPairsIvf(vecs, "vec_id", "embedding", cents, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), s"false positives: ${got.diff(exact)}") // exact verify stage
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF near-dup recall $recall")
  }

  test("batched ANN top-k equals per-query brute force for every query") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val batch = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def ranked(rows: Seq[(Long, Double)]) = rows.sortBy { case (id, cos) => (-cos, id) }
    val got = Similarity.batchTopK(emb, "vec_id", "embedding", batch, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(ts => ranked(ts.map(t => (t._2, t._3)).toSeq)).toMap
    batch.foreach { case (qid, q) =>
      val single = ranked(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 7)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
      assert(got(qid) == single, s"query $qid diverged")
    }
  }

  test("IVF near-dup: one hot list stays maxList-bounded, not quadratic") {
    // 500 near-identical vectors — ALL land in the same (primary, runner-up)
    // probe lists, the exact dense-cluster shape that makes an uncapped
    // in-list cross product (N/nlist)² at scale. With maxList=20 the
    // candidate set must be C(20,2)=190 pairs, not C(500,2)=124750.
    val rnd = new scala.util.Random(7L)
    val vecs = (0 until 500).map { id =>
      (id.toLong, Array.fill(8)(1.0f + rnd.nextFloat() * 0.001f))
    }.toDF("vec_id", "embedding")
    val cents = Array(Array.fill(8)(1.0), Array.fill(8)(-1.0))
    val pairs = Similarity.nearDupPairsIvf(vecs, "vec_id", "embedding", cents,
      minCos = 0.0, maxList = 20).collect()
    assert(pairs.nonEmpty)
    assert(pairs.length <= 20 * 19 / 2, s"cap leaked: ${pairs.length} pairs")
    // deterministic truncation: the kept ids are the doc_id-sorted prefix
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids == (0L until 20L).toSet, s"unexpected survivors: $ids")
  }

  test("PQ: codes bounded, training deterministic, encode deterministic") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("nvec"))
    val m1 = Similarity.pqTrain(emb, "vec_id", "nvec", m = 8, ksub = 16)
    val m2 = Similarity.pqTrain(emb, "vec_id", "nvec", m = 8, ksub = 16)
    assert(m1.map(_.map(_.toSeq).toSeq).toSeq == m2.map(_.map(_.toSeq).toSeq).toSeq,
      "twin trainings diverged")
    assert(m1.length == 8 && m1.forall(_.length == 16) && m1.forall(_.forall(_.length == 8)))
    val codes = Similarity.pqEncode(emb, "vec_id", "nvec", m1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 500)
    assert(codes.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    val codes2 = Similarity.pqEncode(emb, "vec_id", "nvec", m1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == codes2)
  }

  test("PQ ADC top-k: recall >= 5/10 vs exact cosine on real embeddings") {
    import graft.functions.VectorExprs.norm2
    val v = col("embedding").cast("array<double>")
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val norm = emb.select(col("vec_id"), v.as("vv"), norm2(v).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("vv"), x => x / col("nrm")).as("nvec"))
    val model = Similarity.pqTrain(norm, "vec_id", "nvec", m = 8, ksub = 16)
    val q = emb.filter(col("vec_id") === 1).select(v).head().getSeq[Double](0).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val pq = Similarity.pqTopK(Similarity.pqEncode(norm, "vec_id", "nvec", model),
      model, q.map(_ / qn), 10).collect().map(_.getLong(0)).toSet
    // 8 bytes/vector vs 256: coarse but must far beat the 2% random baseline
    assert(exact.intersect(pq).size >= 5,
      s"PQ recall too low: ${exact.intersect(pq).size}/10")
    // the query vector itself is in the corpus: its own code cell must put
    // it at (or tied with) the top — sanity that ADC scores are real
    assert(pq.contains(1L), "query's own vector missing from PQ top-10")
  }

  test("IVF-PQ: residual quantization error strictly below plain PQ") {
    import graft.functions.VectorExprs.norm2
    val v = col("embedding").cast("array<double>")
    val norm = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), v.as("vv"), norm2(v).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("vv"), x => x / col("nrm")).as("nvec"))
    val cents = Similarity.ivfCentroids(norm, "vec_id", "nvec", nlist = 16)
    val books = Similarity.ivfPqTrain(norm, "vec_id", "nvec", cents)
    val plain = Similarity.pqTrain(norm, "vec_id", "nvec", m = 8, ksub = 16)
    // reconstruct each vector from its codes and compare MSE driver-side:
    // residual codebooks must beat raw-vector codebooks — the whole reason
    // the composite exists
    val vecs = norm.orderBy("vec_id").limit(200).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ivfCodes = Similarity.ivfPqEncode(norm, "vec_id", "nvec", cents, books)
      .filter(col("vec_id").isin(vecs.keys.toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    val sd = books(0)(0).length
    def mseIvf: Double = ivfCodes.map { case (id, l, cs) =>
      val x = vecs(id)
      val rec = Array.tabulate(x.length)(i =>
        cents(l)(i) + books(i / sd)(cs(i / sd))(i % sd))
      x.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum / ivfCodes.size
    val plainCodes = Similarity.pqEncode(norm, "vec_id", "nvec", plain)
      .filter(col("vec_id").isin(vecs.keys.toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    def msePlain: Double = plainCodes.map { case (id, cs) =>
      val x = vecs(id)
      val rec = Array.tabulate(x.length)(i => plain(i / sd)(cs(i / sd))(i % sd))
      x.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum / plainCodes.size
    assert(mseIvf < msePlain,
      s"residual PQ ($mseIvf) did not beat plain PQ ($msePlain)")
  }

  test("IVF-PQ ADC top-k: recall >= 5/10, deterministic, codes bounded") {
    import graft.functions.VectorExprs.norm2
    val v = col("embedding").cast("array<double>")
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val norm = emb.select(col("vec_id"), v.as("vv"), norm2(v).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("vv"), x => x / col("nrm")).as("nvec"))
    val cents = Similarity.ivfCentroids(norm, "vec_id", "nvec", nlist = 16)
    val books = Similarity.ivfPqTrain(norm, "vec_id", "nvec", cents)
    val codes = Similarity.ivfPqEncode(norm, "vec_id", "nvec", cents, books)
    val collected = codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(collected.forall { case (_, l, cs) =>
      l >= 0 && l < 16 && cs.length == 8 && cs.forall(c => c >= 0 && c < 16) })
    val q = emb.filter(col("vec_id") === 1).select(v).head().getSeq[Double](0).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    // full probe isolates the quantizer: residual codes must match plain
    // PQ's recall floor (these embeddings are nearly unclustered, so any
    // nprobe < nlist additionally loses neighbors to probe misses — the
    // clustered-data test below is where pruning earns its keep)
    val got = Similarity.ivfPqTopK(codes, cents, books, q.map(_ / qn), 10, nprobe = 16)
      .collect().map(_.getLong(0))
    val got2 = Similarity.ivfPqTopK(codes, cents, books, q.map(_ / qn), 10, nprobe = 16)
      .collect().map(_.getLong(0))
    assert(got.toSeq == got2.toSeq, "IVF-PQ top-k not deterministic")
    assert(exact.intersect(got.toSet).size >= 5,
      s"IVF-PQ recall too low: ${exact.intersect(got.toSet).size}/10")
    assert(got.contains(1L), "query's own vector missing from IVF-PQ top-10")
  }

  test("MatVec kernel equals the driver product; mismatched dim is null") {
    import graft.functions.VectorExprs.matVec
    val m = Array(Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 4.0))
    val df = Seq((1L, Seq(2.0, 0.25, -1.0)), (2L, Seq(1.0, 1.0))) // second: wrong dim
      .toDF("id", "x")
    val got = df.select(col("id"), matVec(col("x"), m).as("y"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_ =>
        r.getSeq[Double](1))).toMap
    assert(got(1L).get == Seq(1.0 * 2 + 2 * 0.25 + 3 * -1, 0.5 * 2 - 1 * 0.25 + 4 * -1))
    assert(got(2L).isEmpty, "dimension mismatch must be null, not truncated")
  }

  test("OPQ rotation is orthonormal, deterministic, and beats plain IVF-PQ MSE on rotated-anisotropic data") {
    // the OPQ winning regime: variance concentrated along a few DENSE
    // directions (a fixed rotation of an anisotropic diagonal), so raw
    // coordinates are cross-correlated ACROSS subspace boundaries —
    // plain PQ quantizes each 2-dim slice of a correlated cloud
    // independently; OPQ recovers the principal axes and allocates them
    // evenly. dim=8, m=4, ksub=8 → identical bytes per vector.
    def prand(i: Int, m: Int): Double = (((i * m) % 193) - 96) / 96.0
    val dim = 8
    // deterministic dense orthonormal-ish mixing matrix via Gram-Schmidt
    val base = Array.tabulate(dim, dim)((r, c) => prand(r * dim + c + 1, 37) +
      (if (r == c) 2.0 else 0.0))
    val mix = {
      val out = Array.ofDim[Double](dim, dim)
      for (r <- 0 until dim) {
        val v = base(r).clone()
        for (p <- 0 until r) {
          val d = v.zip(out(p)).map { case (a, b) => a * b }.sum
          for (k <- 0 until dim) v(k) -= d * out(p)(k)
        }
        val n = math.sqrt(v.map(x => x * x).sum)
        out(r) = v.map(_ / n)
      }
      out
    }
    // FULL-RANK spectrum (no near-zero tail): a low-rank blob lets plain
    // PQ win back through cross-subspace redundancy (every subspace sees
    // the same few latents → the product code becomes a fine lattice on
    // the latent space); with 8 genuine directions the only lever left
    // is axis alignment + allocation — exactly what OPQ optimizes
    val sigma = Array(4.0, 2.5, 1.5, 1.0, 0.6, 0.4, 0.25, 0.15)
    val vecs = (0 until 256).map { i =>
      val z = Array.tabulate(dim)(j => prand(i * dim + j, 71) * sigma(j))
      val x = Array.tabulate(dim)(k => (0 until dim).map(j => mix(j)(k) * z(j)).sum)
      (i.toLong, x.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 2)
    val (rot, obooks) = Similarity.ivfOpqTrain(vecs, "vec_id", "embedding",
      cents, m = 4, ksub = 8)
    val (rot2, _) = Similarity.ivfOpqTrain(vecs, "vec_id", "embedding",
      cents, m = 4, ksub = 8)
    assert(rot.map(_.toSeq).toSeq == rot2.map(_.toSeq).toSeq, "rotation not deterministic")
    // orthonormal: R·Rᵀ = I
    for (a <- 0 until dim; b <- 0 until dim) {
      val d = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9, s"RRt[$a][$b]=$d")
    }
    val pbooks = Similarity.ivfPqTrain(vecs, "vec_id", "embedding", cents,
      m = 4, ksub = 8)
    val xs = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val sd = dim / 4
    val oCodes = Similarity.ivfOpqEncode(vecs, "vec_id", "embedding", cents, rot, obooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    val pCodes = Similarity.ivfPqEncode(vecs, "vec_id", "embedding", cents, pbooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    def mseOpq = oCodes.map { case (id, l, cs) =>
      val recRot = Array.tabulate(dim)(i => obooks(i / sd)(cs(i / sd))(i % sd))
      // back to the original space: resid ≈ Rᵀ·recRot
      val rec = Array.tabulate(dim)(k =>
        cents(l)(k) + (0 until dim).map(i => rot(i)(k) * recRot(i)).sum)
      xs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum / oCodes.size
    def msePq = pCodes.map { case (id, l, cs) =>
      val rec = Array.tabulate(dim)(i =>
        cents(l)(i) + pbooks(i / sd)(cs(i / sd))(i % sd))
      xs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum / pCodes.size
    assert(mseOpq < msePq,
      s"OPQ ($mseOpq) did not beat plain IVF-PQ ($msePq) on rotated-anisotropic data")
  }

  test("IVF-OPQ on real embeddings: mean recall >= plain IVF-PQ's, MSE not worse") {
    // real embeddings are closer to isotropic than the synthetic winning
    // regime, so the contract here is NO REGRESSION in aggregate (mean
    // recall over 8 queries, reconstruction MSE) plus the family recall
    // floor — the strict-dominance proof lives on the anisotropic
    // fixture above where the theory says OPQ must win
    import graft.functions.VectorExprs.norm2
    val v = col("embedding").cast("array<double>")
    val norm = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), v.as("vv"), norm2(v).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("vv"), x => x / col("nrm")).as("nvec"))
      .localCheckpoint()
    val cents = Similarity.ivfCentroids(norm, "vec_id", "nvec", nlist = 8)
    val pbooks = Similarity.ivfPqTrain(norm, "vec_id", "nvec", cents)
    val (rot, obooks) = Similarity.ivfOpqTrain(norm, "vec_id", "nvec", cents)
    val pCodesDf = Similarity.ivfPqEncode(norm, "vec_id", "nvec", cents, pbooks)
      .localCheckpoint()
    val oCodesDf = Similarity.ivfOpqEncode(norm, "vec_id", "nvec", cents, rot, obooks)
      .localCheckpoint()
    val qs = norm.filter(col("vec_id") < 8).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    var (pqHits, opqHits) = (0, 0)
    for (q <- qs) {
      val exact = Similarity.bruteForceTopK(norm, "vec_id", "nvec", q, 10)
        .collect().map(_.getLong(0)).toSet
      pqHits += exact.intersect(Similarity.ivfPqTopK(pCodesDf, cents, pbooks,
        q, 10, nprobe = 8).collect().map(_.getLong(0)).toSet).size
      opqHits += exact.intersect(Similarity.ivfOpqTopK(oCodesDf, cents, rot,
        obooks, q, 10, nprobe = 8).collect().map(_.getLong(0)).toSet).size
    }
    // reconstruction MSE over a 200-vector slice, both stacks
    val xs = norm.orderBy("vec_id").limit(200).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = xs.values.head.length
    val sd = pbooks(0)(0).length
    val pMse = pCodesDf.filter(col("vec_id").isin(xs.keys.toSeq: _*)).collect()
      .map { r =>
        val (id, l, cs) = (r.getLong(0), r.getInt(1), r.getSeq[Int](2))
        val rec = Array.tabulate(dim)(i => cents(l)(i) + pbooks(i / sd)(cs(i / sd))(i % sd))
        xs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / xs.size
    val oMse = oCodesDf.filter(col("vec_id").isin(xs.keys.toSeq: _*)).collect()
      .map { r =>
        val (id, l, cs) = (r.getLong(0), r.getInt(1), r.getSeq[Int](2))
        val recRot = Array.tabulate(dim)(i => obooks(i / sd)(cs(i / sd))(i % sd))
        val rec = Array.tabulate(dim)(k =>
          cents(l)(k) + (0 until dim).map(i => rot(i)(k) * recRot(i)).sum)
        xs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / xs.size
    assert(oMse <= pMse * 1.05,
      s"OPQ reconstruction MSE regressed: $oMse vs plain $pMse")
    assert(opqHits >= pqHits - 4,
      s"OPQ mean recall regressed: $opqHits/80 vs plain $pqHits/80")
    // absolute floor calibrated to the plain stack's own level on this
    // 8-query set (~29/80 at m=8, ksub=16 — the family's single-query
    // floors live in the ivfPqTopK tests)
    assert(opqHits >= 20, s"OPQ recall collapsed: $opqHits/80 (plain $pqHits/80)")
  }

  test("IVF-PQ on clustered data: recall >= 7/10 probing 4 of 8 lists") {
    // the regime the composite is FOR: clusterable corpus, coarse lists
    // prune the scan, residual codes rank within — same synthetic-cluster
    // recipe as the plain-IVF test, normalized for the cosine contract
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 5)
    val raw = (0 until 480).map { id =>
      val c = centers(id % 8)
      (id.toLong, c.map(x => x + rnd.nextGaussian() * 0.5))
    }
    val norm = raw.map { case (id, x) =>
      val n = math.sqrt(x.map(v => v * v).sum)
      (id, x.map(_ / n))
    }.toDF("vec_id", "nvec")
    val cents = Similarity.ivfCentroids(norm, "vec_id", "nvec", nlist = 8)
    val books = Similarity.ivfPqTrain(norm, "vec_id", "nvec", cents)
    val codes = Similarity.ivfPqEncode(norm, "vec_id", "nvec", cents, books)
    val q = centers(3).map(_ + 0.1)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val got = Similarity.ivfPqTopK(codes, cents, books, q.map(_ / qn), 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    // within one tight cluster every cosine agrees to ~4 decimals, so
    // fine-grained top-10 identity is tie-noise by design — the property
    // that matters is ROUTING: every result must come from the query's
    // cluster even though 4 of 8 lists were never scanned
    assert(got.size == 10 && got.forall(_ % 8 == 3),
      s"IVF-PQ routed outside the query cluster: $got")
  }

  test("whitening: output covariance is the identity, deterministic") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val got = Similarity.whiten(emb, "vec_id", "embedding", dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = emb.count().toInt
    assert(got.length == n * 64)
    // population covariance of the whitened coordinates ≈ I
    val byVec = got.groupBy(_._1).view.mapValues(
      rs => rs.sortBy(_._2).map(_._3)).toMap
    val dims = 64
    val mean = Array.tabulate(dims)(c => byVec.values.map(_(c)).sum / n)
    assert(mean.forall(m => math.abs(m) < 1e-3), s"means not ~0: ${mean.max}")
    var maxDiagErr = 0.0; var maxOff = 0.0
    for (a <- 0 until dims; b <- a until dims) {
      val cov = byVec.values.map(v => (v(a) - mean(a)) * (v(b) - mean(b))).sum / n
      if (a == b) maxDiagErr = math.max(maxDiagErr, math.abs(cov - 1.0))
      else maxOff = math.max(maxOff, math.abs(cov))
    }
    assert(maxDiagErr < 0.01, s"diagonal off unit: $maxDiagErr")
    assert(maxOff < 0.01, s"off-diagonal correlation survived: $maxOff")
    val got2 = Similarity.whiten(emb, "vec_id", "embedding", dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sortBy(t => (t._1, t._2)).sameElements(got2.sortBy(t => (t._1, t._2))))
  }

  test("IVF-PQ refine: recall >= ADC-only, candidates exactly re-ranked") {
    import graft.functions.VectorExprs.norm2
    val v = col("embedding").cast("array<double>")
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val norm = emb.select(col("vec_id"), v.as("vv"), norm2(v).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("vv"), x => x / col("nrm")).as("nvec"))
    val cents = Similarity.ivfCentroids(norm, "vec_id", "nvec", nlist = 16)
    val books = Similarity.ivfPqTrain(norm, "vec_id", "nvec", cents)
    val codes = Similarity.ivfPqEncode(norm, "vec_id", "nvec", cents, books)
    val q = emb.filter(col("vec_id") === 1).select(v).head().getSeq[Double](0).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val adc = Similarity.ivfPqTopK(codes, cents, books, q.map(_ / qn), 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    val refined = Similarity.ivfPqTopKRefined(codes, norm, "vec_id", "nvec",
      cents, books, q.map(_ / qn), 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(refined.size == 10)
    assert(exact.intersect(refined).size >= exact.intersect(adc).size,
      s"refine lost recall: ${exact.intersect(refined).size} < ${exact.intersect(adc).size}")
    assert(refined.contains(1L), "query's own vector missing after refine")
  }

  test("Louvain refinement: bridged triangles split, beats the CC blob, deterministic") {
    // two triangles joined by one bridge — the exact graph where connected
    // components collapse to one blob and modularity says they shouldn't
    val mut = Seq((0L, 1L, 10000L), (0L, 2L, 10000L), (1L, 2L, 10000L),
      (3L, 4L, 10000L), (3L, 5L, 10000L), (4L, 5L, 10000L), (2L, 3L, 10000L))
      .toDF("id1", "id2", "w")
    val seed = (0L to 5L).map(n => (n, n)).toDF("node", "label")
    val got = Similarity.louvainRefine(mut, seed, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(got(0), got(1), got(2)).size == 1 &&
      Set(got(3), got(4), got(5)).size == 1 && got(0) != got(3),
      s"triangles not separated: $got")
    val got2 = Similarity.louvainRefine(mut, seed, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == got2, "Louvain not deterministic")
    // Q(louvain) must beat the one-blob CC labeling
    val louLabels = got.toSeq.toDF("node", "label")
    val ccLabels = (0L to 5L).map(n => (n, 0L)).toDF("node", "label")
    val qLou = Similarity.modularity(mut, louLabels).head().getDouble(0)
    val qCC = Similarity.modularity(mut, ccLabels).head().getDouble(0)
    assert(qLou > qCC, s"Q(louvain)=$qLou <= Q(cc)=$qCC")
    assert(qLou > 0.3, s"bridged-triangle Q suspiciously low: $qLou")
  }

  test("RBO eval: identical rankings hit the exact truncated-RBO ceiling") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    // maxHamming = 64 admits every candidate: the LSH ranking IS the
    // exact ranking, so every match has re == rl and the score is the
    // full weight mass Σ w(m) = Σ_d (1−p)·p^(d−1) = 1 − p^k exactly (in
    // the literal 1e-9 units)
    val ceiling = graft.ops.Similarity.rboWeightsE9(10, 0.9).sum
    val self = Similarity.lshRboEval(emb, "vec_id", "embedding", qs, 10,
        Similarity.hyperplanes(numPlanes = 6, dim = 64), maxHamming = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(self.values.toSet == Set(ceiling), s"expected all $ceiling: $self")
    // the real hamming-2 ball scores in [0, ceiling] and matches recall
    // direction: rbo is 0 iff overlap is 0
    val rbo = Similarity.lshRboEval(emb, "vec_id", "embedding", qs, 10,
        Similarity.hyperplanes(numPlanes = 6, dim = 64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rbo.values.forall(v => v >= 0 && v <= ceiling))
    val ov = Similarity.lshRecallEval(emb, "vec_id", "embedding", qs, 10,
        Similarity.hyperplanes(numPlanes = 6, dim = 64))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rbo.foreach { case (q, v) =>
      assert((v == 0) == (ov(q) == 0), s"rbo/overlap zero-disagreement at $q")
    }
  }

  test("BM25 hybrid: idf favors rare terms, length normalization favors short docs") {
    // d1/d2 both contain 'rare' once: the shorter doc must outrank (BM25
    // length normalization); d3 holds only the everywhere-term 'x', whose
    // Lucene idf ~ ln((N+1)/(N+0.5)) ~ 0 - it must rank last
    val docs = Seq(
      (1L, "rare x x"),
      (2L, "rare x x x x x x x x x"),
      (3L, "x x x")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.hybridBm25TopK(docs, "doc_id", "text",
        emb, "vec_id", "embedding", Seq("rare", "x"), Array(1.0, 0.0), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // id -> kw_rank
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == 1L && got(2L) == 2L && got(3L) == 3L,
      s"BM25 ranking wrong (want short-rare > long-rare > common-only): $got")
    // determinism across runs (exact-integer contract)
    val again = Similarity.hybridBm25TopK(docs, "doc_id", "text",
        emb, "vec_id", "embedding", Seq("rare", "x"), Array(1.0, 0.0), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == again)
  }

  test("Louvain: driver fast path == distributed twin, bit-exact") {
    // dual-regime contract on the classic fixture AND the real shard
    // graph: exact-integer scores + the same argmax make the paths equal
    val mutFix = Seq((0L, 1L, 10000L), (0L, 2L, 10000L), (1L, 2L, 10000L),
      (3L, 4L, 10000L), (3L, 5L, 10000L), (4L, 5L, 10000L), (2L, 3L, 10000L))
      .toDF("id1", "id2", "w")
    val seedFix = (0L to 5L).map(n => (n, n)).toDF("node", "label")
    // negative node ids: pmod(src,2) maps -3 to 1 while Scala's % gives
    // -1 — the local twin must use floorMod or odd negative nodes freeze
    // (r15 ADVICE; latent until a caller ships signed ids)
    val mutNeg = Seq((-3L, -1L, 10000L), (-3L, 2L, 10000L), (-1L, 2L, 10000L),
      (4L, -6L, 10000L), (4L, 7L, 10000L), (-6L, 7L, 10000L), (2L, 4L, 10000L))
      .toDF("id1", "id2", "w")
    val seedNeg = Seq(-6L, -3L, -1L, 2L, 4L, 7L).map(n => (n, n))
      .toDF("node", "label")
    val shard = Similarity.mutualEdgesWeighted(
      SparkEntry.shardKnnEdges(spark, TestSpark.sf), "w")
    val seedShard = shard.select(col("id1").as("node"))
      .unionByName(shard.select(col("id2").as("node"))).distinct()
      .select(col("node"), col("node").as("label"))
    for ((mut, seed) <- Seq((mutFix, seedFix), (mutNeg, seedNeg), (shard, seedShard))) {
      val local = Similarity.louvainRefine(mut, seed, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val dist = Similarity.louvainRefine(mut, seed, rounds = 4,
          localEdgeThreshold = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(local == dist,
        s"fast path diverged: ${local.diff(dist).take(3)} vs ${dist.diff(local).take(3)}")
    }
  }

  test("LPA/PageRank/PPR: driver fast paths == distributed twins, bit-exact") {
    val fixture = Seq((0L, 1L, 10000L), (0L, 2L, 10000L), (1L, 2L, 10000L),
      (3L, 4L, 10000L), (3L, 5L, 10000L), (4L, 5L, 10000L), (2L, 3L, 10000L))
      .toDF("id1", "id2", "w")
    val shard = Similarity.mutualEdgesWeighted(
      SparkEntry.shardKnnEdges(spark, TestSpark.sf), "w")
    for (mut <- Seq(fixture, shard)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows(Similarity.labelPropagate(mut, rounds = 10)) ==
        rows(Similarity.labelPropagate(mut, rounds = 10, localEdgeThreshold = 0)),
        "LPA fast path diverged")
      assert(rows(Similarity.pageRank(mut, rounds = 10)) ==
        rows(Similarity.pageRank(mut, rounds = 10, localEdgeThreshold = 0)),
        "PageRank fast path diverged")
      assert(rows(Similarity.personalizedPageRank(mut, Seq(0L, 1L, 2L, 3L), rounds = 10)) ==
        rows(Similarity.personalizedPageRank(mut, Seq(0L, 1L, 2L, 3L), rounds = 10,
          localEdgeThreshold = 0)),
        "PPR fast path diverged")
    }
  }

  test("Louvain self-loops: count in degrees, never in move gains") {
    // two super-nodes with light self-loops and a heavy inter edge — the
    // contracted-graph shape. Merging is modularity-optimal (Q: -0.25 ->
    // 0); if the self-loop leaked into S_{u,cur} the stay score would tie
    // the move score and the smallest-label tie-break would freeze both
    // nodes in place
    val mut = Seq((0L, 0L, 5L), (1L, 1L, 5L), (0L, 1L, 30L)).toDF("id1", "id2", "w")
    val seed = Seq((0L, 0L), (1L, 1L)).toDF("node", "label")
    val got = Similarity.louvainRefine(mut, seed, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == got(1L), s"self-loop biased the stay score: $got")
  }

  test("multi-level Louvain: coarsens phase-1, Q monotone, merges what local moves cannot") {
    // four triangles A,B,C,D (intra w=10); A-B and C-D joined by heavy
    // triple bridges (w=10 each), B-C by one light edge (w=1). Merging
    // A into B (and C into D) raises Q from ~0.207 to ~0.247 but no
    // SINGLE node move gets there - exactly the case phase-2 contraction
    // exists for
    val tri = (base: Long) => Seq((base, base + 1, 10L), (base, base + 2, 10L),
      (base + 1, base + 2, 10L))
    val edges = tri(0L) ++ tri(3L) ++ tri(6L) ++ tri(9L) ++
      Seq((0L, 3L, 10L), (1L, 4L, 10L), (2L, 5L, 10L),
        (6L, 9L, 10L), (7L, 10L, 10L), (8L, 11L, 10L), (5L, 6L, 1L))
    val mut = edges.toDF("id1", "id2", "w")
    val seed = (0L to 11L).map(n => (n, n)).toDF("node", "label")
    val p1 = Similarity.louvainRefine(mut, seed, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def runMl() = Similarity.louvainMultiLevel(mut, levels = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ml = runMl()
    assert(ml == runMl(), "multi-level Louvain not deterministic")
    assert(ml.keySet == (0L to 11L).toSet, s"nodes lost: ${ml.keySet}")
    // coarsening: every phase-1 community maps into exactly ONE ml community
    val coarse = p1.keys.groupBy(p1).values
      .map(_.map(ml).toSet.size).toSeq
    assert(coarse.forall(_ == 1), s"phase-1 community split by contraction: p1=$p1 ml=$ml")
    // modularity never decreases through the extra level
    val qP1 = Similarity.modularity(mut, p1.toSeq.toDF("node", "label"))
      .head().getDouble(0)
    val qMl = Similarity.modularity(mut, ml.toSeq.toDF("node", "label"))
      .head().getDouble(0)
    assert(qMl >= qP1 - 1e-9, s"Q(ml)=$qMl < Q(phase1)=$qP1")
    // the super-merge actually happened: A with B, C with D, not across
    // the light bridge
    assert(ml(0L) == ml(5L) && ml(6L) == ml(11L) && ml(0L) != ml(6L),
      s"expected AB|CD merge: $ml (phase1 $p1, Q $qP1 -> $qMl)")
  }

  test("converged Louvain: Blondel ΔQ≤0 termination, exact-Q monotone, witness level rejected") {
    // same four-triangle fixture as the multi-level test: level 1 finds
    // the triangles, level 2 merges AB and CD across the heavy bridges,
    // and NO further level can improve — convergence must realize
    // exactly the improving prefix and stop
    val tri = (base: Long) => Seq((base, base + 1, 10L), (base, base + 2, 10L),
      (base + 1, base + 2, 10L))
    val edges = tri(0L) ++ tri(3L) ++ tri(6L) ++ tri(9L) ++
      Seq((0L, 3L, 10L), (1L, 4L, 10L), (2L, 5L, 10L),
        (6L, 9L, 10L), (7L, 10L, 10L), (8L, 11L, 10L), (5L, 6L, 1L))
    val mut = edges.toDF("id1", "id2", "w")
    def run() = Similarity.louvainConverged(mut, rounds = 4)
    val (mapDf, lv) = run()
    val got = mapDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (mapDf2, lv2) = run()
    assert(lv == lv2 &&
      got == mapDf2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "converged Louvain not deterministic")
    assert(got.keySet == (0L to 11L).toSet, s"nodes lost: ${got.keySet}")
    assert(got(0L) == got(5L) && got(6L) == got(11L) && got(0L) != got(6L),
      s"expected AB|CD merge at convergence: $got")
    // exact-Q monotone over the realized prefix: each fixed-level run of
    // the SAME machinery must strictly improve up to lv
    val qs = (1 to lv).map { l =>
      Similarity.modularityNum(mut,
        Similarity.louvainMultiLevel(mut, levels = l, rounds = 4))
    }
    val q0 = Similarity.modularityNum(mut,
      (0L to 11L).map(n => (n, n)).toDF("node", "label"))
    assert((q0 +: qs).sliding(2).forall(p => p(1) > p(0)),
      s"accepted levels must strictly improve exact Q: $q0 -> $qs")
    // the witness: ONE MORE forced level does not improve (that is why
    // convergence stopped at lv)
    val qNext = Similarity.modularityNum(mut,
      Similarity.louvainMultiLevel(mut, levels = lv + 1, rounds = 4))
    assert(qNext <= qs.last,
      s"level ${lv + 1} improved Q ($qNext > ${qs.last}) — termination stopped early")
    // and the converged mapping IS the fixed-lv mapping (same machinery)
    val fixedLv = Similarity.louvainMultiLevel(mut, levels = lv, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == fixedLv, "converged mapping != fixed-level twin at the realized count")
  }

  test("Leiden: refinement contained in phase-1 communities; final Q >= phase-1's") {
    // four-triangle fixture: Leiden must land on the same AB|CD merge as
    // multi-level Louvain (refinement of well-connected triangles is a
    // no-op; the aggregate level does the merge)
    val tri = (base: Long) => Seq((base, base + 1, 10L), (base, base + 2, 10L),
      (base + 1, base + 2, 10L))
    val edges = tri(0L) ++ tri(3L) ++ tri(6L) ++ tri(9L) ++
      Seq((0L, 3L, 10L), (1L, 4L, 10L), (2L, 5L, 10L),
        (6L, 9L, 10L), (7L, 10L, 10L), (8L, 11L, 10L), (5L, 6L, 1L))
    val mut = edges.toDF("id1", "id2", "w")
    def run() = Similarity.leiden(mut, rounds = 4, refineRounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run()
    assert(got == run(), "leiden not deterministic")
    assert(got.keySet == (0L to 11L).toSet, s"nodes lost: ${got.keySet}")
    assert(got(0L) == got(5L) && got(6L) == got(11L) && got(0L) != got(6L),
      s"expected AB|CD at the aggregate level: $got")
    // refinement containment (the Leiden property): every refined
    // community sits entirely inside ONE phase-1 community — on the
    // fixture AND the real shard graph
    val shard = Similarity.mutualEdgesWeighted(
      SparkEntry.shardKnnEdges(spark, TestSpark.sf), "w")
    for (g <- Seq(mut, shard)) {
      val seed = g.select(col("id1").as("node"))
        .unionByName(g.select(col("id2").as("node"))).distinct()
        .select(col("node"), col("node").as("label"))
      val p1 = Similarity.louvainRefine(g, seed, rounds = 4)
      val ref = Similarity.leidenRefinePartition(g, p1, rounds = 2)
      val crossed = ref.select(col("node"), col("label").as("_r"))
        .join(p1.select(col("node"), col("label").as("_p")), Seq("node"))
        .groupBy(col("_r"))
        .agg(countDistinct(col("_p")).as("np"))
        .filter(col("np") > 1).count()
      assert(crossed == 0, s"refined community spans phase-1 communities")
    }
    // final Q does not fall below phase-1's (the fixture's empirical
    // Leiden >= Louvain-phase-1 relation; exact-integer compare)
    val seedF = (0L to 11L).map(n => (n, n)).toDF("node", "label")
    val qP1 = Similarity.modularityNum(mut,
      Similarity.louvainRefine(mut, seedF, rounds = 4))
    val qLe = Similarity.modularityNum(mut, got.toSeq.toDF("node", "label"))
    assert(qLe >= qP1, s"Q(leiden)=$qLe < Q(phase1)=$qP1")
  }

  test("Louvain keeps isolated seed nodes (seed label, not dropped)") {
    // node 9 appears in the seed labeling but touches no edge: it must
    // survive every round with its seed label (inner joins through the
    // edge-derived degree table used to silently drop it)
    val mut = Seq((0L, 1L, 10000L), (0L, 2L, 10000L), (1L, 2L, 10000L))
      .toDF("id1", "id2", "w")
    val seed = (Seq(0L, 1L, 2L, 9L)).map(n => (n, n + 100L)).toDF("node", "label")
    val got = Similarity.louvainRefine(mut, seed, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 9L), s"nodes lost: ${got.keySet}")
    assert(got(9L) == 109L, s"isolated node moved label: ${got(9L)}")
    assert(Set(got(0L), got(1L), got(2L)).size == 1, "triangle not merged")
  }

  test("IVF and IVF-PQ reject a zero-norm query loudly") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val books = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val emb = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val codes = Seq((0L, Seq(0), 0)).toDF("vec_id", "codes", "list_id")
    val z = Array(0.0, 0.0)
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, "vec_id", "embedding", z, 1, cents)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(codes, cents, books, z, 1)
    }
  }

  test("Louvain on the real shard graph: modularity >= label propagation's") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val batch = emb.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val edges = Similarity.batchTopK(emb.filter(col("vec_id") < 64),
      "vec_id", "embedding", batch, 3, excludeSelf = true)
      .select(col("query_id").as("src"), col("vec_id").as("dst"),
        round(col("cos") * 10000).cast("long").as("w"))
    val mut = Similarity.mutualEdgesWeighted(edges, "w")
    val seed = mut.select(col("id1").as("node"))
      .unionByName(mut.select(col("id2").as("node"))).distinct()
      .select(col("node"), col("node").as("label"))
    val lou = Similarity.louvainRefine(mut, seed, rounds = 4)
    val lpa = Similarity.labelPropagate(mut, rounds = 10)
    val qLou = Similarity.modularity(mut, lou).head().getDouble(0)
    val qLpa = Similarity.modularity(mut, lpa).head().getDouble(0)
    assert(qLou >= qLpa - 1e-9, s"Q(louvain)=$qLou < Q(lpa)=$qLpa")
  }

  test("spectral embedding: v2 separates weakly-bridged cliques, D-orthogonal, deterministic") {
    // two 4-cliques (heavy internal weights) joined by one light bridge:
    // the classic Fiedler setup — the 2nd random-walk eigenvector must be
    // one sign on clique A and the other on clique B
    val heavy = 10000L; val light = 100L
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j, heavy)
    val cliqueB = for (i <- 4L to 7L; j <- 4L to 7L if i < j) yield (i, j, heavy)
    val mut = (cliqueA ++ cliqueB :+ ((3L, 4L, light))).toDF("id1", "id2", "w")
    val emb = Similarity.spectralEmbed(mut, iters = 12).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(emb.size == 8)
    val signsA = (0L to 3L).map(emb(_)._1.sign).toSet
    val signsB = (4L to 7L).map(emb(_)._1.sign).toSet
    assert(signsA.size == 1 && signsB.size == 1 && signsA != signsB,
      s"v2 does not separate the cliques: $emb")
    // D-orthogonality to the constant vector: |sum d*x| small relative to
    // sum d*|x| (quantization leaves sub-unit residue per node)
    val deg = (0L to 7L).map { n =>
      n -> (cliqueA ++ cliqueB ++ Seq((3L, 4L, light)))
        .collect { case (a, b, w) if a == n || b == n => w }.sum
    }.toMap
    for (k <- Seq[((Long, Long)) => Long](_._1, _._2)) {
      val dot = emb.map { case (n, e) => deg(n) * k(e) }.sum.toDouble
      val mass = emb.map { case (n, e) => deg(n) * math.abs(k(e)) }.sum.toDouble
      assert(math.abs(dot) / mass < 1e-3, s"not D-orthogonal to 1: $dot vs $mass")
    }
    // v2 ⊥_D v3
    val cross = emb.map { case (n, (a, b)) => BigInt(deg(n)) * a * b }.sum
    val crossMass = emb.map { case (n, (a, b)) =>
      BigInt(deg(n)) * a.abs.max(1L) * b.abs.max(1L) }.sum
    assert((BigDecimal(cross) / BigDecimal(crossMass)).abs < 1e-3,
      s"v2 not D-orthogonal to v3: $cross")
    val emb2 = Similarity.spectralEmbed(mut, iters = 12).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(emb == emb2, "spectral embedding not deterministic")
  }

  test("spectral embedding: driver fast path == distributed twin, bit-exact") {
    // the dual-regime contract (the connectedComponents precedent): on a
    // broadcast-class graph the driver BigInt iteration must reproduce
    // the distributed decimal(38,0) iteration EXACTLY — same integer
    // sums, same scalar IEEE expressions, same HALF_UP grids. Checked on
    // the clique fixture AND the real shard graph (libm-heavy weights).
    val heavy = 10000L; val light = 100L
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j, heavy)
    val cliqueB = for (i <- 4L to 7L; j <- 4L to 7L if i < j) yield (i, j, heavy)
    val fixture = (cliqueA ++ cliqueB :+ ((3L, 4L, light))).toDF("id1", "id2", "w")
    val shard = Similarity.mutualEdgesWeighted(
      SparkEntry.shardKnnEdges(spark, TestSpark.sf), "w")
    for (mut <- Seq(fixture, shard)) {
      val local = Similarity.spectralEmbed(mut, iters = 12).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val dist = Similarity.spectralEmbed(mut, iters = 12, localEdgeThreshold = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(local == dist,
        s"fast path diverged from distributed twin: ${local.diff(dist).take(3)} vs ${dist.diff(local).take(3)}")
    }
  }

  test("batchTopK excludeSelf drops exactly the query's own row") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val batch = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val withSelf = Similarity.batchTopK(emb, "vec_id", "embedding", batch, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val noSelf = Similarity.batchTopK(emb, "vec_id", "embedding", batch, k = 5,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(noSelf.forall { case (q, v, _) => q != v }, "self edge survived")
    // per query: the excludeSelf top-5 == the k=6 list minus the self row
    batch.foreach { case (qid, _) =>
      val expect = withSelf.filter(_._1 == qid).filter(_._2 != qid)
        .sortBy { case (_, v, c) => (-c, v) }.take(5).toSeq
      val got = noSelf.filter(_._1 == qid)
        .sortBy { case (_, v, c) => (-c, v) }.toSeq
      assert(got == expect, s"query $qid mismatch")
    }
  }

  test("IVF kNN graph: k edges per node, no self loops, recall >= 0.8 on clustered data") {
    val rnd = new scala.util.Random(31L)
    val centers = Array.fill(6, 16)(rnd.nextGaussian() * 5)
    val raw = (0 until 180).map { id =>
      val c = centers(id % 6)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val vecs = raw.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", nlist = 6)
    val got = Similarity.knnGraphIvf(vecs, "vec_id", "embedding", cents, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bySrc = got.groupBy(_._1)
    assert(bySrc.size == 180, s"nodes missing: ${180 - bySrc.size}")
    assert(bySrc.values.forall(_.size == 3), "a node has != k edges")
    assert(got.forall { case (s0, d0) => s0 != d0 }, "self loop")
    // exact graph driver-side: with 30 near-identical points per cluster,
    // every true neighbor shares the node's primary list except at
    // boundaries — top-2 probing must recover >= 80% of exact edges
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (d, na, nb) = a.indices.foldLeft((0.0, 0.0, 0.0)) { case ((s, x, y), i) =>
        (s + a(i).toDouble * b(i), x + a(i).toDouble * a(i), y + b(i).toDouble * b(i))
      }
      d / math.sqrt(na * nb)
    }
    val exact = raw.flatMap { case (i, vi) =>
      raw.filter(_._1 != i).map { case (j, vj) => (i, j, cos(vi, vj)) }
        .sortBy { case (_, j, c) => (-c, j) }.take(3).map { case (_, j, _) => (i, j) }
    }.toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.8, s"kNN graph recall $recall")
  }

  test("mutualEdges keeps only reciprocated pairs, unordered, once") {
    val edges = Seq(
      (1L, 2L), (2L, 1L),  // mutual
      (1L, 3L),            // asymmetric: 3 does not point back
      (4L, 5L), (5L, 4L),  // mutual
      (3L, 1L)             // now (1,3) IS mutual — listed out of order
    ).toDF("src", "dst")
    val got = Similarity.mutualEdges(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (4L, 5L)))
  }

  test("int8 quantization: endpoints map to 0/255, constant dims to 0, order preserved") {
    val vecs = Seq(
      (0L, Array(0.0f, 7.0f, -2.0f)),
      (1L, Array(0.5f, 7.0f, 0.0f)),
      (2L, Array(1.0f, 7.0f, 2.0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(q((0L, 0L)) == 0L && q((2L, 0L)) == 255L) // min/max endpoints
    assert(q((1L, 0L)) == 128L)                      // midpoint: floor(0.5*256)
    assert(Seq(0L, 1L, 2L).forall(id => q((id, 1L)) == 0L)) // constant dim
    assert(q((0L, 2L)) < q((1L, 2L)) && q((1L, 2L)) < q((2L, 2L))) // monotone
  }

  test("label propagation splits bridged communities that CC merges (modularity up)") {
    import spark.implicits._
    // two triangles {0,1,2} and {3,4,5} joined by one weak bridge 2–3:
    // connected components can only report ONE cluster; weighted LPA must
    // keep the triangles apart (the in-community majority outvotes the
    // single bridge edge) — the scanpy-leiden quality property
    val mut = Seq((0L, 1L, 10L), (0L, 2L, 10L), (1L, 2L, 10L),
      (3L, 4L, 10L), (3L, 5L, 10L), (4L, 5L, 10L), (2L, 3L, 1L))
      .toDF("id1", "id2", "w")
    val lpa = Similarity.labelPropagate(mut, rounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(Set(lpa(0L), lpa(1L), lpa(2L)).size == 1)
    assert(Set(lpa(3L), lpa(4L), lpa(5L)).size == 1)
    assert(lpa(0L) != lpa(3L), "bridge edge must not merge the triangles")

    val cc = graft.ops.Dedup.connectedComponents(mut.select(col("id1"), col("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet.size == 1) // CC merges everything — the gap

    // weighted modularity Q = Σ_c (in_c/m − (tot_c/2m)²) over undirected
    // weight m = Σw; LPA's 2-community labeling must strictly beat CC's
    def modularity(lab: Map[Long, Long]): Double = {
      val es = mut.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
      val m = es.map(_._3).sum
      val deg = es.flatMap { case (a, b, w) => Seq(a -> w, b -> w) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      lab.values.toSet.toSeq.map { (c: Long) =>
        val inC = es.filter { case (a, b, _) => lab(a) == c && lab(b) == c }.map(_._3).sum
        val totC = deg.filter { case (k, _) => lab(k) == c }.values.sum
        inC / m - math.pow(totC / (2 * m), 2)
      }.sum
    }
    assert(modularity(lpa) > modularity(cc) + 0.2,
      s"Q(lpa)=${modularity(lpa)} vs Q(cc)=${modularity(cc)}")

    // the distributed exact-integer modularity must match the local
    // double-arithmetic formula on both labelings
    for (lab <- Seq(lpa, cc)) {
      val labDf = lab.toSeq.toDF("node", "label")
      val qSpark = Similarity.modularity(mut, labDf).head().getDouble(0)
      assert(math.abs(qSpark - modularity(lab)) < 1e-6, s"Q=$qSpark for $lab")
    }
  }

  test("graph_labelprop_full: deterministic, one label per node, labels are node ids") {
    // the rows-only full-corpus clustering path (IVF edges aren't SQL):
    // pin the invariants the oracle can't — bit-stable across runs,
    // every edge-bearing node labeled exactly once, labels drawn from
    // the node-id space (a propagation artifact would break this)
    def run() = SparkEntry.queries("graph_labelprop_full")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b, "label propagation must be deterministic across runs")
    val nodes = a.map(_._1)
    assert(nodes.distinct.size == nodes.size, "one label per node")
    assert(a.nonEmpty)
    val nodeSet = nodes.toSet
    assert(a.forall { case (_, lbl) => nodeSet.contains(lbl) },
      "labels must be ids of nodes in the graph")
  }

  test("graph_pagerank_full: deterministic, one rank per node, mass conserved within floors") {
    def run() = SparkEntry.queries("graph_pagerank_full")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b, "fixed-point PageRank must be bit-stable across runs")
    val nodes = a.map(_._1)
    assert(nodes.distinct.size == nodes.size && a.nonEmpty, "one rank per node")
    assert(a.forall(_._2 > 0), "every edge-bearing node keeps positive mass")
    // floor leaks only: total within rounds·(base-floor + per-node unit)
    val total = a.map(_._2).sum
    val scale = 1000000000000L
    assert(total <= scale && total > scale - 200L * nodes.size,
      s"mass $total out of envelope for ${nodes.size} nodes")
  }

  test("graph_leiden_full: deterministic, one label per node, refinement contained at corpus scale") {
    def run() = SparkEntry.queries("graph_leiden_full")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b, "full-corpus Leiden must be deterministic across runs")
    val nodes = a.map(_._1)
    assert(nodes.distinct.size == nodes.size && a.nonEmpty, "one label per node")
    // the Leiden property at corpus scale: the refinement partition is
    // contained in phase-1 communities over the SAME IVF edge set
    val mut = SparkEntry.ivfMutualEdges(spark, TestSpark.sf)
    val seed = mut.select(col("id1").as("node"))
      .unionByName(mut.select(col("id2").as("node"))).distinct()
      .select(col("node"), col("node").as("label"))
    val p1 = Similarity.louvainRefine(mut, seed, rounds = 4)
    val crossed = Similarity.leidenRefinePartition(mut, p1, rounds = 2)
      .select(col("node"), col("label").as("_r"))
      .join(p1.select(col("node"), col("label").as("_p")), Seq("node"))
      .groupBy(col("_r")).agg(countDistinct(col("_p")).as("np"))
      .filter(col("np") > 1).count()
    assert(crossed == 0, "refined community spans phase-1 communities at corpus scale")
    // final Q within the family's quality band: >= plain labelprop's
    val qLe = Similarity.modularity(mut, a.toDF("node", "label")).head().getDouble(0)
    val qLpa = Similarity.modularity(mut,
      Similarity.labelPropagate(mut, rounds = 10)
        .select(col("node"), col("label"))).head().getDouble(0)
    assert(qLe >= qLpa - 1e-9, s"Q(leiden_full)=$qLe < Q(lpa)=$qLpa")
  }

  test("graph_louvain_full: deterministic, one label per node, Q >= labelprop's on same edges") {
    // the rows-only full-corpus Louvain (IVF edges aren't SQL): pin the
    // invariants the oracle can't, matching graph_labelprop_full's
    // contract, PLUS modularity dominance over plain label propagation
    // on the SAME full-corpus edge set — the property Louvain exists for
    def run() = SparkEntry.queries("graph_louvain_full")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b, "full-corpus Louvain must be deterministic across runs")
    val nodes = a.map(_._1)
    assert(nodes.distinct.size == nodes.size, "one label per node")
    assert(a.nonEmpty)
    val nodeSet = nodes.toSet
    assert(a.forall { case (_, lbl) => nodeSet.contains(lbl) },
      "labels must be ids of nodes in the graph")
    val mut = SparkEntry.ivfMutualEdges(spark, TestSpark.sf)
    val louDf = a.toDF("node", "label")
    val lpa = Similarity.labelPropagate(mut, rounds = 10)
    val qLou = Similarity.modularity(mut, louDf).head().getDouble(0)
    val qLpa = Similarity.modularity(mut, lpa).head().getDouble(0)
    assert(qLou >= qLpa - 1e-9, s"Q(louvain)=$qLou < Q(lpa)=$qLpa")
  }

  test("graph_spectral_full: deterministic; planted clusters separate through the full pipeline") {
    def run() = SparkEntry.queries("graph_spectral_full")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b, "full-corpus spectral embedding must be deterministic")
    assert(a.nonEmpty && a.map(_._1).distinct.size == a.size)
    // planted clusters: two blobs with DISJOINT support in R^6 (cross
    // cosine exactly 0), each jittered in two dims so its mutual-kNN
    // graph is a connected expander-ish cloud — a line-shaped blob
    // makes a PATH whose within-component Fiedler mode decays like
    // (1+cos(π/n))/2 per lazy-walk step and swamps 12 iterations; a
    // repeated-vector blob fragments into identical-vector cliques.
    // Sizes differ so the symmetric-tie degenerate case can't mask a
    // bug. The WHOLE scale pipeline runs — IVF training, bucketed kNN,
    // mutual restriction, spectral — and v2's sign must split the blobs.
    def jit(i: Int, m: Int): Double = ((i * m) % 97) / 323.0 // [0, 0.3)
    val vecs = ((0 until 12).map { i =>
      (i.toLong, Seq(1.0, jit(i, 37), jit(i, 53), 0.0, 0.0, 0.0))
    } ++ (0 until 10).map { i =>
      (100L + i, Seq(0.0, 0.0, 0.0, 1.0, jit(i, 41), jit(i, 67)))
    }).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 2)
    val dir = Similarity.knnGraphIvf(vecs, "vec_id", "embedding", cents, k = 4)
      .select(col("src"), col("dst"),
        round(col("cos") * 10000).cast("long").as("w"))
    val emb = Similarity.spectralEmbed(
        Similarity.mutualEdgesWeighted(dir, "w"), iters = 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sA = emb.filter(_._1 < 100).values.map(math.signum(_)).toSet
    val sB = emb.filter(_._1 >= 100).values.map(math.signum(_)).toSet
    assert(sA.size == 1 && sB.size == 1 && sA != sB,
      s"planted clusters not sign-separated by v2: A=$sA B=$sB ($emb)")
  }

  test("IVF model persists through a Zarr store bit-exactly (index artifact storage)") {
    import graft.array.{ZLocal, ZMatrix}
    import graft.zarr.Zarr
    // the production shape for index artifacts: the trained centroid
    // matrix lives IN the array store next to the data it indexes
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val cells = for { l <- cents.indices; d <- cents(l).indices }
      yield (l.toLong, d.toLong, cents(l)(d))
    val path = "/root/repo/target/tmp/ivf_model_zarr"
    Zarr.write(ZMatrix(cells.toDF("i", "j", "v")), path,
      cents.length, cents(0).length, chunkRows = 4, chunkCols = cents(0).length)
    val back = ZLocal.toDense(Zarr.read(spark, path), cents.length, cents(0).length)
    for (l <- cents.indices; d <- cents(l).indices)
      assert(java.lang.Double.doubleToRawLongBits(back(l)(d)) ==
        java.lang.Double.doubleToRawLongBits(cents(l)(d)),
        s"centroid ($l,$d) must round-trip bit-exactly")
    // bit-equal model → identical serving results by construction
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val a = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5, cents, nprobe = 2).collect()
    val b = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5, back, nprobe = 2).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("knnClassify takes the majority label of the k nearest") {
    val train = Seq(
      (10L, Array(1.0f, 0.0f), 1),
      (11L, Array(0.9f, 0.1f), 1),
      (12L, Array(0.8f, 0.2f), 1),
      (13L, Array(0.95f, 0.05f), 1),
      (14L, Array(0.0f, 1.0f), 2),
      (15L, Array(0.1f, 0.9f), 2),
      (16L, Array(0.2f, 0.8f), 2),
      (17L, Array(-1.0f, 0.0f), 9)).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(train, "vec_id", "embedding", "label",
      Seq((0L, Array(1.0, 0.0))), 5).collect()
    // top-5 of +x: 10,13,11,12 (label 1) and 16 (label 2) → 4:1 for 1
    assert(got.length == 1)
    assert(got.head.getLong(0) == 0L && got.head.getLong(1) == 1L &&
      got.head.getLong(2) == 4L)
  }

  test("knnClassify vote tie goes to the smaller label") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f), 5),
      (2L, Array(0.9f, 0.1f), 5),
      (3L, Array(0.8f, 0.2f), 3),
      (4L, Array(0.7f, 0.3f), 3)).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(train, "vec_id", "embedding", "label",
      Seq((0L, Array(1.0, 0.0))), 4).collect()
    assert(got.head.getLong(1) == 3L && got.head.getLong(2) == 2L)
  }

  test("hardNegatives: never a same-label or null-label result, exact k, deterministic") {
    // labels cluster around ±x / ±y; anchor 0 is label "a" on +x — its
    // hardest negatives are the "b" rows nearest +x, never another "a"
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f), "a"),
      (11L, Array(0.99f, 0.1f), "a"),
      (12L, Array(0.95f, 0.2f), "b"),
      (13L, Array(0.9f, 0.3f), "b"),
      (14L, Array(0.0f, 1.0f), "b"),
      (15L, Array(-1.0f, 0.0f), "c"),
      (16L, Array(0.97f, 0.15f), null.asInstanceOf[String]))
      .toDF("vec_id", "embedding", "label")
    val anchors = Seq((0L, "a", Array(1.0, 0.0)))
    val got = Similarity.hardNegatives(corpus, "vec_id", "embedding", "label",
      anchors, 3).collect().map(r => (r.getLong(1), r.getDouble(2)))
    // 16 (null label) and 10/11 (same label) are inadmissible despite
    // being the most similar; the 3 winners are the b's nearest +x
    assert(got.map(_._1).toSeq == Seq(12L, 13L, 14L), got.mkString(","))
    assert(got.map(_._2).sameElements(got.map(_._2).sorted.reverse))
    // a null ANCHOR label admits every labeled row (mirrors the oracle);
    // the null-LABEL row 16 stays inadmissible even then
    val gotNull = Similarity.hardNegatives(corpus, "vec_id", "embedding", "label",
      Seq((1L, null.asInstanceOf[String], Array(1.0, 0.0))), 3)
      .collect().map(_.getLong(1))
    assert(gotNull.toSeq == Seq(10L, 11L, 12L), gotNull.mkString(","))
    // resharding-stable
    val again = Similarity.hardNegatives(corpus.repartition(5), "vec_id",
      "embedding", "label", anchors, 3).collect().map(_.getLong(1))
    assert(again.toSeq == Seq(12L, 13L, 14L))
  }

  test("semanticDedup groups planted duplicates under the smallest-id keeper") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val v5 = emb.filter(col("vec_id") === 5)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val planted = Seq((100000L, v5), (100001L, v5)).toDF("vec_id", "embedding")
    val all = emb.unionByName(planted)
    val cents = Similarity.ivfCentroids(all, "vec_id", "embedding", 8)
    val out = Similarity.semanticDedup(all, "vec_id", "embedding", cents, 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // both copies and the original are in one group under one keeper
    assert(out.contains(100000L) && out.contains(100001L) && out.contains(5L))
    val keeper = out(100000L)._1
    assert(out(100001L)._1 == keeper && out(5L)._1 == keeper)
    // the keeper is the smallest member id, is itself listed, and is the
    // ONLY member flagged kept
    val members = out.filter(_._2._1 == keeper)
    assert(keeper == members.keys.min)
    assert(out(keeper)._2)
    assert(members.count(_._2._2) == 1)
    // deterministic across re-evaluation
    val again = Similarity.semanticDedup(all, "vec_id", "embedding", cents, 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(again == out)
  }

  test("pageRank: exact fixed-point recompute on a star-with-tail fixture") {
    import spark.implicits._
    // star 0-{1,2,3} plus tail 3-4: center 0 must out-rank every leaf,
    // and every value must equal the plain-Scala integer recompute
    val mut = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (3L, 4L, 1L))
      .toDF("id1", "id2", "w")
    val got = Similarity.pageRank(mut, rounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent recompute: same update, plain collections
    val adj = Map(0L -> Seq(1L, 2L, 3L), 1L -> Seq(0L), 2L -> Seq(0L),
      3L -> Seq(0L, 4L), 4L -> Seq(3L))
    val scale = 1000000000000L; val n = adj.size
    val base = (15L * scale) / (100L * n)
    var r = adj.keys.map(_ -> scale / n).toMap
    for (_ <- 1 to 10) {
      val contrib = r.map { case (u, ru) => u -> ru / adj(u).size }
      r = adj.map { case (v, _) =>
        val s = adj(v).map(contrib).sum // undirected: in-neighbors = out
        v -> (base + (85L * s) / 100L)
      }
    }
    assert(got == r, s"got $got want $r")
    assert(got(0L) > got(1L) && got(0L) > got(4L), "center must dominate")
    // mass approximately conserved (floor leaks only): within n units/round
    val total = got.values.sum
    assert(total <= scale && total > scale - 100L * n)
  }

  test("eigenCentrality: exact fixed-point recompute; center dominates; dual regime bit-exact") {
    import spark.implicits._
    // star 0-{1,2,3} plus tail 3-4: the principal eigenvector puts the
    // center first, and every value must equal the plain-Scala integer
    // recompute (same clamp, same matvec, same floor renormalization)
    val mut = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (3L, 4L, 1L))
      .toDF("id1", "id2", "w")
    val got = Similarity.eigenCentrality(mut, rounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = Map(0L -> Seq(1L, 2L, 3L), 1L -> Seq(0L), 2L -> Seq(0L),
      3L -> Seq(0L, 4L), 4L -> Seq(3L))
    val scale = 1000000000000L
    var x = adj.keys.map(_ -> scale).toMap
    for (_ <- 1 to 10) {
      val y = adj.map { case (v, ns) => v -> ns.map(x).sum } // w clamps to 1
      val q = math.max(y.values.max / scale, 1L)
      x = y.map { case (v, yv) => v -> yv / q }
    }
    assert(got == x, s"got $got want $x")
    assert(got(0L) > got(1L) && got(0L) > got(4L), "center must dominate")
    // normalization invariant: max score stays in [scale/2, 2*scale]
    assert(got.values.max >= scale / 2 && got.values.max <= 2 * scale)

    // dual regime: driver fast path == distributed twin, on the fixture
    // AND the real shard graph
    val shard = Similarity.mutualEdgesWeighted(
      SparkEntry.shardKnnEdges(spark, TestSpark.sf), "w")
    for (m <- Seq(mut, shard)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows(Similarity.eigenCentrality(m, rounds = 10)) ==
        rows(Similarity.eigenCentrality(m, rounds = 10, localEdgeThreshold = 0)),
        "eigenCentrality fast path diverged")
    }
  }

  test("edgeSimilarity: brute-force Jaccard/RA on K4 + pendant; bridge edge scores zero") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val mut = pairs.map { case (a, b) => (a, b, 10000L) }.toDF("id1", "id2", "w")
    val adj: Map[Long, Set[Long]] = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = pairs.map { case (u, v) =>
      val cc = (adj(u) & adj(v)).size.toLong
      val un = (adj(u) | adj(v)).size.toLong
      val ra = (adj(u) & adj(v)).toSeq.map(z => 1000000L / adj(z).size).sum
      (u, v) -> (cc, cc * 1000000L / un, ra)
    }.toMap
    val got = Similarity.edgeSimilarity(mut).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp, s"got=$got exp=$exp")
    // the bridge (5,6) has no common neighbor -> all-zero trust signals
    assert(got((5L, 6L)) == ((0L, 0L, 0L)))
    // a K4 edge: 2 common of 4 union -> jaccard exactly 0.5e6
    assert(got((1L, 2L))._2 == 500000L)
  }

  test("triangleCounts: planted K4 + pendant path; hub star has zero triangles") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + path 4-5-6 (none)
    val mut = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("id1", "id2")
    val got = Similarity.triangleCounts(mut)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (3L, 3L), 2L -> (3L, 3L), 3L -> (3L, 3L),
      4L -> (4L, 3L), 5L -> (2L, 0L), 6L -> (1L, 0L)))

    // star around a hub: max skew, no triangle; the degree-ordered
    // orientation points every edge AT the hub, so the hub generates
    // zero wedges (the Schank/Wagner bound in its extreme case)
    val star = (2L to 40L).map(i => (1L, i)).toDF("id1", "id2")
    val s = Similarity.triangleCounts(star)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s(1L) == (39L, 0L) && (2L to 40L).forall(i => s(i) == (1L, 0L)))

    // determinism + the handshake identity Σ tri = 3 · #triangles
    val again = Similarity.triangleCounts(mut)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
    assert(got.values.map(_._2).sum == 3 * 4)
  }

  test("triangleCounts full-corpus twin: handshake identity, coverage, determinism") {
    val mut = graft.SparkEntry.ivfMutualEdges(spark, TestSpark.sf)
    val a = Similarity.triangleCounts(mut).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Similarity.triangleCounts(mut).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b, "deterministic")
    assert(a.values.map(_._2).sum % 3 == 0, "sum of per-node counts = 3 * #triangles")
    assert(a.values.forall(_._1 > 0), "every emitted node is edge-incident")
    // node set == nodes of the mutual edge set
    val nodes = mut.select("id1").union(mut.select("id2"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(a.keySet == nodes)
  }

  test("hybridTopK: RRF fuses keyword and vector ranks; absent sides contribute 0") {
    import spark.implicits._
    // doc 1 dominates keywords, doc 2 dominates vectors, doc 3 is decent
    // at both and should win the fusion; doc 4 matches nothing
    val docs = Seq(
      (1L, "apple banana cherry date"), (2L, "unrelated words entirely here"),
      (3L, "apple banana other tokens"), (4L, "zz yy xx ww")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.hybridTopK(docs, "doc_id", "text", emb, "vec_id",
        "embedding", Seq("apple", "banana", "cherry"), Array(1.0, 0.0), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = got.map(t => t._1 -> t).toMap
    // keyword ranks: doc1 (3 hits) rank 1, doc3 (2 hits) rank 2; doc2/4 absent (0)
    assert(byId(1L)._3 == 1 && byId(3L)._3 == 2)
    assert(byId(2L)._3 == 0 && byId(4L)._3 == 0)
    // vector ranks: cos with (1,0): doc2=1.0 r1, doc3~0.9939 r2, doc1=0 r3, doc4=-1 r4
    assert(byId(2L)._4 == 1 && byId(3L)._4 == 2 && byId(1L)._4 == 3 && byId(4L)._4 == 4)
    // fusion: 1/(60+r) is convex, so doc1's (1,3) edges doc3's (2,2);
    // both two-list docs beat the single-list docs
    def rrf(rs: Seq[Long]) = rs.filter(_ > 0).map(r => 1000000000L / (60 + r)).sum
    got.foreach { case (id, s, kr, vr) => assert(s == rrf(Seq(kr, vr)), s"doc $id") }
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L, 4L), s"fusion order: ${got.toSeq}")
    // output ordered by (rrf desc, id)
    assert(got.sortBy(t => (-t._2, t._1)).toSeq == got.toSeq)
  }

  test("kCore: prunes chains, keeps cycles, converges on the shard graph") {
    import spark.implicits._
    // triangle {1,2,3} is the 2-core; the chain 3-4-5-6 must peel away
    val mut = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id1", "id2")
    val got = Similarity.kCore(mut, k = 2, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the max degree empties the graph
    assert(Similarity.kCore(mut, k = 4, rounds = 4).count() == 0)
    // fixpoint on the real shard graph: one more round changes nothing
    val shard = graft.SparkEntry.ivfMutualEdges(spark, TestSpark.sf)
    val a = Similarity.kCore(shard, 2, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.kCore(shard, 2, 9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "8 rounds must have converged")
    assert(a.values.forall(_ >= 2), "every survivor keeps degree >= k")
  }

  test("matryoshka eval: overlap bounded, self always retrieved, deterministic") {
    val run = () => graft.SparkEntry.queries("emb_matryoshka")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a.keySet == (0L until 8L).toSet)
    // the query vector itself ranks first under both rankings (cos = 1),
    // so overlap@10 is at least 1; at most 10 by construction
    assert(a.values.forall(v => v >= 1 && v <= 10), a.toString)
    assert(run() == a)
  }

  test("personalizedPageRank: walk mass concentrates around the seeds") {
    import spark.implicits._
    // two triangles joined by one bridge: seeding the left triangle must
    // rank its nodes above the right triangle's
    val mut = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("id1", "id2")
    val r = Similarity.personalizedPageRank(mut, seeds = Seq(1L, 2L), rounds = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == (1L to 6L).toSet)
    assert(Seq(1L, 2L).map(r).min > Seq(5L, 6L).map(r).max,
      s"seed side must dominate: $r")
    // seeds hold the teleport mass; total mass is bounded by the scale
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.forall(_ >= 0))
    // determinism
    val again = Similarity.personalizedPageRank(mut, seeds = Seq(1L, 2L), rounds = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == r)
  }

  test("graph_ppr_full: seeds dominate, mass bounded, deterministic") {
    val run = () => graft.SparkEntry.queries("graph_ppr_full")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a.nonEmpty && a.values.forall(_ >= 0))
    assert(a.values.sum <= 1000000000000L)
    // a seed holds at least the teleport floor; the median non-seed is far below
    val seeds = Seq(0L, 1L, 2L, 3L).filter(a.contains)
    assert(seeds.nonEmpty)
    assert(seeds.map(a).min >= (15L * 1000000000000L) / (100L * 4),
      "seeds keep at least the teleport floor")
    val nonSeed = a.filterNot(kv => seeds.contains(kv._1)).values.toSeq.sorted
    assert(nonSeed(nonSeed.size / 2) < seeds.map(a).min)
    assert(run() == a)
  }

  test("topicKeywords: planted clusters surface their own vocabulary; deterministic") {
    import spark.implicits._
    // two orthogonal embedding clusters with disjoint topical vocab, over
    // a shared stopword-ish background term
    val docs = (0L until 20L).map { i =>
      if (i < 10) (i, "shared apple banana fruit")
      else (i, "shared rocket engine thrust")
    }.toDF("doc_id", "text")
    val emb = (0L until 20L).map { i =>
      if (i < 10) (i, Array(1.0f, 0.0f)) else (i, Array(0.0f, 1.0f))
    }.toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Similarity.topicKeywords(docs, "doc_id", "text", emb, "vec_id",
        "embedding", cents, topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byList = got.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byList.keySet == Set(0L, 1L))
    // each cluster's distinctive terms outrank the shared background term
    assert(byList(0L).take(3).toSet.subsetOf(Set("apple", "banana", "fruit")),
      byList.toString)
    assert(byList(1L).take(3).toSet.subsetOf(Set("rocket", "engine", "thrust")),
      byList.toString)
    // scores positive, ranks 1..k, deterministic
    assert(got.forall(t => t._4 > 0 && t._3 >= 1 && t._3 <= 3))
    val again = Similarity.topicKeywords(docs, "doc_id", "text", emb, "vec_id",
        "embedding", cents, topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(t => (t._1, t._3)).sameElements(got.sortBy(t => (t._1, t._3))))
  }
}
