package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.array.{ZLocal, ZMatrix}
import graft.zarr.Zarr

/** Property-based checks: distributed results must equal a straightforward
  * local reference on arbitrary inputs, not just the fixtures. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic sample stream from a Gen (no scalatest-scalacheck
    * bridge in the offline cache — plain sampling works just as well). */
  private def forAll[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var produced = 0
    var i = 0
    while (produced < n && i < n * 20) {
      g.apply(params, Seed(42L + i)).foreach { v => body(v); produced += 1 }
      i += 1
    }
    assert(produced == n, s"generator under-produced: $produced/$n")
  }

  private val matrixGen: Gen[Array[Array[Double]]] = for {
    r <- Gen.choose(1, 8)
    c <- Gen.choose(1, 6)
    cells <- Gen.listOfN(r * c, Gen.choose(-50, 50).map(_.toDouble))
  } yield cells.grouped(c).map(_.toArray).toArray

  test("property: axis sums match local reference") {
    forAll(matrixGen) { (dense: Array[Array[Double]]) =>
      val m = ZMatrix.fromDense(spark, dense)
      val rows = dense.length; val cols = dense(0).length
      val gotCols = m.sumAxis0.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for (j <- 0 until cols)
        assert(gotCols(j.toLong) == dense.map(_(j)).sum)
      val gotRows = m.sumAxis1.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for (i <- 0 until rows)
        assert(gotRows(i.toLong) == dense(i).sum)
    }
  }

  test("property: transpose twice is identity; gram is symmetric") {
    forAll(matrixGen) { (dense: Array[Array[Double]]) =>
      val m = ZMatrix.fromDense(spark, dense)
      val rows = dense.length; val cols = dense(0).length
      val tt = ZLocal.toDense(m.transpose.transpose, rows, cols)
      assert(tt.map(_.toSeq).toSeq == dense.map(_.toSeq).toSeq)
      val g = ZLocal.toDense(m.gram, cols, cols)
      for (a <- 0 until cols; b <- 0 until cols)
        assert(math.abs(g(a)(b) - g(b)(a)) < 1e-9)
    }
  }

  test("property: matmul matches local reference") {
    forAll(matrixGen) { (dense: Array[Array[Double]]) =>
      val m = ZMatrix.fromDense(spark, dense)
      val cols = dense(0).length
      val g = ZLocal.toDense(m.gram, cols, cols)
      for (a <- 0 until cols; b <- 0 until cols) {
        val expect = dense.map(row => row(a) * row(b)).sum
        assert(g(a)(b) == expect, s"gram($a,$b)")
      }
    }
  }

  test("property: zarr roundtrip over random shapes and chunkings") {
    val shapeGen = for {
      r <- Gen.choose(1, 12); c <- Gen.choose(1, 9)
      cr <- Gen.choose(1, r); cc <- Gen.choose(1, c)
      zlib <- Gen.oneOf(true, false)
    } yield (r, c, cr, cc, zlib)
    forAll(shapeGen) { (t: (Int, Int, Int, Int, Boolean)) =>
      val (r, c, cr, cc, zlib) = t
      val dense = Array.tabulate(r, c)((i, j) => (i * 31 + j * 7).toDouble)
      val path = s"/root/repo/target/tmp/zarr_prop"
      Zarr.write(ZMatrix.fromDense(spark, dense), path, r, c, cr, cc, zlib)
      val back = ZLocal.toDense(Zarr.read(spark, path), r, c)
      assert(back.map(_.toSeq).toSeq == dense.map(_.toSeq).toSeq,
        s"shape=($r,$c) chunks=($cr,$cc) zlib=$zlib")
    }
  }

  test("property: minhash similarity tracks true Jaccard on perturbed docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    // replace a prefix of tokens -> controlled overlap
    val docs = (0 to 4).map { k =>
      val toks = base.split(" ").zipWithIndex
        .map { case (t, idx) => if (idx < k * 12) s"alt${idx}_$k" else t }
      (k.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 32, bandsN = 16, shingle = 3, minJaccard = 0.0)
      .filter(col("id1") === 0L)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // jaccard(0, k) decreases in k; heavily-overlapping pairs must be found
    assert(pairs.contains(1L) && pairs(1L) > 0.5)
    if (pairs.contains(2L)) assert(pairs(1L) > pairs(2L))
  }
}
