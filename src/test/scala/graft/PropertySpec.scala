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

  test("property: rank-N zarr roundtrip over random rank, shape, chunking, format") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val ndGen = for {
      rank <- Gen.choose(1, 4)
      shape <- Gen.listOfN(rank, Gen.choose(1, 7))
      chunks <- Gen.sequence[List[Int], Int](shape.map(s => Gen.choose(1, s)))
      zlib <- Gen.oneOf(true, false)
      format <- Gen.oneOf(2, 3)
      nested <- Gen.oneOf(true, false)
    } yield (shape.map(_.toLong), chunks, zlib, format, nested)
    forAll(ndGen, n = 8) { (t: (List[Long], List[Int], Boolean, Int, Boolean)) =>
      val (shape, chunks, zlib, format, nested) = t
      val rank = shape.length
      // every cell set, deterministic values keyed by the coordinate
      def cellsOf(prefix: List[Long]): Iterator[List[Long]] =
        if (prefix.length == rank) Iterator.single(prefix)
        else (0L until shape(prefix.length)).iterator.flatMap(i => cellsOf(prefix :+ i))
      val rows = cellsOf(Nil).map { c =>
        Row.fromSeq(c :+ c.zipWithIndex.map { case (v, d) => v * (d + 3) }.sum.toDouble)
      }.toSeq
      val schema = StructType(
        (0 until rank).map(d => StructField(s"i$d", LongType, nullable = false)) :+
          StructField("v", DoubleType, nullable = false))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val path = s"/root/repo/target/tmp/zarrnd_prop"
      graft.zarr.ZarrNd.write(df, path, shape, chunks,
        zlib = zlib, nested = nested, format = format)
      val cols = (0 until rank).map(d => s"i$d")
      val back = graft.zarr.ZarrNd.read(spark, path)
        .orderBy(cols.head, cols.tail: _*).collect()
      val want = df.orderBy(cols.head, cols.tail: _*).collect()
      assert(back.sameElements(want),
        s"rank=$rank shape=$shape chunks=$chunks zlib=$zlib fmt=$format nested=$nested")
    }
  }

  test("property: store metadata round-trips across the full option matrix") {
    // pure metadata write→parse, no Spark jobs — the net over this round's
    // JSON serialization rewrite (Jackson parse, per-dtype/non-finite
    // fill literals, key encodings)
    val metaGen = for {
      format <- Gen.oneOf(2, 3)
      dtype <- Gen.oneOf(Zarr.Dtypes.toSeq)
      zlib <- Gen.oneOf(true, false)
      intDtype = Set("i8", "i4", "i2", "i1", "u2", "u1").contains(dtype.substring(1))
      unsigned = dtype.substring(1).startsWith("u")
      fill <- if (dtype.endsWith("b1")) Gen.oneOf(0.0, 1.0)
              else if (unsigned) Gen.oneOf(0.0, 7.0)
              else if (intDtype) Gen.oneOf(0.0, 7.0, -3.0)
              else Gen.oneOf(0.0, 7.5, -1.25, Double.NaN,
                Double.PositiveInfinity, Double.NegativeInfinity)
      rank1 <- Gen.oneOf(true, false)
      fOrder <- if (format == 3 && !rank1) Gen.oneOf(true, false) else Gen.const(false)
      sharded <- if (format == 3 && !rank1) Gen.oneOf(true, false) else Gen.const(false)
      cr <- Gen.oneOf(4, 6, 8)
      cc <- if (rank1) Gen.const(1) else Gen.oneOf(4, 6)
    } yield Zarr.Meta(20, if (rank1) 1 else 10, cr, cc, zlib, fill, dtype, format,
      innerRows = if (sharded) 2 else 0, innerCols = if (sharded) 2 else 0,
      fOrder = fOrder, keyEnc = Zarr.writeKeyEnc(format), rank1 = rank1)
    forAll(metaGen, n = 25) { (m: Zarr.Meta) =>
      val path = "/root/repo/target/tmp/zarr_prop_meta"
      Zarr.writeMetaFile(path, m)
      // v2 stores must not be mistaken for v3: drop any stale zarr.json
      if (m.format == 2) Zarr.delete(s"$path/zarr.json")
      val r = Zarr.readMeta(path)
      def sameFill = r.fill == m.fill || (r.fill.isNaN && m.fill.isNaN)
      assert(r.copy(fill = 0.0) == m.copy(fill = 0.0) && sameFill,
        s"wrote $m, read $r")
    }
  }

  test("property: blosc frames round-trip; foreign multi-block frames decode in any block order") {
    import java.nio.{ByteBuffer, ByteOrder}
    import graft.zarr.Blosc
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    // a c-blosc-1.x-shaped frame: typesize splits per block, blocks laid
    // out in an ARBITRARY permutation (multithreaded writers append by
    // completion order), bstarts pointing wherever each block landed
    def cblosc(raw: Array[Byte], typesize: Int, blocksize: Int,
               order: Seq[Int]): Array[Byte] = {
      val nblocks = (raw.length + blocksize - 1) / blocksize
      val blocks = (0 until nblocks).map { b =>
        val bsize = math.min(blocksize, raw.length - b * blocksize)
        val blockRaw = java.util.Arrays.copyOfRange(raw, b * blocksize, b * blocksize + bsize)
        val nsplits = if (typesize > 1 && bsize % typesize == 0) typesize else 1
        val shuf = if (nsplits > 1) Blosc.shuffle(blockRaw, typesize) else blockRaw
        val neblock = bsize / nsplits
        val out = new java.io.ByteArrayOutputStream()
        (0 until nsplits).foreach { s0 =>
          val split = java.util.Arrays.copyOfRange(shuf, s0 * neblock, (s0 + 1) * neblock)
          val max = lz4.maxCompressedLength(neblock)
          val tmp = new Array[Byte](max)
          val n = lz4.compress(split, 0, neblock, tmp, 0, max)
          val (payload, len) = if (n < neblock) (tmp, n) else (split, neblock)
          val hdr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(len).array()
          out.write(hdr); out.write(payload, 0, len)
        }
        (b, out.toByteArray, nsplits)
      }
      // every block must agree on its split hypothesis for the shuffle flag
      val shuffled = blocks.forall(_._3 > 1)
      val bstart0 = 16 + 4 * nblocks
      val bstarts = new Array[Int](nblocks)
      var off = bstart0
      order.foreach { b => bstarts(b) = off; off += blocks(b)._2.length }
      val frame = ByteBuffer.allocate(off).order(ByteOrder.LITTLE_ENDIAN)
      frame.put(2.toByte).put(1.toByte)
        .put(((if (shuffled) 0x1 else 0x0) | (1 << 5)).toByte).put(typesize.toByte)
      frame.putInt(raw.length).putInt(blocksize).putInt(off)
      bstarts.foreach(frame.putInt)
      order.foreach(b => frame.put(blocks(b)._2))
      frame.array()
    }
    val caseGen = for {
      typesize <- Gen.oneOf(1, 2, 4, 8)
      nblocks <- Gen.choose(1, 4)
      blockElems <- Gen.choose(2, 16)
      compressible <- Gen.oneOf(true, false)
      seed <- Gen.choose(0, 10000)
    } yield (typesize, nblocks, blockElems, compressible, seed)
    forAll(caseGen, n = 12) { case (typesize, nblocks, blockElems, compressible, seed) =>
      val blocksize = blockElems * typesize
      val total = blocksize * nblocks
      val rnd = new scala.util.Random(seed)
      val raw = if (compressible) Array.tabulate(total)(i => (i / typesize % 5).toByte)
                else Array.fill(total)(rnd.nextInt().toByte)
      // our own writer round-trips...
      assert(Blosc.decompress(Blosc.compress(raw, typesize), total).toSeq == raw.toSeq)
      // ...and foreign frames decode under EVERY block permutation
      val orders = if (nblocks == 1) Seq(Seq(0))
        else Seq((0 until nblocks), (0 until nblocks).reverse,
          rnd.shuffle((0 until nblocks).toVector))
      orders.foreach { ord =>
        val frame = cblosc(raw, typesize, blocksize, ord)
        assert(Blosc.decompress(frame, total).toSeq == raw.toSeq,
          s"typesize=$typesize nblocks=$nblocks order=$ord")
      }
    }
  }

  test("property: bitshuffle matches the naive bit-matrix transpose and inverts") {
    import graft.zarr.Blosc
    // independent definition: transpose the (elements × bits-per-element)
    // matrix; bit index within element = memory order (byte, then LSB-first
    // bit); planes packed by element index LSB-first; tail copies verbatim
    def naive(in: Array[Byte], t: Int): Array[Byte] = {
      val m = { val n0 = in.length / t; n0 - (n0 % 8) }
      val out = new Array[Byte](in.length)
      val nbits = 8 * t
      for (b <- 0 until nbits; e <- 0 until m) {
        val bit = (in(e * t + b / 8) >> (b % 8)) & 1
        if (bit == 1) {
          val pos = b * m + e
          out(pos / 8) = (out(pos / 8) | (1 << (pos % 8))).toByte
        }
      }
      System.arraycopy(in, m * t, out, m * t, in.length - m * t)
      out
    }
    val caseGen = for {
      t <- Gen.oneOf(1, 2, 3, 4, 8)
      elems <- Gen.choose(0, 40) // includes non-multiples of 8 → tail path
      tail <- Gen.choose(0, 2) // sub-element remainder bytes
      seed <- Gen.choose(0, 100000)
    } yield (t, elems, tail, seed)
    forAll(caseGen, n = 30) { case (t, elems, tail, seed) =>
      val rnd = new scala.util.Random(seed)
      val in = Array.fill(elems * t + tail)(rnd.nextInt().toByte)
      val shuf = Blosc.bitshuffle(in, t)
      assert(shuf.toSeq == naive(in, t).toSeq,
        s"staged != naive for t=$t elems=$elems tail=$tail")
      assert(Blosc.bitunshuffle(shuf, t).toSeq == in.toSeq,
        s"roundtrip failed for t=$t elems=$elems tail=$tail")
    }
  }

  test("property: blosclz streams decode (hand-crafted + encoder roundtrip)") {
    import graft.zarr.Blosc
    def decode(stream: Array[Byte], outLen: Int): Array[Byte] = {
      val dst = new Array[Byte](outLen)
      val n = Blosc.blosclzDecompress(stream, 0, stream.length, dst, 0, outLen)
      assert(n == outLen, s"decoded $n of $outLen")
      dst
    }
    // overlapping near match: "abc" + match(distance 3, length 6)
    val abc = decode(Array[Byte](2, 'a'.toByte, 'b'.toByte, 'c'.toByte,
      (4 << 5).toByte, 2), 9)
    assert(new String(abc, "ASCII") == "abcabcabc")
    // distance-1 RLE run: 'x' then run of 7 → 8 x's
    val xs = decode(Array[Byte](0, 'x'.toByte, (5 << 5).toByte, 0), 8)
    assert(new String(xs, "ASCII") == "x" * 8)
    // extended length: run of 13 via length-field 7 + extension byte 4
    val ys = decode(Array[Byte](0, 'y'.toByte, (7 << 5).toByte, 4, 0), 14)
    assert(new String(ys, "ASCII") == "y" * 14)
    // far match: 8400 literals then a 5-byte match at distance 8300
    locally {
      val body = Array.tabulate(8400)(i => (i % 251).toByte)
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < body.length) { // 32-literal runs
        val n = math.min(32, body.length - i)
        out.write(n - 1); out.write(body, i, n); i += n
      }
      out.write((3 << 5) | 31); out.write(255) // far-match escape
      val far = 8300 - 8192
      out.write(far >> 8); out.write(far & 0xFF)
      val got = decode(out.toByteArray, 8405)
      assert(got.slice(0, 8400).toSeq == body.toSeq)
      assert(got.slice(8400, 8405).toSeq == body.slice(100, 105).toSeq,
        "far match copied from the wrong offset")
    }
    // encoder (fixture helper) roundtrips arbitrary runs-heavy payloads
    val caseGen = for {
      n <- Gen.choose(1, 600)
      runiness <- Gen.oneOf(1, 3, 17)
      seed <- Gen.choose(0, 100000)
    } yield (n, runiness, seed)
    forAll(caseGen, n = 25) { case (n, runiness, seed) =>
      val rnd = new scala.util.Random(seed)
      val raw = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val b = rnd.nextInt(4).toByte
        val run = 1 + rnd.nextInt(runiness * 8)
        var k = 0
        while (k < run && i < n) { raw(i) = b; i += 1; k += 1 }
      }
      val enc = ZarrSpec.blosclzEncode(raw)
      assert(decode(enc, n).toSeq == raw.toSeq, s"n=$n runiness=$runiness")
    }
  }

  test("property: vlen string vectors round-trip arbitrary unicode/gaps/chunkings") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(1, 24)
      chunk <- Gen.choose(1, 7)
      comp <- Gen.oneOf("", "blosc", "zlib")
      format <- Gen.oneOf(2, 3)
      present <- Gen.listOfN(n, Gen.oneOf(true, false))
      // strings across the hazard classes: empty, multi-byte unicode,
      // separators, long runs
      texts <- Gen.listOfN(n, Gen.oneOf(
        Gen.const(""), Gen.alphaNumStr.map(_.take(12)),
        Gen.const("你好✓β"), Gen.const("a,b\"c\nd"),
        Gen.choose(1, 50).map("x" * _)))
    } yield (n, chunk, comp, format, present, texts)
    forAll(caseGen, n = 10) { case (n, chunk, comp, format, present, texts) =>
      val rows = (0 until n).filter(present(_)).map(i => (i.toLong, texts(i)))
      val df = rows.toDF("i", "s")
      val path = "/root/repo/target/tmp/zarr_prop_str"
      Zarr.writeStringVector(df, path, n.toLong, chunk,
        zlib = comp == "zlib", format = format,
        comp = if (comp == "blosc") "blosc" else "")
      val back = Zarr.readStringVector(spark, path).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = (0 until n).map(i =>
        i.toLong -> (if (present(i)) texts(i) else "")).toMap
      assert(back == expect,
        s"n=$n chunk=$chunk comp=$comp format=$format")
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

  test("property: chunking covers every token exactly once per stride window") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      size <- Gen.choose(2, 12)
      overlap <- Gen.choose(0, size - 1)
    } yield (n, size, overlap)
    forAll(gen, n = 8) { case (n, size, overlap) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = graft.ops.TextOps.chunk(df, "doc_id", "text", size, overlap)
        .collect().sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getString(2).split(" ").filter(_.nonEmpty)))
      val stride = size - overlap
      // every chunk k starts at token k*stride and has the declared shape
      chunks.foreach { case (k, toks) =>
        assert(toks.headOption.contains(s"t${k * stride}"), s"chunk $k start")
        assert(toks.length <= size)
      }
      // union of chunks covers all n tokens; last chunk reaches the end
      assert(chunks.flatMap(_._2).toSet == (0 until n).map(i => s"t$i").toSet)
      assert(chunks.last._2.last == s"t${n - 1}")
    }
  }

  test("property: hashSplit is a partition and quota/mix are subsets with stable membership") {
    import spark.implicits._
    forAll(Gen.choose(50, 300), n = 4) { n =>
      val docs = (0L until n.toLong).map(i => (i, s"g${i % 3}", "x"))
        .toDF("doc_id", "source", "text")
      val split = graft.ops.Sampling.hashSplit(docs, "doc_id").collect()
      assert(split.length == n && split.map(_.getLong(0)).distinct.length == n)
      val quota = graft.ops.Sampling.quotaSample(docs, "source", "doc_id", 7)
      assert(quota.groupBy("group_key").count().collect()
        .forall(_.getLong(1) <= 7L))
      val mixed = graft.ops.Sampling.mixSample(docs, "source", "doc_id", Map("g1" -> 0.5))
        .collect().map(_.getLong(0)).toSet
      assert(mixed.subsetOf((0L until n.toLong).toSet))
      // repartitioned input -> identical survivor set (resharding stability)
      val again = graft.ops.Sampling.mixSample(docs.repartition(7), "source", "doc_id",
        Map("g1" -> 0.5)).collect().map(_.getLong(0)).toSet
      assert(again == mixed)
    }
  }

  test("property: sharded and unsharded v3 zarr stores read back identically") {
    val gen = for {
      rows <- Gen.choose(3, 20)
      cols <- Gen.choose(2, 10)
    } yield (rows, cols)
    forAll(gen, n = 4) { case (rows, cols) =>
      val dense = Array.tabulate(rows, cols)((i, j) => (i * 31 + j * 7 % 5).toDouble)
      val m = ZMatrix.fromDense(spark, dense)
      val p1 = s"/root/repo/target/tmp/prop_zarr_plain_${rows}_$cols"
      val p2 = s"/root/repo/target/tmp/prop_zarr_shard_${rows}_$cols"
      Zarr.write(m, p1, rows, cols, 4, cols, format = 3)
      Zarr.write(m, p2, rows, cols, 4, cols, format = 3, innerRows = 2, innerCols = cols)
      val a = ZLocal.toDense(Zarr.read(spark, p1), rows, cols)
      val b = ZLocal.toDense(Zarr.read(spark, p2), rows, cols)
      assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
      assert(a.map(_.toSeq).toSeq == dense.map(_.toSeq).toSeq)
    }
  }

  /** Adversarial text: whitespace variants (incl. VT/FF/CR), marker words,
    * fragments that embed markers, punctuation, unicode (accents, CJK, an
    * astral emoji), underscores and digits — concatenated WITHOUT
    * guaranteed separators so tokens fuse across piece boundaries. */
  private val textGen: Gen[String] = {
    val pieces = Gen.oneOf(
      " ", "\t", "\n", "\u000B", "\f", "\r", "  ", "the", "and", "la",
      "und", "est", "el", "mit", "thé", "_x", "99", "a", "bb", "The",
      "AND", ".,!?;:", "..", "中文", "🎉", "é", "x_y", "theand", "of!")
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, pieces).map(_.mkString))
  }

  test("property: text kernels equal their regex/array reference forms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.TextOps
    forAll(Gen.listOfN(40, textGen), n = 3) { (texts: List[String]) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val t = col("text")
      val (dw, db) = TextOps.repetitionRatioCols(t)
      val (dwR, dbR) = TextOps.repetitionRatioColsRef(t)
      val rows = df.select(
          TextOps.langIdCol(t), TextOps.langIdColRegex(t),
          TextOps.qualityCol(t), TextOps.qualityColRef(t),
          dw, dwR, db, dbR).collect()
      rows.zip(texts).foreach { case (r, txt) =>
        assert(r.getString(0) == r.getString(1), s"langid on ${txt.take(40)}")
        assert(r.getAs[Any](2) == r.getAs[Any](3), s"quality on ${txt.take(40)}")
        assert(r.getDouble(4) == r.getDouble(5), s"dup_word on ${txt.take(40)}")
        assert(r.getDouble(6) == r.getDouble(7), s"dup_bigram on ${txt.take(40)}")
      }
      val fast = graft.ops.Dedup.minhashSignatures(df, "doc_id", "text", 8, 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ref = graft.ops.Dedup.minhashSignaturesAgg(df, "doc_id", "text", 8, 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      for (id <- fast.keys)
        assert(fast(id) == ref(id), s"minhash on ${texts(id.toInt).take(40)}")
    }
  }

  test("property: regressOut equals the local closed-form OLS on random matrices") {
    import org.apache.spark.sql.functions.col
    // integer-valued cells keep the moment sums exact — the operator's
    // own determinism precondition, so the property tests the real contract
    forAll(matrixGen) { (dense: Array[Array[Double]]) =>
      val rows = dense.length
      val x = dense.map(_.sum)
      val n = rows.toDouble; val sx = x.sum; val sxx = x.map(t => t * t).sum
      val den = n * sxx - sx * sx
      if (den != 0.0) { // constant covariate → NaN, tested in ZMatrixSpec
        val m = ZMatrix.fromDense(spark, dense)
        val cov = m.sumAxis1.select(col("i"), col("v").as("x"))
        val got = m.regressOut(cov, rows).cells.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        for (i <- dense.indices; j <- dense(i).indices) {
          val vs = dense.map(_(j))
          val sy = vs.sum
          val sxy = vs.zip(x).map { case (v, xi) => xi * v }.sum
          val b = (n * sxy - sx * sy) / den
          val a = (sy - b * sx) / n
          val want = BigDecimal(dense(i)(j) - a - b * x(i))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
          assert(got((i.toLong, j.toLong)) == want, s"cell ($i,$j)")
        }
      }
    }
  }

  test("property: unigramNll equals the local add-one model on random corpora") {
    import graft.ops.TextOps
    val spark2 = spark
    import spark2.implicits._
    val corpusGen: Gen[List[String]] = Gen.choose(2, 8).flatMap { nd =>
      Gen.listOfN(nd, Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "cc", "dd", "e")).map(_.mkString(" "))))
    }
    forAll(corpusGen) { (texts: List[String]) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextOps.unigramNll(docs, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val toks = texts.map(_.trim.split("\\s+").toSeq)
      val cnt = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val denom = (cnt.values.sum + cnt.size).toDouble
      def lnq(c: Long): Long = math.round(math.log((c + 1.0) / denom) * 1e6)
      texts.indices.foreach { i =>
        val s = toks(i).map(t => lnq(cnt(t))).sum
        val want = (-s) / toks(i).size
        assert(got(i.toLong) == ((toks(i).size.toLong, want)), s"doc $i: '${texts(i)}'")
      }
    }
  }
}
