package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {

  test("perceptual aHash: codec/scale/perturbation-invariant, equals the pattern bits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ids 0..63 cover every bucket twice — PNG and JPEG renditions
    val docs = (0L until 64L).toDF("doc_id")
    val got = graft.ops.Multimodal.phashReal(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(3))).toMap
    assert(got.size == 64)
    for (id <- 0L until 64L) {
      val expectPat = (((id % 32 + 1) * 2862933555777941757L) & Long.MaxValue) | 1L
      val (w, ph) = got(id)
      assert(ph == expectPat, s"doc $id: hash $ph != pattern $expectPat")
      assert(w == 8 * (if (id % 2 == 1) 8 else 1 + (id % 3).toInt))
    }
    // same bucket, different codec+scale+perturbation → SAME hash;
    // different buckets → different hashes (the mix is injective mod 2^63)
    for (b <- 0L until 32L) assert(got(b)._2 == got(b + 32)._2)
    assert(got.values.map(_._2).toSet.size == 32)
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary column pipeline: schema, determinism, batch shape") {
    val docs = Seq((1L, "hello"), (2L, "a longer piece of text")).toDF("doc_id", "text")
    val f = Multimodal.features(docs, "doc_id", "text")
    assert(f.columns.toSeq == Seq("doc_id", "n_bytes", "width", "height", "channels"))
    val r = f.collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 5L)      // utf-8 bytes of "hello"
    assert(r(1L).getInt(2) == 5 % 640)
    assert(r(1L).getInt(3) == (5 * 7) % 480)
    assert(r(1L).getInt(4) == 3)
  }

  test("Arrow batch kernel produces identical features to the row path") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val viaRows = Multimodal.features(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val viaArrow = Multimodal.featuresArrow(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(viaArrow == viaRows && viaArrow.nonEmpty)
    // more rows than one batch, so multi-batch packing is exercised
    assert(viaArrow.size > Multimodal.BatchSize)
  }

  test("REAL resize: decoded PNGs NN-resampled by the child match exact pixel math") {
    // len 5 -> src 6x6; len 22 -> src 7x11; len 0 -> 1x1
    val docs = Seq((1L, "hello"), (9L, "a longer piece of text"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Multimodal.resizeReal(docs, "doc_id", "text", 5, 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    def expect(id: Long, len: Int) = {
      val (w, h) = (1 + len % 16, 1 + len % 12)
      val rSum = (for (y <- 0 until 4; x <- 0 until 5)
        yield (id + 31L * (x * w / 5) + 7L * (y * h / 4)) % 255).sum
      (w, h, 5, 4, rSum)
    }
    assert(got(1L) == expect(1L, 5), got)
    assert(got(9L) == expect(9L, 22), got)
    assert(got(3L) == expect(3L, 0), got)
  }

  test("REAL frame sampling: animated GIF payloads, stride-2 extraction, exact palette") {
    // len 5 -> 3 frames of 6x1; len 22 -> 4 frames of 2x3; len 0 -> 2 frames of 1x1
    val docs = Seq((1L, "hello"), (9L, "a longer piece of text"), (3L, ""))
      .toDF("doc_id", "text")
    // payload really is an animated GIF: header + a driver-side reader
    // counts the frames independently
    val one = Multimodal.asGifMedia(docs, "doc_id", "text")
      .filter(_.doc_id == 9L).collect().head
    assert(new String(one.payload.take(6), "US-ASCII").startsWith("GIF8"))
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(one.payload))
    val rd = javax.imageio.ImageIO.getImageReaders(iis).next()
    rd.setInput(iis)
    assert(rd.getNumImages(true) == 2 + 22 % 4)
    rd.dispose(); iis.close()

    val got = Multimodal.framesReal(docs, "doc_id", "text", stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    def expect(id: Long, len: Int): Map[(Long, Int), (Int, Int, Int, Int)] = {
      val nf = 2 + len % 4
      (0 until nf by 2).map(f => (id, f) ->
        ((nf, 1 + len % 7, 1 + len % 5, Multimodal.GifPaletteR(((id + f) % 4).toInt)))).toMap
    }
    assert(got == expect(1L, 5) ++ expect(9L, 22) ++ expect(3L, 0), got)
  }

  test("stub decode is pure and batch-size independent") {
    val rows = (1 to 200).map(i => Multimodal.MediaRow(i.toLong, Array.fill(i)(7.toByte), "x"))
    val once = Multimodal.decodeBatches(rows.iterator).toSeq
    val twice = Multimodal.decodeBatches(rows.iterator).toSeq
    assert(once == twice && once.size == 200)
    assert(once.head.n_bytes == 1L && once.last.n_bytes == 200L)
  }

  test("codec subprocess path (spawn/feed/drain/reap) equals the in-memory kernel") {
    val docs = Tables.documents(spark, TestSpark.sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    val direct = rows(Multimodal.featuresArrow(docs, "doc_id", "text"))
    val viaProc = rows(Multimodal.featuresSubprocess(docs, "doc_id", "text"))
    assert(viaProc == direct && direct.nonEmpty)
    assert(direct.size > Multimodal.BatchSize) // multiple batches crossed the pipe
  }

  test("codec subprocess failure propagates exit code and stderr to the task") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      // reuse = false: this pathological child only terminates on stdin
      // EOF (it drains to EOF before erroring), which is exactly the
      // one-shot contract — a pooled worker never sees EOF
      Multimodal.featuresSubprocess(docs, "doc_id", "text",
        cmd = Seq("/bin/sh", "-c", "cat > /dev/null; echo decode-blew-up >&2; exit 7"),
        reuse = false).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("exited 7") && chain.contains("decode-blew-up"), chain)
  }

  test("pooled codec workers are reused across queries — no respawn, same results") {
    val docs = Seq((1L, "hello"), (2L, "a longer piece of text")).toDF("doc_id", "text")
    def run() = Multimodal.realCodecFeatures(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet
    val first = run() // warms the pool (suites run sequentially in this JVM)
    val before = graft.ops.CodecWorkers.spawns.get()
    val second = run()
    val third = run()
    assert(graft.ops.CodecWorkers.spawns.get() == before,
      "resident workers must serve repeat queries without spawning")
    assert(second == first && third == first && first.nonEmpty)
  }

  test("codec subprocess that exits without reading stdin fails the task, no hang") {
    // ~200 docs of padding so the feed outlives the child and hits the
    // broken pipe; the task must surface a feed failure, not block forever
    val docs = (1 to 200).map(i => (i.toLong, "x" * 500)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Multimodal.featuresSubprocess(docs, "doc_id", "text",
        cmd = Seq("/bin/sh", "-c", "exit 3")).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("feed failed") || chain.contains("exited"), chain)
  }

  test("Arrow IPC wire round-trip yields the same features as the in-memory kernel") {
    val docs = Tables.documents(spark, TestSpark.sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    val direct = rows(Multimodal.featuresArrow(docs, "doc_id", "text"))
    val viaIpc = rows(Multimodal.featuresArrowIpc(docs, "doc_id", "text"))
    assert(viaIpc == direct && direct.nonEmpty)
  }

  test("REAL codec child decodes actual PNG payloads; sizes match prediction") {
    val docs = Seq((1L, "hello"), (2L, "a longer piece of text"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Multimodal.realCodecFeatures(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    def expect(len: Int) = (1 + len % 16, 1 + len % 12, 3)
    assert(got(1L) == expect(5), got)
    assert(got(2L) == expect(22), got)
    assert(got(3L) == expect(0), got) // empty text still a valid 1x1 image
    // n_bytes is the real PNG size: bigger than any fixed header, and the
    // payload really is a PNG (driver-side decode of one agrees)
    val one = Multimodal.asPngMedia(docs, "doc_id", "text")
      .filter(_.doc_id == 2L).collect().head
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one.payload))
    assert(img.getWidth == 1 + 22 % 16 && img.getHeight == 1 + 22 % 12)
    assert(one.payload.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }

  test("REAL codec child decodes actual JPEG payloads; sizes match prediction") {
    val docs = Seq((1L, "hello"), (2L, "a longer piece of text"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Multimodal.jpegCodecFeatures(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    def expect(len: Int) = (1 + len % 13, 1 + len % 9, 3)
    assert(got(1L) == expect(5), got)
    assert(got(2L) == expect(22), got)
    assert(got(3L) == expect(0), got)
    // the payload really is a JPEG: JFIF SOI marker, and a driver-side
    // decode reproduces the geometry despite lossy pixel coding
    val one = Multimodal.asImageMedia(docs, "doc_id", "text",
        "jpg", "image/jpeg", 13, 9)
      .filter(_.doc_id == 2L).collect().head
    assert(one.payload.take(2).toSeq == Seq(0xFF.toByte, 0xD8.toByte), "missing SOI")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one.payload))
    assert(img.getWidth == 1 + 22 % 13 && img.getHeight == 1 + 22 % 9)
  }

  test("REAL codec child rejects a non-image payload with stderr attached") {
    val docs = Seq((1L, "not an image")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      // text payloads (asMedia) through the real decoder: the child must
      // exit nonzero with its complaint on stderr, not emit garbage
      Multimodal.featuresSubprocess(docs, "doc_id", "text",
        cmd = Multimodal.pngCodecCmd).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("exited 3") || chain.contains("not a decodable image"), chain)
  }

  test("REAL audio decode: WAV payloads parsed by javax.sound match exact PCM math") {
    val docs = Seq((1L, "hello"), (2L, "a longer piece of text"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Multimodal.audioReal(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    def expect(id: Long, len: Int) = {
      val n = 100 + len % 200
      val sum = (0 until n).map(t => math.abs((id * 31 + t * 7) % 2000 - 1000)).sum
      (n.toLong, 1, 8000, sum)
    }
    assert(got(1L) == expect(1L, 5), got)
    assert(got(2L) == expect(2L, 22), got)
    assert(got(3L) == expect(3L, 0), got)
    // the payload really is a WAV: RIFF/WAVE magic, and the JVM-side
    // javax.sound parser agrees with the child's geometry
    val one = Multimodal.asWavMedia(docs, "doc_id", "text")
      .filter(_.doc_id == 2L).collect().head
    assert(new String(one.payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(one.payload.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(one.payload))
    try {
      assert(ais.getFormat.getChannels == 1)
      assert(ais.getFormat.getSampleRate == 8000f)
      assert(ais.getFrameLength == 100 + 22 % 200)
    } finally ais.close()
  }
}
