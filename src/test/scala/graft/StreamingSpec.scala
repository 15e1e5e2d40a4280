package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Stream
import graft.streaming.Stream.{Ev, QuotaOut, SessOut}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals batch windowed agg") {
    import spark.implicits._
    val streamed = Stream.windowAgg(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Tables.events(spark, TestSpark.sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(unix_timestamp(col("window.start").cast("timestamp")).as("ws"),
        col("event_type"), col("n"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming watermarked dedup equals batch distinct") {
    val streamed = Stream.streamDedup(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hs"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.size < Tables.events(spark, TestSpark.sf).count()) // dups dropped
  }

  test("stateful sessionization (flatMapGroupsWithState) matches gap semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Stream.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sess_test").outputMode("append").start()
    try {
      // user 1: two sessions (gap 3600 > 1800); user 2: one session
      input.addData(
        Ev(1L, 1L, 1000L), Ev(1L, 2L, 1100L), Ev(1L, 3L, 5000L),
        Ev(2L, 4L, 1000L))
      q.processAllAvailable()
      // sentinel events flush the open sessions
      input.addData(Ev(1L, 99L, 999999L), Ev(2L, 98L, 999999L))
      q.processAllAvailable()
      val out = spark.table("sess_test").as[SessOut].collect().toSet
      assert(out.contains(SessOut(1L, 1L, 2L, 100L)))  // events 1,2
      assert(out.contains(SessOut(1L, 2L, 1L, 0L)))    // event 3
      assert(out.contains(SessOut(2L, 1L, 1L, 0L)))    // event 4
    } finally q.stop()
  }

  test("S29 sessionize TTL: expiry flushes the open session; re-arrival re-initializes; within-horizon == no-timeout") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.Stream.EvW
    def ev(u: Long, id: Long, es: Long) =
      EvW(u, id, es, new java.sql.Timestamp(es * 1000L))
    val input = MemoryStream[EvW]
    val q = Stream.sessionizeTtl(input.toDS(), ttlSecs = 3600L).writeStream
      .format("memory").queryName("sess_ttl_test").outputMode("append").start()
    try {
      // user 1: one open session of 2 events (within-horizon behavior =
      // the no-timeout variant: nothing emitted yet)
      input.addData(ev(1L, 1L, 1000L), ev(1L, 2L, 1100L))
      q.processAllAvailable()
      assert(spark.table("sess_ttl_test").isEmpty,
        "open session emitted before any horizon crossing")
      // an unrelated key advances the watermark far past 1100 + 3600
      input.addData(ev(2L, 3L, 100000L))
      q.processAllAvailable()
      input.addData(ev(3L, 4L, 200000L)) // one more batch to run the timeout pass
      q.processAllAvailable()
      val flushed = spark.table("sess_ttl_test").as[SessOut].collect().toSet
      assert(flushed.contains(SessOut(1L, 1L, 2L, 100L)),
        s"expiry must FLUSH user 1's open session: $flushed")
      // re-arrival: state was dropped, so the session counter restarts at 1
      input.addData(ev(1L, 5L, 300000L), ev(1L, 6L, 300010L),
        ev(1L, 7L, 310000L)) // second pair is a new session (gap > 1800)
      q.processAllAvailable()
      val after = spark.table("sess_ttl_test").as[SessOut].collect().toSet
      assert(after.contains(SessOut(1L, 1L, 2L, 10L)),
        s"re-initialized key must restart session ids at 1: $after")
    } finally q.stop()
  }

  test("S29 quota TTL: counter survives within the horizon, resets after expiry") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.Stream.{EvW, QuotaOut}
    def ev(u: Long, id: Long, es: Long) =
      EvW(u, id, es, new java.sql.Timestamp(es * 1000L))
    val input = MemoryStream[EvW]
    val q = Stream.quotaTtl(input.toDS(), n = 2L, ttlSecs = 3600L).writeStream
      .format("memory").queryName("quota_ttl_test").outputMode("append").start()
    try {
      input.addData(ev(1L, 1L, 1000L))
      q.processAllAvailable()
      // within horizon: the counter persists — id 2 takes rank 2, id 3 dropped
      input.addData(ev(1L, 2L, 2000L), ev(1L, 3L, 2100L))
      q.processAllAvailable()
      val in1 = spark.table("quota_ttl_test").as[QuotaOut].collect().toSet
      assert(in1 == Set(QuotaOut(1L, 1L, 1L), QuotaOut(1L, 2L, 2L)), s"$in1")
      // horizon crossing (watermark via another key + a timeout batch)
      input.addData(ev(2L, 4L, 100000L))
      q.processAllAvailable()
      input.addData(ev(3L, 5L, 200000L))
      q.processAllAvailable()
      // expiry reset the budget: user 1 is admitted again from rank 1
      input.addData(ev(1L, 6L, 300000L))
      q.processAllAvailable()
      val after = spark.table("quota_ttl_test").as[QuotaOut].collect().toSet
      assert(after.contains(QuotaOut(1L, 6L, 1L)),
        s"expired key must re-admit from rank 1: $after")
    } finally q.stop()
  }

  test("S29 transitions TTL: no pair spans the expiry gap; fresh chain after re-arrival") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.Stream.{TEvW, TransOut}
    def ev(u: Long, id: Long, es: Long, t: String) =
      TEvW(u, id, es, t, new java.sql.Timestamp(es * 1000L))
    val input = MemoryStream[TEvW]
    val q = Stream.transitionsTtl(input.toDS(), ttlSecs = 3600L).writeStream
      .format("memory").queryName("trans_ttl_test").outputMode("append").start()
    try {
      input.addData(ev(1L, 1L, 1000L, "a"), ev(1L, 2L, 1100L, "b"))
      q.processAllAvailable()
      input.addData(ev(2L, 3L, 100000L, "x"))
      q.processAllAvailable()
      input.addData(ev(3L, 4L, 200000L, "y")) // timeout pass drops user 1
      q.processAllAvailable()
      input.addData(ev(1L, 5L, 300000L, "c"), ev(1L, 6L, 300100L, "d"))
      q.processAllAvailable()
      val out = spark.table("trans_ttl_test").as[TransOut].collect().toSet
      assert(out.contains(TransOut(1L, "a", "b")), s"$out")
      assert(!out.contains(TransOut(1L, "b", "c")),
        s"a pair crossed the expiry gap: $out")
      assert(out.contains(TransOut(1L, "c", "d")),
        s"fresh chain after re-arrival must resume pairing: $out")
    } finally q.stop()
  }

  test("streaming quota admits first n per key and persists the counter across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Stream.quota(input.toDS(), n = 2).writeStream
      .format("memory").queryName("quota_test").outputMode("append").start()
    try {
      // batch 1: user 1 sends three events (out of event-time order — the
      // in-batch sort admits the two EARLIEST); user 2 sends one
      input.addData(Ev(1L, 3L, 300L), Ev(1L, 1L, 100L), Ev(1L, 2L, 200L),
        Ev(2L, 4L, 100L))
      q.processAllAvailable()
      // batch 2: user 1 is already over quota — nothing admitted; user 2's
      // counter carried over in state, one slot left
      input.addData(Ev(1L, 5L, 50L), Ev(2L, 6L, 200L), Ev(2L, 7L, 300L))
      q.processAllAvailable()
      val out = spark.table("quota_test").as[QuotaOut].collect().toSet
      assert(out == Set(
        QuotaOut(1L, 1L, 1L), QuotaOut(1L, 2L, 2L),
        QuotaOut(2L, 4L, 1L), QuotaOut(2L, 6L, 2L)))
    } finally q.stop()
  }

  test("streaming IVF assignment equals the batch assignment") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 4)
    val streamed = graft.streaming.Stream.ivfAssignStream(spark, TestSpark.sf, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Similarity.withIvfList(emb, "embedding", cents)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("list_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.values.toSet.size > 1) // vectors actually spread across lists
  }

  test("stream-static contamination join equals the batch membership check") {
    import org.apache.spark.sql.functions.{col, md5}
    val streamed = graft.streaming.Stream.contaminationStream(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val docs = Tables.documents(spark, TestSpark.sf)
    val benchFps = docs.filter(col("doc_id") < 50)
      .select(md5(col("text").cast("binary"))).collect().map(_.getString(0)).toSet
    val batch = docs.select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> benchFps.contains(r.getString(1))).toMap
    assert(streamed == batch)
    // the benchmark docs flag themselves, and not everything is flagged
    assert((0L until 50L).forall(streamed(_)))
    assert(streamed.values.exists(!_))
  }

  test("streaming near-dup admission equals the batch pipeline on the same split") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Dedup
    val streamed = graft.streaming.Stream.nearDupStream(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch twin: same split, same band index, same verify threshold
    val docs = Tables.documents(spark, TestSpark.sf)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val resident = docs.filter(col("doc_id") % 5 =!= 0)
    def banded(df: org.apache.spark.sql.DataFrame) =
      Dedup.bands(Dedup.minhashSignatures(df, "doc_id", "text", 128, 5), 16, 8)
    val pairs = banded(incoming).withColumnRenamed("doc_id", "id1")
      .join(banded(resident).withColumnRenamed("doc_id", "id2"), Seq("band", "bucket"))
      .select(col("id1"), col("id2")).distinct()
    val batch = Dedup.jaccardVerify(pairs, docs, "doc_id", "text", 5)
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // every admitted pair crosses the split in the right direction
    assert(streamed.forall { case (in, corp, j) =>
      in % 5 == 0 && corp % 5 != 0 && j >= 0.8 })
  }

  test("streaming perceptual admission equals the batch hash join on the same split") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.Stream.phashStream(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val docs = Tables.documents(spark, TestSpark.sf)
    val all = graft.ops.Multimodal.phashReal(docs, "doc_id")
      .select(col("doc_id"), col("phash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val resident = all.filter(_._1 % 5 != 0).groupBy(_._2)
      .map { case (h, xs) => h -> xs.keys.min }
    val batch = all.filter(_._1 % 5 == 0).map { case (id, h) =>
      (id, h, resident.getOrElse(h, -1L)) }.toSet
    assert(streamed == batch)
    // every incoming image has a resident perceptual twin on this corpus
    assert(streamed.nonEmpty && streamed.forall(_._3 >= 0))
  }

  test("streaming observe: per-batch input accounting rides the micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    // the same zero-extra-pass telemetry as pipeline_curate_obs, streaming
    // flavor: observed metrics surface per micro-batch in the progress
    // events, summing to exactly the rows ingested
    val q = input.toDS()
      .observe("ingest", count(lit(1)).as("n"),
        sum(col("es")).as("es_sum"))
      .writeStream.format("memory").queryName("obs_test")
      .outputMode("append").start()
    try {
      input.addData(Ev(1L, 1L, 10L), Ev(1L, 2L, 20L))
      q.processAllAvailable()
      input.addData(Ev(2L, 3L, 30L))
      q.processAllAvailable()
      val rows = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest")))
      assert(rows.map(_.getLong(0)).sum == 3L,
        s"observed ${rows.map(_.getLong(0)).sum} rows, expected 3")
      assert(rows.map(_.getLong(1)).sum == 60L)
      assert(spark.table("obs_test").count() == 3L)
    } finally q.stop()
  }

  test("streaming drift monitor reconciles with the batch distribution") {
    import org.apache.spark.sql.functions._
    val got = graft.streaming.Stream.driftStream(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val e = Tables.events(spark, TestSpark.sf)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("ws"),
        least(lit(4), greatest(lit(0), floor(col("value") / 25))).cast("int").as("bin"))
      .groupBy("ws", "bin").count().collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // every batch (window, bin) count appears identically in the stream
    e.foreach { case (k, n) => assert(got(k)._1 == n, s"$k: ${got(k)._1} != $n") }
    // grid is dense: 5 bins per window, absent bins count 0
    val wins = got.keys.map(_._1).toSet
    assert(got.size == wins.size * 5)
    // PSI terms are finite and a window matching the global mix scores ~0
    assert(got.values.forall(v => !v._2.isNaN && !v._2.isInfinite))
  }

  test("streaming zarr ingestion: multi-batch chunk-aligned appends, equals batch grid") {
    import org.apache.spark.sql.functions._
    val cells = graft.streaming.Stream.zarrIngestStream(spark, TestSpark.sf)
    val sfName = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val store = s"target/tmp/zarr_ingest_store_$sfName"
    val meta = graft.zarr.Zarr.readMeta(store)
    assert(meta.cols == 5 && meta.chunkRows == 240)
    // the stream ran MULTIPLE micro-batches: one chunk file per time band,
    // appended independently (the staged source has one file per band)
    val bands = ((meta.rows + 239) / 240).toInt
    assert(bands >= 2, s"events span only ${meta.rows} hours — banding degenerate")
    assert(graft.zarr.Zarr.listChunks(store, meta.keyEnc).size == bands)
    // final store equals the one-shot batch computation of the same grid
    val ev = Tables.events(spark, TestSpark.sf).select(
      (unix_timestamp(col("ts")).cast("long") / 3600L).cast("long").as("habs"),
      col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val h0 = ev.agg(min(col("habs"))).head().getLong(0)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val batch = ev.groupBy((col("habs") - h0).as("h"), col("event_type"))
      .agg(sum(col("cents")).cast("double").as("v"))
      .collect().map { r =>
        (r.getLong(0), types.indexOf(r.getString(1)).toLong) -> r.getDouble(2)
      }.toMap
    val got = cells.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == meta.rows * 5)
    got.foreach { case (k, v) => assert(v == batch.getOrElse(k, 0.0), s"cell $k") }
  }

  test("streaming tensor ingestion: banded rank-3 appends, equals the batch cube") {
    import org.apache.spark.sql.functions._
    val cells = graft.streaming.Stream.tensorIngestStream(spark, TestSpark.sf)
    val sfName = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val store = s"target/tmp/tensor_ingest_store_$sfName"
    val meta = graft.zarr.ZarrNd.readMetaN(store)
    assert(meta.rank == 3 && meta.shape(1) == 5 && meta.shape(2) == 4)
    assert(meta.chunks.toSeq == Seq(240, 5, 4))
    val bands = ((meta.shape(0) + 239) / 240).toInt
    assert(bands >= 2, s"events span only ${meta.shape(0)} hours — banding degenerate")
    // one chunk per band on disk (full chunk shape even for the ragged tail)
    val stored = new java.io.File(store).listFiles().map(_.getName)
      .filterNot(_ == ".zarray")
    assert(stored.length == bands, stored.mkString(","))
    // final store equals the one-shot batch cube
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = Tables.events(spark, TestSpark.sf).select(
      (unix_timestamp(col("ts")).cast("long") / 3600L).cast("long").as("habs"),
      col("event_type"), pmod(col("user_id"), lit(4)).cast("long").as("u"),
      round(col("value") * 100).cast("long").as("cents"))
    val h0 = ev.agg(min(col("habs"))).head().getLong(0)
    val batch = ev.groupBy((col("habs") - h0).as("h"), col("event_type"), col("u"))
      .agg(sum(col("cents")).cast("double").as("v"))
      .collect().map { r =>
        (r.getLong(0), types.indexOf(r.getString(1)).toLong, r.getLong(2)) -> r.getDouble(3)
      }.toMap
    val got = cells.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.size == meta.shape(0) * 5 * 4)
    got.foreach { case (k, v) => assert(v == batch.getOrElse(k, 0.0), s"cell $k") }
  }

  test("native session_window stream equals the batch twin below the watermark cutoff") {
    val got = graft.streaming.Stream.sessionWindowAgg(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch-mode session_window over the same events (same merge engine),
    // filtered by the append-mode emission rule: end ≤ ms-floored max ts
    val ev = Tables.events(spark, TestSpark.sf)
    val batchAll = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start").cast("timestamp")).as("ss_us"),
        unix_micros(col("session_window.end").cast("timestamp")).as("se_us"),
        col("n_events"))
    val wm = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 * 1000
    val exp = batchAll.filter(col("se_us") <= wm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == exp)
    // the withheld tails are real: at least one session stayed open
    assert(batchAll.count() > exp.size)
  }

  test("stream-stream LEFT OUTER join: matched rows + watermark-expired null rows, batch-equal") {
    val got = graft.streaming.Stream.streamLeftJoin(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, TestSpark.sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vts"))
    val inner = p.join(v, col("pu") === col("vu") &&
        col("vts") < col("pts") && col("vts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .select(col("pid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the global watermark: min over both sides of ms-floored max − 65 min
    def side(t: String) = ev.filter(col("event_type") === t)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 * 1000
    val wm = math.min(side("purchase"), side("view")) - 3900L * 1000000
    val expiredUnmatched = p.join(v, col("pu") === col("vu") &&
        col("vts") < col("pts") && col("vts") >= col("pts") - expr("INTERVAL 1 HOUR"),
        "left_anti")
      .filter(unix_micros(col("pts")) < wm)
      .select(col("pid")).collect().map(r => (r.getLong(0), -1L)).toSet
    assert(got == (inner ++ expiredUnmatched))
    assert(expiredUnmatched.nonEmpty && inner.nonEmpty, "both row kinds must occur")
  }

  test("Bm25Score kernel == the HOF filter form (differential, hostile strings)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf)
    val terms = docs.filter(col("doc_id") === 0)
      .select(col("text")).head().getString(0)
      .trim.split("\\s+").distinct.sorted.take(8).toSeq
    val (idf, n, tl) =
      graft.ops.Similarity.bm25Model(docs, "doc_id", "text", terms)
    val present = terms.filter(idf.contains)
    // hostile rows: empty, space-only, tab inside (trim keeps it, split
    // sees it), repeated query term, trailing whitespace, leading newline
    val hostile = Seq("", " ", "a\tb", present.headOption.getOrElse("z"),
      present.take(2).mkString(" ") + " " + present.headOption.getOrElse("z"),
      "x  y ", "\n" + present.headOption.getOrElse("z"))
      .zipWithIndex.map { case (t, i) => (900000L + i, t) }
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).unionByName(hostile)
    // reference: the pre-X14 per-term HOF filter chain, verbatim
    val base = all.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("_toks"))
      .withColumn("_len", size(col("_toks")).cast("long"))
    val withTf = present.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"_tf$i",
        size(filter(col("_toks"), x => x === lit(t))).cast("long"))
    }
    def dec(v: BigInt) = s"CAST('$v' AS DECIMAL(38, 0))"
    val contribs = present.zipWithIndex.map { case (t, i) =>
      val a = BigInt(idf(t)) * 44 * BigInt(tl)
      s"CAST((${dec(a)} * _tf$i) div (${dec(BigInt(20) * tl)} * _tf$i + " +
        s"${dec(BigInt(6) * tl)} + ${dec(BigInt(18) * n)} * _len) AS BIGINT)"
    }
    val ref = withTf.selectExpr("doc_id",
      (if (contribs.isEmpty) "CAST(0 AS BIGINT)" else contribs.mkString(" + ")) +
        " AS r")
    val ker = all.select(col("doc_id"),
      graft.functions.Bm25Score.score(col("text"), present, idf, n, tl).as("k"))
    val bad = ker.join(ref, "doc_id").filter(col("k") =!= col("r")).collect()
    assert(bad.isEmpty, s"kernel diverged on: ${bad.take(3).mkString("; ")}")
  }

  test("streaming hybrid RRF == the batch fused ranking, bit-equal (S25)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf)
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val terms = docs.filter(col("doc_id") === 0)
      .select(col("text")).head().getString(0)
      .trim.split("\\s+").distinct.sorted.take(8).toSeq
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = rows(graft.streaming.Stream.hybridRrfStream(
      spark, TestSpark.sf, terms, q))
    // batch twin: the fused table pre-top-k (k beyond both pools covers
    // every full-outer row)
    val exp = rows(graft.ops.Similarity.hybridBm25TopK(
      docs, "doc_id", "text", emb, "vec_id", "embedding", terms, q, k = 400))
    assert(got == exp, s"stream diverged: ${(got -- exp).take(3)} vs ${(exp -- got).take(3)}")
    assert(got.nonEmpty && got.exists(_._3 > 0) && got.exists(_._4 > 0),
      "both ranking sides must contribute")
    // the serving cut: top-10 by (rrf desc, id) equals the batch query
    val top = got.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val batchTop = graft.ops.Similarity.hybridBm25TopK(
        docs, "doc_id", "text", emb, "vec_id", "embedding", terms, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(top == batchTop, s"serving top-10 diverged:\n$top\nvs\n$batchTop")
  }

  test("streaming BM25 admission == the batch distributed scorer, bit-equal") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf)
    val terms = docs.filter(col("doc_id") === 0)
      .select(col("text")).head().getString(0)
      .trim.split("\\s+").distinct.sorted.take(8).toSeq
    val got = graft.streaming.Stream.bm25Stream(spark, TestSpark.sf, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch twin: the distributed tf/idf join pipeline (the hybrid kw
    // side without the pool cut), same integer arithmetic
    val (idf, n, tl) =
      graft.ops.Similarity.bm25Model(docs, "doc_id", "text", terms)
    val tf = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val lens = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("len"))
    import spark.implicits._
    val idfDf = idf.toSeq.toDF("token", "idf_micro")
    val dec = "decimal(38,0)"
    val exp = tf.join(broadcast(idfDf), Seq("token")).join(lens, Seq("doc_id"))
      .selectExpr("doc_id",
        s"CAST(((CAST(idf_micro AS $dec) * 44 * CAST($tl AS $dec) * tf) div " +
          s"(20 * CAST($tl AS $dec) * tf + 6 * CAST($tl AS $dec) + " +
          s"18 * CAST(len AS $dec) * $n)) AS BIGINT) AS _t")
      .groupBy(col("doc_id")).agg(sum(col("_t")).as("s"))
      .filter(col("s") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp,
      s"stream != batch: ${(got.toSet -- exp.toSet).take(3)} vs ${(exp.toSet -- got.toSet).take(3)}")
    assert(got.nonEmpty, "fixture produced no admitted docs — test is vacuous")
  }

  test("stream-stream FULL OUTER join: both sides' expired null rows, batch-equal") {
    val got = graft.streaming.Stream.streamFullJoin(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, TestSpark.sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vts"))
    val cond = col("pu") === col("vu") &&
      col("vts") < col("pts") && col("vts") >= col("pts") - expr("INTERVAL 1 HOUR")
    val inner = p.join(v, cond).select(col("pid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def side(t: String) = ev.filter(col("event_type") === t)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 * 1000
    val wm = math.min(side("purchase"), side("view")) - 3900L * 1000000
    val expP = p.join(v, cond, "left_anti")
      .filter(unix_micros(col("pts")) < wm)
      .select(col("pid")).collect().map(r => (r.getLong(0), -1L)).toSet
    // a view's window closes 1 h after its event time: every purchase it
    // could match has pts <= vts + 1 h
    val expV = v.join(p, cond, "left_anti")
      .filter(unix_micros(col("vts")) < wm - 3600L * 1000000)
      .select(col("vid")).collect().map(r => (-1L, r.getLong(0))).toSet
    assert(got == (inner ++ expP ++ expV))
    assert(inner.nonEmpty && expP.nonEmpty && expV.nonEmpty,
      "all three row kinds must occur for the test to bite")
    // the full join strictly extends the left join by the view-side nulls
    val left = graft.streaming.Stream.streamLeftJoin(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(left.subsetOf(got) && (got -- left) == expV)
  }

  test("checkpointed restart: the resumed query skips committed batches (file-sink exactly-once)") {
    import spark.implicits._
    val root = s"${graft.GraftPaths.tmpRoot}/restart_test"
    graft.zarr.Zarr.delete(root, recursive = true)
    val (srcDir, ckpt, outDir) = (s"$root/src", s"$root/ckpt", s"$root/out")
    // stage file A, run to completion against a persistent checkpoint
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val afterA = spark.read.parquet(outDir).count()
    assert(afterA == 2, s"first run must commit file A's rows, got $afterA")
    // add file B, RESTART from the same checkpoint: A's batch is in the
    // commit log and must not reprocess; the file sink's _spark_metadata
    // keeps the output exactly-once
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(srcDir)
    runOnce()
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"restart must process ONLY the new file, exactly once: $rows")
  }

  test("exactly-once export: re-running a batch leaves the lake table unchanged") {
    val first = graft.streaming.Stream.exportStream(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // equals the batch aggregate over the raw events
    val exp = Tables.events(spark, TestSpark.sf)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(first == exp)
    // the retry path: re-run ONE band through the exact batch body —
    // dynamic overwrite must converge, not duplicate
    val sfName = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val srcDir = s"${graft.GraftPaths.tmpRoot}/export_stream_src_$sfName"
    val outDir = s"${graft.GraftPaths.tmpRoot}/export_stream_out_$sfName"
    val band0 = spark.read.parquet(srcDir)
      .filter(col("band") === spark.read.parquet(srcDir)
        .agg(min(col("band").cast("long"))).head().getLong(0))
    graft.streaming.Stream.exportBatch(outDir)(band0, 9999L)
    val second = graft.streaming.Stream.readExport(spark, outDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(second == first, "replaying a batch must be a no-op on the table")
  }

  test("session_window merge boundary: the exact-gap pair MERGES (inclusive end)") {
    import spark.implicits._
    // Spark's session merge is boundary-INCLUSIVE: a window [t, t+gap]
    // absorbs an event at exactly t+gap (verified here — this pins the
    // oracle's break condition to STRICT `diff > gap`); one microsecond
    // beyond breaks.
    val base = 1700000000000000L // epoch micros
    val rows = Seq(
      (1L, base), (1L, base + 1800000000L),      // exact gap: merge
      (2L, base), (2L, base + 1800000001L))      // gap + 1 us: break
    val df = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val sess = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(sess(1L) == Seq(2L), "exact-gap pair must merge (inclusive boundary)")
    assert(sess(2L) == Seq(1L, 1L), "gap+1us pair must split into two sessions")
  }

  test("classifyStream: stateless serving equals the batch scorer bit-for-bit; vocab cap falls back") {
    import spark.implicits._
    val streamed = Stream.classifyStream(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val batch = graft.ops.TextOps.naiveBayes(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(streamed == batch, "serving path must equal the batch join form")

    // cap smaller than the vocabulary: uncovered tokens take the
    // per-label fallback, so a doc of only rare tokens scores
    // prior + n·fallback for every label and the PRIOR decides
    val docs = Seq(
      (1L, "common common rare1", "a"), (2L, "common common rare2", "a"),
      (3L, "common rare3 rare4", "b")
    ).toDF("doc_id", "text", "lang")
    val m = graft.ops.TextOps.naiveBayesModel(docs, "doc_id", "text", "lang", vocabCap = 1)
    assert(m.map(_._1) == Seq("a", "b"))
    assert(m.forall(_._4.keySet.subsetOf(Set("common"))), "only the capped vocab ships")
    // label a has the larger prior (2 docs vs 1) -> smaller prior cost
    val pa = m.find(_._1 == "a").get._2
    val pb = m.find(_._1 == "b").get._2
    assert(pa < pb, "more frequent class must carry the cheaper prior")
  }

  test("transitionStream: per-user state pairs == the batch lead window; state spans batches") {
    import spark.implicits._
    // file stream: matrix equals batch q65 exactly
    val streamed = Stream.transitionStream(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.Relational.q65Transitions(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    // MemoryStream: the pair CROSSING a batch boundary comes from state
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Stream.TEv]
    val q = Stream.transitions(ms.toDS()).writeStream.format("memory")
      .queryName("trans_mem").outputMode("append").start()
    try {
      ms.addData(Stream.TEv(1L, 1L, 100L, "view"))
      q.processAllAvailable()
      ms.addData(Stream.TEv(1L, 2L, 200L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("trans_mem").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(pairs == Set((1L, "view", "click")),
      s"the cross-batch pair must come from state: $pairs")
  }

  test("containmentStream: per-batch containment join equals the batch L63 join exactly") {
    val streamed = Stream.containmentStream(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.ops.Dedup.containmentJoin(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text",
        minContainPct = 60, shingle = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size}: per-pair counts must never cross batches")
    assert(streamed.nonEmpty, "degenerate fixture: no containment pairs")
    // the retry path: replay a (batch, batchId) pair through the exact
    // per-batch body — the _bid-partitioned dynamic overwrite must
    // converge to the same table, not append a duplicate copy
    import org.apache.spark.sql.functions.{col, count, lit}
    val sfName = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val outDir = s"${graft.GraftPaths.tmpRoot}/contain_stream_out_$sfName"
    val docs = Tables.documents(spark, TestSpark.sf)
    val statToks = graft.ops.Dedup.shingleToks(docs, "doc_id", "text", 3)
      .select(col("doc_id").as("id_b"), col("token")).localCheckpoint()
    Stream.containmentBatch(statToks, 60, 3, outDir)(docs, 424242L)
    Stream.containmentBatch(statToks, 60, 3, outDir)(docs, 424242L)
    val replayed = spark.read.parquet(outDir)
      .filter(col("_bid") === 424242L)
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n"))
      .collect()
    assert(replayed.forall(_.getLong(2) == 1L),
      "replaying a batch id duplicated rows — the sink is not idempotent")
    assert(replayed.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batch.map(p => (p._1, p._2)),
      "the replayed full-corpus batch must converge to the batch join's pair set")
  }

  test("curateStream: composed stateless gate equals the batch pre-dedup stage bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val rates = (10 to 19).map(i => s"src$i" -> 0.25).toMap
    val streamed = Stream.curateStream(spark, TestSpark.sf, rates)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // the batch pipeline minus the keeper semi-join (edge dedup is the
    // S4/S9 stateful family, not this gate)
    val docs = Tables.documents(spark, TestSpark.sf)
    val batch = docs.select(col("doc_id"), col("source").as("group_key"),
        graft.ops.TextOps.qualityCol(col("text")).as("quality"),
        graft.ops.TextOps.repetitionKeepCol(col("text"), maxDupWord = 0.6).as("_keep"),
        graft.ops.TextOps.langIdCol(col("text")).as("_lang"))
      .filter(col("quality") >= 0.3 && col("_keep") && col("_lang") =!= "und" &&
        graft.ops.Sampling.mixPredicate(col("doc_id"), col("group_key"), rates))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(streamed == batch, "stream gate must equal the batch gate bit-for-bit")
    assert(streamed.nonEmpty, "degenerate fixture: gate admitted nothing")
    assert(streamed.size < Tables.documents(spark, TestSpark.sf).count(),
      "degenerate fixture: gate rejected nothing")
  }

  test("fuzzyAdmissionStream: per-arrival best match equals the batch argmin; masters self-resolve") {
    val streamed = Stream.fuzzyAdmissionStream(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // batch twin: identical blocks, per-arrival (dist, id2) argmin
    val cust = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"), col("c_name"),
        expr("substring(c_name, 1, length(c_name) - 2)").as("blk")).collect()
    val master = cust.filter(_.getLong(0) % 7 == 0)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val exp = cust.flatMap { s =>
      val cands = master.filter(_.getString(2) == s.getString(2))
        .map(m => (lev(s.getString(1), m.getString(1)).toLong, m.getLong(0)))
      if (cands.isEmpty) None
      else {
        val best = cands.min
        if (best._1 <= 1) Some(s.getLong(0) -> ((best._2, best._1))) else None
      }
    }.toMap
    assert(streamed == exp, s"streamed=${streamed.size} exp=${exp.size}")
    // every master row that arrived on the stream resolves to itself at 0
    assert(master.forall(m => streamed.get(m.getLong(0)).contains((m.getLong(0), 0L))))
  }

  test("dsirStream: ingest-edge scores equal batch sample_dsir bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val streamed = Stream.dsirStream(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, TestSpark.sf)
    val batch = graft.ops.Sampling.dsirSelect(docs,
        docs.filter(col("source") < "src10"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      "per-row fold must equal the batch shuffle-summed scores exactly")
  }

  test("pplFilterStream: value-rule buckets equal batch terciles off tie boundaries") {
    val streamed = Stream.pplFilterStream(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getString(3), r.getBoolean(4))).toMap
    val batch = graft.ops.TextOps.pplBucketFilter(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getString(3), r.getBoolean(4))).toMap
    assert(streamed.keySet == batch.keySet, "same admitted document set")
    // lang + nll are bit-equal everywhere; the bucket may differ from the
    // batch RANK rule only for docs whose nll EQUALS another doc's at a
    // tercile boundary (the documented value-vs-rank tie semantics) —
    // count those and require every other row identical
    val nllByLang = batch.values.groupBy(_._1).map { case (l, vs) =>
      l -> vs.groupBy(_._2).filter(_._2.size > 1).keySet }
    var tieDiffs = 0
    streamed.foreach { case (id, (lang, nll, bucket, keep)) =>
      val (blang, bnll, bbucket, bkeep) = batch(id)
      assert(lang == blang && nll == bnll, s"doc $id: score/lang must be bit-equal")
      if (bucket != bbucket || keep != bkeep) {
        assert(nllByLang(lang).contains(nll),
          s"doc $id differs ($bucket vs $bbucket) without a tied nll")
        tieDiffs += 1
      }
    }
    info(s"tie-boundary bucket differences: $tieDiffs of ${streamed.size}")
  }

  test("topkStream: per-window leaders equal the batch rollup; ranks bounded") {
    val got = Stream.topkStream(spark, TestSpark.sf, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Tables.events(spark, TestSpark.sf)
      .selectExpr("(unix_timestamp(CAST(ts AS TIMESTAMP)) div 3600) * 3600 AS ws", "event_type")
      .groupBy("ws", "event_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (ws, rows) =>
        rows.sortBy(t => (-t._3, t._2)).zipWithIndex.take(3)
          .map { case ((_, et, n), ix) => (ws, et, n, ix + 1L) }.toSeq
      }.toSet
    assert(got == batch)
    assert(got.forall(t => t._4 >= 1 && t._4 <= 3))
  }

  test("upsertStream: snapshot equals batch latest-per-user; merge is idempotent") {
    val got = Stream.upsertStream(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    val batch = Tables.events(spark, TestSpark.sf)
      .selectExpr("user_id", "unix_timestamp(CAST(ts AS TIMESTAMP)) AS es",
        "event_id", "event_type", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.maxBy(t => (t._2, t._3))).toMap
      .map { case (u, t) => u -> (t._2, t._4, t._5) }
    assert(got == batch)
    // idempotency: re-applying the ENTIRE event set as one more batch
    // through the exact foreachBatch body leaves the snapshot unchanged
    val sfName = TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val outDir = s"${graft.GraftPaths.tmpRoot}/upsert_snap_$sfName"
    Stream.upsertBatch(outDir)(Tables.events(spark, TestSpark.sf), 999L)
    val again = spark.read.parquet(outDir)
      .select(col("user_id"), col("last_es"), col("last_type"), col("last_cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(again == got, "re-applied batch must be a no-op")
  }
}
