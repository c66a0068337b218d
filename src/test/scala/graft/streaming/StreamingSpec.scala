package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.binning.{Binning, UniformAxis}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def writeEventFiles(dir: String): Unit = {
    // two "arriving" files of timestamped events
    Seq(
      (0 until 50).map(i => (java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i % 30}%02d"), i * 10.0)),
      (50 until 80).map(i => (java.sql.Timestamp.valueOf(f"2024-01-01 00:01:${i % 30}%02d"), i * 5.0)),
    ).zipWithIndex.foreach { case (rows, idx) =>
      rows.toDF("ts", "value").coalesce(1)
        .write.mode("append").parquet(dir)
      val _ = idx
    }
  }

  test("windowedHistogram over a file stream matches the batch histogram") {
    val dir = Files.createTempDirectory("stream-in").toFile.getPath + "/data"
    writeEventFiles(dir)
    val ax = UniformAxis("value", 10, 0.0, 800.0)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val binned = StreamingBinning.windowedHistogram(
      stream, Seq(ax), "ts", "1 minute")
    assert(binned.isStreaming)
    // Complete mode: emits every window at each trigger — in Append mode the
    // final window would stay open (the watermark never passes it) and be
    // dropped when the bounded stream ends
    val result = StreamingBinning.runToMemorySink(binned, "hist_sink", OutputMode.Complete())
      .groupBy("bin_value").agg(sum("cnt").as("cnt")) // collapse windows
    val batch = Binning.histogram(spark.read.parquet(dir), Seq(ax))
    val streamed = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = batch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === expected)
  }

  test("crawl ingestion from a PATH stream matches the batch route") {
    import graft.pipeline.{Curation, Warc}
    // the streaming on-ramp: new .warc segments land in a lake, a path
    // stream feeds ingestCrawlFromPaths — all stages are stateless
    // (records → HTTP split → HTML → langId), so Append mode streams them
    val warcDir = Files.createTempDirectory("stream-warc").toFile
    def page(i: Int) = s"<html><head><title>P$i</title></head><body>" +
      s"<p>stream body number $i</p></body></html>"
    def seg(ids: Seq[Int], gz: Boolean) = Warc.encodeBlob(
      ids.map(i => Warc.responseRecord(s"https://s.com/p/$i",
        "2026-01-01T00:00:00Z", page(i))), gzipPerRecord = gz)
    java.nio.file.Files.write(
      new java.io.File(warcDir, "seg-0.warc.gz").toPath, seg(Seq(1, 2), gz = true))
    java.nio.file.Files.write(
      new java.io.File(warcDir, "seg-1.warc").toPath, seg(Seq(3), gz = false))
    val pathsDir = Files.createTempDirectory("stream-paths").toFile.getPath + "/data"
    val batchPaths = Warc.filesAt(spark, warcDir.getAbsolutePath + "/*")
    batchPaths.coalesce(1).write.parquet(pathsDir)
    val schema = spark.read.parquet(pathsDir).schema
    val stream = spark.readStream.schema(schema).parquet(pathsDir)
    val out = Curation.ingestCrawlFromPaths(stream)
    assert(out.isStreaming)
    val streamed = StreamingBinning.runToMemorySink(
      out, "crawl_sink", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    val batch = Curation.ingestCrawlFromPaths(batchPaths)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 3)
  }

  test("stateless calibration chain applies to a stream unchanged") {
    val dir = Files.createTempDirectory("stream-in2").toFile.getPath + "/data"
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 100.0))
      .toDF("ts", "value").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.transform(stream,
      df => df.withColumn("t_ns",
        graft.calibrate.Energy.tof2ns(col("value"), 2.0e-9, 1)))
    val sunk = StreamingBinning.runToMemorySink(out, "chain_sink", OutputMode.Append())
    assert(sunk.select("t_ns").as[Double].head() === 100.0 * 1e9 * 2.0e-9 * 2.0)
  }

  test("native quality kernels (entropy, compression ratio) stream unchanged") {
    val dir = Files.createTempDirectory("stream-qk").toFile.getPath + "/data"
    Seq((1L, "aab aab aab aab"), (2L, "mixed entropy content with words"))
      .toDF("doc_id", "text").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    def chain(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.pipeline.TextOps.charEntropy(col("text")).as("h"),
      graft.pipeline.TextOps.compressionRatio(col("text")).as("cr"))
    val out = StreamingBinning.transform(stream, chain)
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "qk_sink", OutputMode.Append())
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val batch = chain(spark.read.parquet(dir))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(sunk.toSeq === batch.toSeq)
  }

  test("stateless text-pipeline ops (gopher, pii, chunking) stream unchanged") {
    val dir = Files.createTempDirectory("stream-txt").toFile.getPath + "/data"
    val rows = Seq(
      (1L, "the cat sat with mat and dog ran far away today"),
      (2L, "contact user7@example.com for the offer and more with that"),
    )
    rows.toDF("doc_id", "text").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    // map-only operators compose on a stream exactly as on a batch frame:
    // redact -> chunk in one stateless chain
    def chain(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextOps.chunkTokens(
        graft.pipeline.TextOps.piiColumns(df, "text"),
        "pii_redacted", "doc_id", window = 6, stride = 6)
    val out = StreamingBinning.transform(stream, chain)
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "txt_sink", OutputMode.Append())
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(t => (t._1, t._2))
    val batch = chain(spark.read.parquet(dir))
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(t => (t._1, t._2))
    assert(sunk.toSeq === batch.toSeq)
    assert(sunk.exists(_._3.contains("<EMAIL>"))) // redaction ran in-stream
    // the composite quality flag is equally stream-safe (no state, no join)
    val flags = StreamingBinning.runToMemorySink(
      StreamingBinning.transform(stream, df =>
        graft.pipeline.TextOps.gopherColumns(df, "text", "doc_id",
          minTokens = 5, minRequiredHits = 1, minAvgLen = 2.0)),
      "gopher_sink", OutputMode.Append())
      .select("doc_id", "gopher_keep").as[(Long, Int)].collect().toMap
    assert(flags === Map(1L -> 1, 2L -> 1))
  }

  test("model-apply passes (quality score, kmeans assign, pq encode) stream unchanged") {
    // the train-offline / score-on-stream split: all three apply passes
    // are stateless map-only expressions, so they run on a live stream
    // exactly as on the batch frame they were validated against
    val dir = Files.createTempDirectory("stream-model").toFile.getPath + "/data"
    Seq((1L, "the quick brown fox", Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, "zzzz zzzz zzzz", Seq(0.0f, 0.0f, 9.0f, 9.0f)))
      .toDF("doc_id", "text", "embedding").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val w = Array.tabulate(32)(i => (i % 5 - 2) / 10.0)
    val cents = Array(Array(0.5, 0.0, 0.0, 0.0), Array(0.0, 0.0, 9.0, 9.0))
    val model = graft.pipeline.Pq.Model(4, 2,
      Array.tabulate(2)(s => cents.map(_.slice(s * 2, (s + 1) * 2))))
    // DSIR λ estimated offline on the batch frame, applied on-stream
    val lambda = graft.pipeline.Dsir.importanceTable(
      spark.read.parquet(dir), "text", col("doc_id") === 1L, 32)
    def chain(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.pipeline.QualityModel.scoreColumn(col("text"), w, 0.0).as("q"),
      graft.pipeline.KMeans.assign(df, "embedding", cents).as("cluster"),
      graft.pipeline.Pq.encodeColumn(df, "embedding", model).as("code"),
      graft.pipeline.Dsir.importanceWeightColumn(col("text"), lambda).as("dsir"))
    val out = StreamingBinning.transform(stream, chain)
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "model_sink", OutputMode.Append())
      .as[(Long, Double, Int, Seq[Int], Double)].collect().sortBy(_._1)
    val batch = chain(spark.read.parquet(dir))
      .as[(Long, Double, Int, Seq[Int], Double)].collect().sortBy(_._1)
    assert(sunk.toSeq === batch.toSeq)
    assert(sunk.map(_._3).toSeq === Seq(0, 1))
    assert(sunk(0)._5 > sunk(1)._5) // target-slice doc scores higher
  }

  test("bloom fingerprint dedupes a stream against a historical corpus") {
    // the incremental-ingest pattern: fingerprint yesterday's corpus once
    // (driver-side bytes, broadcast into the codegen probe), then drop
    // already-seen documents from the live stream with a stateless filter
    val history = Seq((1L, "seen before"), (2L, "also seen"))
      .toDF("doc_id", "text")
    val fp = graft.pipeline.Dedup.buildBloomFingerprint(
      history, "text", expectedItems = 1000, fpp = 0.001)
    val dir = Files.createTempDirectory("stream-bloom").toFile.getPath + "/data"
    Seq((10L, "seen before"), (11L, "genuinely new"), (12L, "also seen"),
      (13L, "another fresh one"))
      .toDF("doc_id", "text").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.transform(stream,
      df => graft.pipeline.Dedup.dropBloomSeen(df, "text", fp))
    assert(out.isStreaming)
    val kept = StreamingBinning.runToMemorySink(out, "bloom_sink", OutputMode.Append())
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(11L, 13L))
  }

  test("dedupWithinWatermark drops repeated keys on a stream") {
    val dir = Files.createTempDirectory("stream-in4").toFile.getPath + "/data"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "b"),
    ).toDF("ts", "key").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.dedupWithinWatermark(stream, Seq("key"), "ts", "10 minutes")
    val sunk = StreamingBinning.runToMemorySink(out, "dedup_sink", OutputMode.Append())
    assert(sunk.select("key").as[String].collect().sorted.toSeq === Seq("a", "b"))
  }

  test("dedupNearWithinWatermark collapses near-identical documents") {
    val dir = Files.createTempDirectory("stream-in6").toFile.getPath + "/data"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "the quick brown fox jumps over the lazy dog", 1L),
      // exact duplicate content → identical signature → dropped
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
        "the quick brown fox jumps over the lazy dog", 2L),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"),
        "completely different content about engines", 3L),
    ).toDF("ts", "text", "id").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.dedupNearWithinWatermark(
      stream, "text", "ts", "10 minutes")
    val sunk = StreamingBinning.runToMemorySink(out, "neardedup_sink", OutputMode.Append())
    assert(sunk.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    assert(!sunk.columns.contains("_sig"))
  }

  test("dedupNearWithinWatermark keeps distinct short documents") {
    // Regression: texts shorter than the shingle size share an empty
    // shingle set (identical all-null signature) — they must NOT collapse.
    val dir = Files.createTempDirectory("stream-in7").toFile.getPath + "/data"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "ab", 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "cd", 2L),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "", 3L),
      // exact duplicate short text still collapses (fingerprint equality)
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), "ab", 4L),
    ).toDF("ts", "text", "id").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.dedupNearWithinWatermark(
      stream, "text", "ts", "10 minutes")
    val sunk = StreamingBinning.runToMemorySink(out, "shortdedup_sink", OutputMode.Append())
    val ids = sunk.select("id").as[Long].collect().sorted.toSeq
    // which of the two "ab" arrivals survives depends on file read order
    assert(ids.length === 3)
    assert(ids.contains(2L) && ids.contains(3L))
    assert(ids.count(id => id == 1L || id == 4L) === 1)
  }

  test("sessionizeStream: session bounds and sizes match batch sessionize") {
    val dir = Files.createTempDirectory("stream-in7").toFile.getPath + "/data"
    // user u: events at 0s,10s then a 10-min gap then 700s,705s → 2 sessions
    // user v: one event → 1 session
    val rows = Seq(("u", 0L), ("u", 10L), ("u", 700L), ("u", 705L), ("v", 3L))
    rows.map { case (k, s) =>
      (k, new java.sql.Timestamp(1704067200000L + s * 1000))
    }.toDF("k", "ts").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.sessionizeStream(
      stream, "ts", Seq("k"), gap = "60 seconds", watermark = "0 seconds")
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "sess_sink", OutputMode.Complete())
      .select("k", "session_start", "n_events")
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    val t0 = 1704067200000L
    assert(sunk === Set(
      ("u", new java.sql.Timestamp(t0), 2L),
      ("u", new java.sql.Timestamp(t0 + 700000), 2L),
      ("v", new java.sql.Timestamp(t0 + 3000), 1L)))
    // batch parity: same number of sessions per key as DfOps.sessionize
    val batch = graft.dfops.DfOps.sessionize(
      rows.toDF("k", "t").withColumn("t", col("t") * 1000), // ms
      "t", lit(60000L), Seq("k"))
      .groupBy("k").agg(countDistinct("session_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(batch === Map("u" -> 2L, "v" -> 1L))
  }

  test("Misra-Gries sketch aggregates over a stream (complete mode)") {
    import org.apache.spark.sql.GraftBridge
    val dir = Files.createTempDirectory("stream-mg").toFile.getPath + "/data"
    // heavy item ×60 + 40 singletons, across two files
    val items = (Seq.fill(30)("heavy") ++ (0 until 20).map(i => s"t$i")) ++
      (Seq.fill(30)("heavy") ++ (20 until 40).map(i => s"t$i"))
    items.take(50).toDF("item").coalesce(1).write.mode("append").parquet(dir)
    items.drop(50).toDF("item").coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val agg = graft.pipeline.MisraGriesAgg(
      GraftBridge.expression(stream.col("item")), 8).toAggregateExpression()
    val out = stream.agg(GraftBridge.column(agg).as("mg"))
    assert(out.isStreaming)
    val row = StreamingBinning.runToMemorySink(
      out, "mg_sink", OutputMode.Complete()).head().getStruct(0)
    assert(row.getLong(0) === 100L)
    val cand = row.getMap[String, Long](1)
    // n/(k+1) = 100/9 ≈ 11.1 < 60 → "heavy" must survive the stream too
    assert(cand.contains("heavy"), cand.toString)
    assert(cand.size <= 8)
  }

  test("intervalJoin: stream-stream attribution matches the batch join") {
    val t0 = 1704067200000L
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    // impressions for u/v; clicks: one in-window (8s after imp1), one
    // too late (120s after imp1), one for a user with no impression
    val imps = Seq(("u", ts(0), "i1"), ("u", ts(60), "i2"), ("v", ts(5), "i3"))
    val clicks = Seq(("u", ts(8), "c1"), ("u", ts(125), "c2"), ("w", ts(9), "c3"))
    val impDir = Files.createTempDirectory("stream-ij").toFile.getPath + "/imps"
    val clkDir = Files.createTempDirectory("stream-ij").toFile.getPath + "/clicks"
    imps.toDF("user", "imp_ts", "imp_id").write.parquet(impDir)
    clicks.toDF("user", "clk_ts", "clk_id").write.parquet(clkDir)
    val impStream = spark.readStream
      .schema(spark.read.parquet(impDir).schema).parquet(impDir)
    val clkStream = spark.readStream
      .schema(spark.read.parquet(clkDir).schema).parquet(clkDir)
    val joined = StreamingBinning.intervalJoin(
      impStream, clkStream, Seq("user"), "imp_ts", "clk_ts",
      maxLag = "30 seconds", watermark = "0 seconds")
    assert(joined.isStreaming)
    val got = StreamingBinning.runToMemorySink(
      joined.select(col("imp_id"), col("clk_id")),
      "ij_sink", OutputMode.Append())
      .as[(String, String)].collect().toSet
    // c1 (t=8) attributes to i1 (t=0, within 30s) only: i2 is later than
    // the click; c2 is beyond every window; c3 has no impression
    assert(got === Set(("i1", "c1")))
    // batch parity: the same operator composes on static frames
    val batch = StreamingBinning.intervalJoin(
      imps.toDF("user", "imp_ts", "imp_id"),
      clicks.toDF("user", "clk_ts", "clk_id"),
      Seq("user"), "imp_ts", "clk_ts", "30 seconds", "0 seconds")
      .select(col("imp_id"), col("clk_id"))
      .as[(String, String)].collect().toSet
    assert(batch === got)
  }

  test("cubeSnapshotSink densifies each micro-batch's windows") {
    val dir = Files.createTempDirectory("stream-in5").toFile.getPath + "/data"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 15.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 15.5),
    ).toDF("ts", "value").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val ax = UniformAxis("value", 4, 0.0, 40.0)
    val binned = StreamingBinning.windowedHistogram(stream, Seq(ax), "ts", "1 minute")
    @volatile var seen: Option[graft.binning.BinnedCube] = None
    val q = StreamingBinning.cubeSnapshotSink(binned, Seq(ax),
        (cube, _) => seen = Some(cube))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.isDefined)
    assert(seen.get.total === 3L)
    // center-range convention: kernel edges are [-5, 35), width 10
    assert(seen.get(1) === 1L) // 5.0 → bin 1
    assert(seen.get(2) === 2L) // 15.x → bin 2
  }

  test("cubeSnapshotSink stateDir: snapshots stay complete across a" +
      " kill/restart (fresh sink, same checkpoint + state)") {
    val root = Files.createTempDirectory("stream-restart").toFile.getPath
    val dataDir = s"$root/data"
    val ckpt = s"$root/ckpt"
    val state = s"$root/state"
    val ax = UniformAxis("value", 4, 0.0, 40.0)
    def startSink(onCube: graft.binning.BinnedCube => Unit) = {
      val schema = spark.read.parquet(dataDir).schema
      val stream = spark.readStream.schema(schema).parquet(dataDir)
      val binned = StreamingBinning.windowedHistogram(
        stream, Seq(ax), "ts", "1 minute")
      StreamingBinning.cubeSnapshotSink(binned, Seq(ax),
          (cube, _) => onCube(cube), stateDir = Some(state))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    // run 1: three events land in bins 1 and 2 of window 00:00
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 15.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 15.5),
    ).toDF("ts", "value").coalesce(1).write.parquet(dataDir)
    @volatile var run1: Option[graft.binning.BinnedCube] = None
    val q1 = startSink(c => run1 = Some(c))
    q1.awaitTermination()
    assert(run1.get.total === 3L)
    // kill happened here. run 2 is a FRESH sink instance (empty in-memory
    // accumulator) on the same checkpoint: the new file only touches bin 3
    // and a later window, so Update mode never re-delivers bins 1/2 —
    // without the stateDir restore they would vanish from snapshots
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 25.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:10"), 25.5),
    ).toDF("ts", "value").coalesce(1).write.mode("append").parquet(dataDir)
    @volatile var run2: Option[graft.binning.BinnedCube] = None
    val q2 = startSink(c => run2 = Some(c))
    q2.awaitTermination()
    val got = run2.get
    // snapshot across both runs == batch recompute over ALL data
    val batch = Binning.histogram(spark.read.parquet(dataDir), Seq(ax))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.total === 5L)
    (0 until 4).foreach { b =>
      assert(got(b) === batch.getOrElse(b.toLong, 0L), s"bin $b")
    }
    // and the persisted state file is present + bounded
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(state, "acc.bin")))
  }

  test("cubeSnapshotSink stateDir: hostile acc.bin (lying entry count," +
      " out-of-range bin index, wrong axis count) fails restore with" +
      " NAMED errors") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val ax = UniformAxis("value", 4, 0.0, 40.0)
    // handcraft state files against the documented layout: magic,
    // version, nAxes, nEntries ints then per-entry longs
    def accBin(nAxes: Int, claimedEntries: Int,
        entries: Seq[Seq[Long]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(0x47525354); out.writeInt(1)
      out.writeInt(nAxes); out.writeInt(claimedEntries)
      entries.foreach(_.foreach(out.writeLong))
      out.close(); bos.toByteArray
    }
    def runWith(bytes: Array[Byte]): Throwable = {
      val root = Files.createTempDirectory("stream-hostile").toFile.getPath
      val dataDir = s"$root/data"
      val state = s"$root/state"
      JFiles.createDirectories(JPaths.get(state))
      JFiles.write(JPaths.get(state, "acc.bin"), bytes)
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0))
        .toDF("ts", "value").coalesce(1).write.parquet(dataDir)
      val schema = spark.read.parquet(dataDir).schema
      val stream = spark.readStream.schema(schema).parquet(dataDir)
      val binned = StreamingBinning.windowedHistogram(
        stream, Seq(ax), "ts", "1 minute")
      val q = StreamingBinning.cubeSnapshotSink(binned, Seq(ax),
          (_, _) => (), stateDir = Some(state))
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.awaitTermination())
    }
    def rootMessage(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // (a) claims 100 entries, holds one — length check fires BEFORE any
    // entry parse (a truncated file must not surface as raw EOFException)
    val lying = runWith(accBin(1, 100, Seq(Seq(0L, 1L, 2L))))
    assert(rootMessage(lying).contains("truncated or corrupt state"))
    // (b) bin index 9 on a 4-bin axis: a state file from a DIFFERENT
    // binning config must refuse at restore, not crash the densify loop
    val outOfRange = runWith(accBin(1, 1, Seq(Seq(0L, 9L, 2L))))
    assert(rootMessage(outOfRange).contains("out of range for axis"))
    // (c) wrong axis count names the stale dir
    val wrongAxes = runWith(accBin(3, 0, Seq.empty))
    assert(rootMessage(wrongAxes).contains("stale dir"))
  }

  test("funnelStream matches the batch funnel and carries state across batches") {
    val steps = Seq("A", "B", "C")
    val rows = Seq(
      (1L, 1L, "A"), (1L, 5L, "B"), (1L, 9L, "C"), // completes
      (2L, 3L, "B"), (2L, 4L, "A"), (2L, 4L, "B"), // stalls at A
      (3L, 1L, "C"), (3L, 2L, "A"))                // stalls at A
    val dir = Files.createTempDirectory("stream-funnel").toFile.getPath + "/data"
    // two ts-ordered batches: file boundaries become micro-batches
    // (maxFilesPerTrigger = 1), so state must carry across them
    rows.filter(_._2 <= 4).toDF("user_id", "ts", "event_type")
      .repartition(1).write.parquet(dir)
    rows.filter(_._2 > 4).toDF("user_id", "ts", "event_type")
      .repartition(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = StreamingBinning.funnelStream(stream, "ts", "event_type",
      "user_id", steps)
    val sunk = StreamingBinning.runToMemorySink(out, "funnel_sink",
      OutputMode.Update())
    // memory sink in Update mode appends every emission; the LAST one
    // per key is the final state
    val finalDepth = sunk.collect().zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getInt(1) }
    val batch = graft.dfops.DfOps.funnelDepth(
      rows.toDF("user_id", "ts", "event_type"),
      "ts", "event_type", Seq("user_id"), steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(finalDepth === batch, s"stream $finalDepth vs batch $batch")
    assert(finalDepth === Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("psiStream reports per-micro-batch drift equal to the batch PSI") {
    import graft.binning.UniformAxis
    val ax = UniformAxis("v", 10, 0.0, 10.0)
    val baseline = (0 until 1000).map(i => (i % 10).toDouble).toDF("v")
    val dir = Files.createTempDirectory("stream-psi").toFile.getPath + "/data"
    // batch 0 matches the baseline; batch 1 is concentrated (drifted)
    val b0 = (0 until 500).map(i => (i % 10).toDouble)
    val b1 = (0 until 500).map(i => (i % 2).toDouble)
    b0.toDF("v").repartition(1).write.parquet(dir)
    b1.toDF("v").repartition(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val reports = scala.collection.mutable.Map.empty[Long, Double]
    val q = StreamingBinning.psiStream(stream, baseline, ax,
      (id, rep) => reports.synchronized {
        reports(id) = rep.select("psi").head().getDouble(0)
      })
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(reports.keySet === Set(0L, 1L))
    // micro-batch order is file order (parquet part files sort by name);
    // match each stream report to its batch-computed counterpart
    val expect = Seq(b0, b1).map(rows =>
      graft.pipeline.Drift.psiReport(baseline, rows.toDF("v"), ax)
        .select("psi").head().getDouble(0)).sorted
    assert(reports.values.toSeq.sorted === expect)
    // and the drifted batch reads as "shifted" while the matching one
    // is near zero
    assert(reports.values.min < 0.01)
    assert(reports.values.max > 0.25)
  }

  test("runningSectorMeans keeps per-key state across micro-batches") {
    val dir = Files.createTempDirectory("stream-in3").toFile.getPath + "/data"
    // the null-key row must be DROPPED, not kill the live query (the
    // primitive tuple encoder throws on null — self-review round-13)
    Seq((Some(0L), 10.0), (Some(0L), 20.0), (Some(1L), 5.0), (None, 7.0))
      .toDF("sector", "v").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingBinning.runningSectorMeans(stream, "sector", "v")
    val sunk = StreamingBinning.runToMemorySink(out, "state_sink", OutputMode.Update())
    val byKey = sunk.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(byKey(0L) === ((2L, 15.0)))
    assert(byKey(1L) === ((1L, 5.0)))
  }

  test("scd2Stream closes intervals across micro-batches, matching batch scd2") {
    val rows = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 50L, "a"),
      (2L, 15L, "x"), (2L, 60L, "y"),
      (3L, 5L, "q")) // never changes -> no closed rows
    val dir = Files.createTempDirectory("stream-scd2").toFile.getPath + "/data"
    // ts-ordered file batches; a change arriving in batch 2 must close an
    // interval opened in batch 1 (state carries across)
    rows.filter(_._2 <= 30).toDF("k", "t", "v")
      .repartition(1).write.parquet(dir)
    rows.filter(_._2 > 30).toDF("k", "t", "v")
      .repartition(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = StreamingBinning.scd2Stream(stream, "k", "t", "v")
    val sunk = StreamingBinning.runToMemorySink(out, "scd2_sink",
      OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // batch reference: its non-current rows are exactly the closed set
    val batch = graft.dfops.History.scd2(rows.toDF("k", "t", "v"),
      Seq("k"), "t", Seq("v"))
      .filter(!org.apache.spark.sql.functions.col("is_current"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"))).toSet
    assert(sunk === batch)
    assert(sunk === Set((1L, "a", 10L, 30L), (1L, "b", 30L, 50L),
      (2L, "x", 15L, 60L)))
  }

  test("semi-structured + URL curation ops stream unchanged") {
    val dir = Files.createTempDirectory("stream-json").toFile.getPath + "/data"
    Seq(
      (1L, """{"k": 7}""", "https://www.a.example.co.uk/x/y?id=1&utm_source=f"),
      (2L, """{"k": 99}""", "http://b.site.com/p"),
      (3L, """broken""", "https://c.spam.com/z"),
    ).toDF("id", "props", "url").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    def chain(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.UrlOps.urlColumns(
        graft.dfops.SemiStructured.extractJson(df, "props",
          Map("k" -> (("$.k", org.apache.spark.sql.types.IntegerType)))),
        "url")
        .select("id", "k", "url_domain", "path_depth", "url_clean")
    val out = StreamingBinning.transform(stream, chain)
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "json_url_sink",
      OutputMode.Append()).collect().sortBy(_.getLong(0))
    val batch = chain(spark.read.parquet(dir)).collect().sortBy(_.getLong(0))
    assert(sunk.toSeq === batch.toSeq)
    assert(sunk(0).getAs[String]("url_domain") === "example.co.uk")
    assert(sunk(0).getAs[String]("url_clean") ===
      "https://www.a.example.co.uk/x/y?id=1")
    assert(sunk(2).getAs[Any]("k") === null) // malformed JSON -> null, no task failure
  }

  test("HTML extraction chain streams unchanged (crawl-ingest shape)") {
    val dir = Files.createTempDirectory("stream-html").toFile.getPath + "/data"
    Seq(
      (1L, "<html><head><title>T1</title></head><body><h1>Hello</h1>" +
        "<p>the quick brown fox</p><a href='https://a.com/x'>l</a></body></html>"),
      (2L, "<p>plain &amp; simple</p><script>skip()</script>"),
      (3L, "no markup at all"),
    ).toDF("doc_id", "html").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    // extract -> token count on the extracted text, one stateless chain
    def chain(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Html.htmlColumns(df, "html")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("plain_text"),
          org.apache.spark.sql.functions.col("html_title"),
          org.apache.spark.sql.functions.col("n_links"),
          graft.pipeline.TextOps.tokenCount(
            org.apache.spark.sql.functions.col("plain_text")).cast("long")
            .as("n_tokens"))
    val out = StreamingBinning.transform(stream, chain)
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "html_sink",
      OutputMode.Append()).collect().sortBy(_.getLong(0))
    val batch = chain(spark.read.parquet(dir)).collect().sortBy(_.getLong(0))
    assert(sunk.toSeq === batch.toSeq)
    assert(sunk(0).getAs[String]("plain_text") === "Hello\nthe quick brown fox\nl")
    assert(sunk(0).getAs[Long]("n_links") === 1L)
    assert(sunk(1).getAs[String]("plain_text") === "plain & simple")
    assert(sunk(2).getAs[String]("html_title") === null)
  }

  test("WARC crawl ingestion streams unchanged (binary blobs → WET rows)") {
    val dir = Files.createTempDirectory("stream-warc").toFile.getPath + "/data"
    def page(i: Int) = s"<html><head><title>P$i</title></head><body>" +
      s"<p>stream page $i</p></body></html>"
    def blob(i: Int) = graft.pipeline.Warc.encodeBlob(Seq(
      graft.pipeline.Warc.responseRecord(s"https://s/$i", "d", page(i))),
      gzipPerRecord = i % 2 == 0)
    (1 to 4).map(i => (i.toLong, blob(i)))
      .toDF("file_id", "warc").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    def chain(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Warc.responses(df, "warc")
        .select(org.apache.spark.sql.functions.col("file_id"),
          org.apache.spark.sql.functions.col("target_uri"),
          graft.pipeline.Html.extractText(
            org.apache.spark.sql.functions.col("body")).as("text"))
    val out = StreamingBinning.transform(stream, chain)
    assert(out.isStreaming)
    val sunk = StreamingBinning.runToMemorySink(out, "warc_sink",
      OutputMode.Append()).collect().sortBy(_.getLong(0))
    val batch = chain(spark.read.parquet(dir)).collect().sortBy(_.getLong(0))
    assert(sunk.toSeq === batch.toSeq)
    assert(sunk.length === 4)
    assert(sunk(0).getAs[String]("text") === "stream page 1")
  }

  test("trigram LM scoring on a stream: frozen tables, micro-batch == batch") {
    import graft.pipeline.TextOps
    val lm = TextOps.trigramLm(
      Seq("a b c", "a b d", "p q r").toDF("text"), "text")
    // freeze the tables (a production run would persist + reload them)
    val frozen = TextOps.TrigramLm(lm.uni.cache(), lm.bi.cache(),
      lm.tri.cache(), lm.totals.cache())
    val rows = Seq((1L, "a b c"), (2L, "a b z"), (3L, "m n"), (4L, "p q r x"))
    val dir = Files.createTempDirectory("stream-lm").toFile.getPath + "/d"
    rows.take(2).toDF("doc_id", "text").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = spark.readStream.schema(schema).parquet(dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= TextOps.scoreTrigram(batch, "text", "doc_id", frozen)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // second micro-batch: the LM must stay frozen, scores unchanged
    rows.drop(2).toDF("doc_id", "text").repartition(1).write
      .mode("append").parquet(dir)
    val q2 = spark.readStream.schema(schema).parquet(dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val seen = collected.map(_._1).toSet
        collected ++= TextOps.scoreTrigram(batch, "text", "doc_id", frozen)
          .filter(!org.apache.spark.sql.functions.col("doc_id")
            .isin(seen.toSeq: _*))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val batchScores = TextOps.scoreTrigram(rows.toDF("doc_id", "text"),
      "text", "doc_id", frozen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(collected.sortBy(_._1).toSeq === batchScores)
    assert(batchScores.map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("streaming retrieval: IVF batch search over a query stream " +
      "matches the batch answer (foreachBatch, frozen quantizer)") {
    import graft.pipeline.Ivf
    // queries ARRIVE as a stream; each micro-batch runs the same
    // Ivf.searchAll plan against the static corpus with a frozen
    // quantizer — the decontamination/retrieval-on-arrival shape for
    // embeddings (per-query top-k is independent across queries, so
    // micro-batching cannot change any answer)
    val dim = 4
    val centers = Array(
      Array(10.0, 0.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0))
    val corpus = (0 until 120).map { i =>
      val r = new scala.util.Random(i)
      val c = centers(i % 3)
      (i.toLong, Seq.tabulate(dim)(d => (c(d) + r.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") < 3).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val queries = corpus.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val dir = Files.createTempDirectory("stream-ann").toFile.getPath + "/q"
    queries.filter(col("q_id") < 3).repartition(1).write
      .mode("append").parquet(dir)
    queries.filter(col("q_id") >= 3).repartition(1).write
      .mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force >1 micro-batch
      .parquet(dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= Ivf.searchAll(batch, "q_vec", "q_id", corpus,
            "embedding", "vec_id", cents, k = 4, nProbe = 2)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val want = Ivf.searchAll(queries, "q_vec", "q_id", corpus,
      "embedding", "vec_id", cents, k = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.size === want.length)
    assert(got.toSet === want.toSet)
    assert(got.map(_._1).distinct.sorted === Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("indexStream: micro-batch ingestion equals a from-scratch build") {
    val idxDir = Files.createTempDirectory("stream-tidx-inc").toString
    val allDir = Files.createTempDirectory("stream-tidx-all").toString
    val rows = Seq(
      (1L, "spark joins shuffle data"),
      (2L, "a vector index prunes search"),
      (3L, "unrelated gardening prose"),
      (4L, "spark spark vector index"),
      (5L, "shuffle bounds join memory"))
    // seed the index with doc 1, then stream docs 2-5 in two micro-batches
    graft.pipeline.TextIndex.build(rows.take(1).toDF("doc_id", "text"),
      "text", "doc_id", idxDir, nBuckets = 8)
    val dir = Files.createTempDirectory("stream-tidx-src").toFile.getPath + "/d"
    rows.slice(1, 3).toDF("doc_id", "text").repartition(1).write.parquet(dir)
    rows.slice(3, 5).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingBinning.indexStream(stream, "text", "doc_id", idxDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.TextIndex.build(rows.toDF("doc_id", "text"),
      "text", "doc_id", allDir, nBuckets = 8)
    assert(graft.pipeline.TextIndex.loadStats(spark, idxDir) ===
      graft.pipeline.TextIndex.loadStats(spark, allDir))
    def run(dir0: String) =
      graft.pipeline.TextIndex.search(spark, dir0, Seq("spark", "vector"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(idxDir) === run(allDir))
  }

  test("BM25 scoring against a frozen index streams unchanged") {
    // index the historical corpus offline; score arriving docs with the
    // map-only scoreColumn (decontamination-on-ingest) — stateless, so
    // stream and batch agree exactly
    val idxDir = Files.createTempDirectory("stream-tidx").toString
    val histRows = Seq(
      (1L, "spark joins shuffle data"),
      (2L, "a vector index prunes search"),
      (3L, "unrelated gardening prose"))
    graft.pipeline.TextIndex.build(histRows.toDF("doc_id", "text"),
      "text", "doc_id", idxDir, nBuckets = 8)
    val (n, avg, _) = graft.pipeline.TextIndex.loadStats(spark, idxDir)
    val dfs = graft.pipeline.TextIndex.termDfs(spark, idxDir,
      Seq("spark", "vector"))
    val dir = Files.createTempDirectory("stream-bm25").toFile.getPath + "/data"
    Seq((10L, "spark vector spark"), (11L, "tea and gardening"))
      .toDF("doc_id", "text").repartition(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.pipeline.TextIndex.scoreColumn(
        col("text"), dfs, n, avg).as("bm25"))
    val sunk = StreamingBinning.runToMemorySink(
      StreamingBinning.transform(stream, score), "bm25_sink",
      OutputMode.Append())
      .as[(Long, Double)].collect().sortBy(_._1)
    val batch = score(spark.read.parquet(dir))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(sunk.toSeq === batch.toSeq)
    assert(sunk(0)._2 > 0.0 && sunk(1)._2 === 0.0)
  }
}
