package graft.loader

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LoaderSpec extends SparkSpec {
  import spark.implicits._

  test("naturalSort orders digit runs numerically") {
    val files = Seq("Scan10_2.h5", "Scan2_1.h5", "Scan2_10.h5", "Scan2_2.h5", "Scan1_1.h5")
    assert(GenericLoader.naturalSort(files) ===
      Seq("Scan1_1.h5", "Scan2_1.h5", "Scan2_2.h5", "Scan2_10.h5", "Scan10_2.h5"))
  }

  test("gatherFiles globs, sorts, and slices [start:end:step]") {
    val dir = Files.createTempDirectory("gather").toFile
    Seq("a3.csv", "a1.csv", "a10.csv", "a2.csv", "b.txt").foreach { n =>
      Files.writeString(new java.io.File(dir, n).toPath, "x\n1")
    }
    val all = GenericLoader.gatherFiles(dir.getPath, "csv")
    assert(all.map(new java.io.File(_).getName) === Seq("a1.csv", "a2.csv", "a3.csv", "a10.csv"))
    val sliced = GenericLoader.gatherFiles(dir.getPath, "csv", fStart = Some(1), fEnd = Some(4), fStep = 2)
    assert(sliced.map(new java.io.File(_).getName) === Seq("a2.csv", "a10.csv"))
  }

  test("GenericLoader.read unions per-file frames with stable ordering cols") {
    val dir = Files.createTempDirectory("generic").toFile
    Seq(("f1", Seq(1, 2)), ("f2", Seq(3, 4))).foreach { case (n, vs) =>
      Files.writeString(new java.io.File(dir, s"$n.csv").toPath,
        "v\n" + vs.mkString("\n"))
    }
    val files = GenericLoader.gatherFiles(dir.getPath, "csv")
    val df = GenericLoader.read(spark, files, "csv", withOrdering = true)
    assert(df.columns.toSet === Set("v", "file_id", "seq"))
    val byFile = df.groupBy("file_id").agg(collect_set("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toSet).toMap
    assert(byFile(0) === Set(1, 2))
    assert(byFile(1) === Set(3, 4))
  }

  test("electronIndex explodes pulses and enumerates electrons") {
    val raw = Seq(
      (1L, Seq(5.0, 5.0, 6.0, -1.0)), // two electrons in pulse 5, one in 6, one dropped
      (2L, Seq(7.0)),
    ).toDF("trainId", "pulseId")
    val idx = ChannelLoader.electronIndex(raw, ubidOffset = 0)
      .orderBy("trainId", "pulseId", "electronId")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(idx.toSeq === Seq((1L, 5.0, 0), (1L, 5.0, 1), (1L, 6.0, 0), (2L, 7.0, 0)))
  }

  test("ubidOffset shifts and negative pulses are dropped") {
    val raw = Seq((1L, Seq(3.0, 2.0))).toDF("trainId", "pulseId")
    val idx = ChannelLoader.electronIndex(raw, ubidOffset = 3)
      .select("pulseId").as[Double].collect().sorted
    assert(idx.toSeq === Seq(0.0)) // 3-3=0 kept, 2-3=-1 dropped
  }

  test("auxFanout slices fixed positions into named scalars") {
    val raw = Seq((1L, Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)))
      .toDF("trainId", "aux")
    val out = ChannelLoader.auxFanout(raw, "aux", ChannelLoader.AuxNames).first()
    assert(out.getAs[Double]("sampleBias") === 10.0)
    assert(out.getAs[Double]("dldTimeBinSize") === 70.0)
  }

  test("assemble: full-outer join + ffill of train values + timed frame") {
    val electrons = Seq(
      (1L, 0L, 0L, 100.0), (1L, 0L, 1L, 101.0), (1L, 1L, 0L, 102.0),
      (2L, 0L, 0L, 103.0),
    ).toDF("trainId", "pulseId", "electronId", "dldTime")
    val pulse = Seq((1L, 0L, 7.5), (1L, 1L, 7.6), (2L, 0L, 7.7))
      .toDF("trainId", "pulseId", "bam")
    val train = Seq((1L, 0.5)).toDF("trainId", "sampleBias") // train 2 missing → ffilled
    val (events, timed) = ChannelLoader.assemble(
      electrons, Seq(pulse), Seq(train), "dldTime")
    val ev = events.orderBy("trainId", "pulseId", "electronId").collect()
    assert(ev.length === 4)
    // sampleBias forward-filled onto train 2
    assert(ev.forall(_.getAs[Double]("sampleBias") === 0.5))
    assert(ev.head.getAs[Double]("bam") === 7.5)
    // timed frame: one row per (train, pulse) where electronId == 0
    assert(timed.count() === 3)
  }

  test("bufferToParquet writes once and validates the channel schema") {
    val dir = Files.createTempDirectory("buffer").toFile.getPath + "/buf"
    val df = Seq((1L, 2.0)).toDF("trainId", "x")
    val loaded = ChannelLoader.bufferToParquet(df, dir, Seq("trainId", "x"))
    assert(loaded.count() === 1)
    val err = intercept[IllegalArgumentException] {
      ChannelLoader.bufferToParquet(df, dir, Seq("trainId", "missing_channel"))
    }
    assert(err.getMessage.contains("missing_channel"))
  }

  test("getFilesFromRunId resolves per-facility patterns") {
    val dir = Files.createTempDirectory("runs").toFile
    Seq("Scan0030_1.h5", "Scan0030_2.h5", "Scan0031_1.h5", "other.h5").foreach { n =>
      Files.writeString(new java.io.File(dir, n).toPath, "x")
    }
    val files = GenericLoader.getFilesFromRunId(dir.getPath, "0030", "h5", "Scan{run}_*")
    assert(files.map(new java.io.File(_).getName) === Seq("Scan0030_1.h5", "Scan0030_2.h5"))
    intercept[IllegalArgumentException] {
      GenericLoader.getFilesFromRunId(dir.getPath, "9999", "h5", "Scan{run}_*")
    }
  }

  test("segmentMacrobunches splits concatenated pulse arrays on descents") {
    // S7: pulse ids [0,1,2, 0,1, 0] = three macrobunches in one train
    val raw = Seq((1L, Seq(0.0, 1.0, 2.0, 0.0, 1.0, 0.0)), (2L, Seq(5.0, 6.0)))
      .toDF("trainId", "pulseId")
    val out = ChannelLoader.segmentMacrobunches(raw)
      .orderBy("trainId", "macrobunchId", "pulse")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq === Seq(0L, 0L, 0L, 1L, 1L, 2L))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq(0L, 0L))
  }

  test("countRate and elapsedTime aggregate timestamps") {
    val df = Seq((0.0, 1L), (10.0, 2L), (20.0, 3L)).toDF("ts", "v")
    assert(GenericLoader.elapsedTime(df, "ts") === 20.0)
    assert(GenericLoader.countRate(df, "ts") === 3.0 / 20.0)
  }

  test("StreamFixture: binary stream files round-trip to the event table") {
    val dir = Files.createTempDirectory("gsd").toFile.getPath
    // file written out of order on purpose: natural sort fixes ingestion order
    StreamFixture.write(s"$dir/Scan2.gsd", StreamFixture.StreamData(
      startTs = 2000.0,
      channels = Seq(
        "Stream_0" -> Array(10.0, 11.0, 12.0),
        "Stream_1" -> Array(0.5, 0.6, 0.7),
        "Stream_9" -> Array(9.9, 9.8, 9.7)), // unmapped dataset: skipped
      msMarkers = Array(1L, 3L)))
    StreamFixture.write(s"$dir/Scan1.gsd", StreamFixture.StreamData(
      startTs = 1000.0,
      channels = Seq(
        "Stream_0" -> Array(1.0, 2.0, 3.0, 4.0),
        "Stream_1" -> Array(0.1, 0.2, 0.3, 0.4)),
      msMarkers = Array(2L, 3L, 4L)))
    val aliases = Seq("Stream_0" -> "X", "Stream_1" -> "t")
    val events = StreamFixture.ingest(spark,
      Seq(s"$dir/Scan2.gsd", s"$dir/Scan1.gsd"), aliases)
    assert(events.columns.toSeq === Seq("file_id", "seq", "ts", "X", "t"))
    val rows = events.orderBy("file_id", "seq")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length === 7)
    // Scan1 first (natural sort), its 4 events in file order
    assert(rows.take(4).map(_._4).toSeq === Seq(1.0, 2.0, 3.0, 4.0))
    // S4 step timestamps: markers (2,3,4) -> events 0,1 in ms 0; 2 in ms 1; 3 in ms 2
    assert(rows.take(4).map(_._3).toSeq === Seq(1000.0, 1000.0, 1000.001, 1000.002))
    assert(rows.drop(4).map(_._4).toSeq === Seq(10.0, 11.0, 12.0))
    assert(rows.drop(4).map(_._3).toSeq === Seq(2000.0, 2000.001, 2000.001))

    // F6 buffering round-trip: write-once parquet, schema-checked reuse
    val buf = s"$dir/buffer"
    val buffered = ChannelLoader.bufferToParquet(events, buf, Seq("X", "t", "ts"))
    assert(buffered.count() === 7)
    val again = ChannelLoader.bufferToParquet(
      spark.emptyDataFrame, buf, Seq("X", "t", "ts")) // must NOT rewrite
    assert(again.count() === 7)
    intercept[IllegalArgumentException] {
      ChannelLoader.bufferToParquet(events, buf, Seq("X", "missing_channel"))
    }
  }

  test("StreamFixture: timed table samples the last event per ms marker") {
    val dir = Files.createTempDirectory("gsd2").toFile.getPath
    StreamFixture.write(s"$dir/Scan0.gsd", StreamFixture.StreamData(
      startTs = 100.0,
      channels = Seq("Stream_0" -> Array(1.0, 2.0, 3.0, 4.0)),
      msMarkers = Array(0L, 2L, 4L)))
    val timed = StreamFixture.ingestTimed(spark, Seq(s"$dir/Scan0.gsd"),
      Seq("Stream_0" -> "X"))
    val rows = timed.orderBy("ms").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // marker 0 (no events yet) clamps to the first value; marker 2 -> value[1];
    // marker 4 -> value[3]  (g_dataset[int(point)-1])
    assert(rows.toSeq === Seq((0L, 100.0, 1.0), (1L, 100.001, 2.0), (2L, 100.002, 4.0)))
  }

  test("StreamFixture: missing configured dataset fails the ingest") {
    val dir = Files.createTempDirectory("gsd3").toFile.getPath
    StreamFixture.write(s"$dir/Scan0.gsd", StreamFixture.StreamData(
      startTs = 0.0, channels = Seq("Stream_0" -> Array(1.0)),
      msMarkers = Array(1L)))
    val bad = StreamFixture.ingest(spark, Seq(s"$dir/Scan0.gsd"),
      Seq("Stream_0" -> "X", "Stream_7" -> "Y"))
    val e = intercept[org.apache.spark.SparkException] { bad.collect() }
    assert(e.getMessage.contains("missing datasets")
      || Option(e.getCause).exists(_.getMessage.contains("missing datasets")))
  }
}
