package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** A local filesystem whose RECURSIVE delete refuses (returns false,
  * as Hadoop filesystems may on races or permission edges) — lets a
  * spec pin that writeRecords' retry-wipe is loud on a failed wipe
  * instead of silently mixing stale shards into the new job's lake.
  * Registered under the `faildel` scheme via `fs.faildel.impl`;
  * instantiated reflectively by Hadoop, so it must be a public
  * top-level class with a no-arg constructor.
  */
class FailingDeleteFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "faildel"
  override def getUri: java.net.URI = java.net.URI.create("faildel:///")
  override def delete(p: org.apache.hadoop.fs.Path,
      recursive: Boolean): Boolean =
    if (recursive) false else super.delete(p, recursive)
}

class TfRecordSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("tfrec").toString

  test("framing matches the public TFRecord spec byte for byte") {
    // golden computed with an INDEPENDENT (Python) CRC32C + framing
    // implementation, itself validated against the standard Castagnoli
    // check value crc32c("123456789") == 0xE3069283
    val d = dir()
    val n = TfRecord.writeRecords(
      Seq(Tuple1("hello tfrecord".getBytes("UTF-8"))).toDF("rec")
        .coalesce(1),
      "rec", s"$d/lake")
    assert(n === 1L)
    val shard = new java.io.File(s"$d/lake").listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = Files.readAllBytes(shard.toPath)
    val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
    assert(hex === "0e00000000000000c5e5693f68656c6c6f2074667265636f72649f5b7622")
  }

  test("record round-trip across shards preserves bytes and count") {
    val d = dir()
    val recs = (0 until 257).map(i =>
      Tuple1(Array.tabulate(i % 50 + 1)(j => ((i * 31 + j) % 256).toByte)))
    val written = TfRecord.writeRecords(
      recs.toDF("rec").repartition(4), "rec", s"$d/lake")
    assert(written === 257L)
    val back = TfRecord.readRecords(spark, s"$d/lake")
      .select("record").collect().map(_.getAs[Array[Byte]](0))
    assert(back.length === 257)
    def key(b: Array[Byte]) = b.toSeq
    assert(back.map(key).sortBy(_.mkString(",")).toSeq ===
      recs.map(r => key(r._1)).sortBy(_.mkString(",")).toSeq)
  }

  test("hostile input: corrupt CRC, lying length, truncation all fail" +
      " with NAMED errors") {
    val d = dir()
    TfRecord.writeRecords(Seq(Tuple1("payload-bytes".getBytes))
      .toDF("rec").coalesce(1), "rec", s"$d/lake")
    val shard = new java.io.File(s"$d/lake").listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head.toPath
    val good = Files.readAllBytes(shard)
    def parse(b: Array[Byte], verify: Boolean = true,
        maxRec: Long = 1L << 30) =
      TfRecord.recordIterator(new java.io.ByteArrayInputStream(b),
        maxRec, verify).toSeq
    // flip a data byte -> data checksum mismatch
    val flipped = good.clone(); flipped(14) = (flipped(14) ^ 1).toByte
    val e1 = intercept[IllegalArgumentException](parse(flipped))
    assert(e1.getMessage.contains("data checksum mismatch"))
    // ... and with verification off the (wrong) bytes still parse
    assert(parse(flipped, verify = false).head.length === 13)
    // lying giant length: bounded BEFORE allocation
    val lying = good.clone()
    lying(6) = 0x7f.toByte // length |= 0x7f << 48
    val e2 = intercept[IllegalArgumentException](parse(lying, verify = false))
    assert(e2.getMessage.contains("exceeds maxRecordBytes"))
    // with verification on, the tampered length dies at its checksum
    val e2b = intercept[IllegalArgumentException](parse(lying))
    assert(e2b.getMessage.contains("length checksum mismatch"))
    // truncated tail
    val e3 = intercept[java.io.EOFException](
      parse(good.take(good.length - 2)))
    assert(e3.getMessage.contains("truncated"))
    // tight per-record cap also bounds honest records
    val e4 = intercept[IllegalArgumentException](parse(good, maxRec = 4))
    assert(e4.getMessage.contains("exceeds maxRecordBytes"))
  }

  test("Example proto: all feature kinds round-trip; unknown fields and" +
      " unpacked scalars are tolerated") {
    val feats = Map[String, TfRecord.FeatureValue](
      "text" -> TfRecord.BytesFeature(Seq("héllo".getBytes("UTF-8"))),
      "ids" -> TfRecord.Int64Feature(Seq(-1L, 0L, Long.MaxValue, 42L)),
      "vec" -> TfRecord.FloatFeature(Seq(1.5f, -0.25f, 0f)),
      "empty" -> TfRecord.Int64Feature(Seq.empty))
    val bytes = TfRecord.encodeExample(feats)
    val back = TfRecord.decodeExample(bytes)
    assert(back.keySet === feats.keySet)
    assert(new String(back("text").asInstanceOf[TfRecord.BytesFeature]
      .values.head, "UTF-8") === "héllo")
    assert(back("ids").asInstanceOf[TfRecord.Int64Feature].values ===
      Seq(-1L, 0L, Long.MaxValue, 42L))
    assert(back("vec").asInstanceOf[TfRecord.FloatFeature].values ===
      Seq(1.5f, -0.25f, 0f))
    assert(back("empty").asInstanceOf[TfRecord.Int64Feature].values.isEmpty)
    // identical maps encode identically (sorted feature order)
    assert(TfRecord.encodeExample(feats).toSeq === bytes.toSeq)
    // an UNKNOWN top-level field prepended must be skipped, not fatal:
    // field 9, wire 2, 3 payload bytes
    val unknown = Array[Byte](0x4a, 3, 1, 2, 3) ++ bytes
    assert(TfRecord.decodeExample(unknown).keySet === feats.keySet)
    // unpacked int64 element (tag 0x08) inside an Int64List also decodes
    // (proto parsers must accept both packed and unpacked)
    // Int64List{8, 7} unpacked = [0x08 0x07] wrapped as Feature field 3
    val unpackedFeature = Array[Byte](0x1a, 2, 0x08, 0x07)
    val entry = Array[Byte](0x0a, 1, 'x'.toByte, 0x12,
      unpackedFeature.length.toByte) ++ unpackedFeature
    val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val example = Array[Byte](0x0a, features.length.toByte) ++ features
    assert(TfRecord.decodeExample(example)("x")
      .asInstanceOf[TfRecord.Int64Feature].values === Seq(7L))
  }

  test("writeExamples/readExamples: typed round-trip incl. null features") {
    val d = dir()
    val df = Seq(
      (0L, Option("alpha doc"), Seq(1.0f, 2.5f)),
      (1L, None, Seq(0.5f)),
      (2L, Option("gamma"), Seq.empty[Float]),
    ).toDF("doc_id", "text", "vec")
    val n = TfRecord.writeExamples(df, s"$d/lake", Seq("doc_id", "text", "vec"))
    assert(n === 3L)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("vec", ArrayType(FloatType))))
    val back = TfRecord.readExamples(spark, s"$d/lake", schema)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)),
        Option(r.getSeq[Float](2)).map(_.toSeq)))
      .sortBy(_._1)
    assert(back(0) === ((0L, Some("alpha doc"), Some(Seq(1.0f, 2.5f)))))
    // null text was omitted from its record -> reads back null
    assert(back(1) === ((1L, None, Some(Seq(0.5f)))))
    // an EMPTY list is a present feature with zero elements, not null
    assert(back(2) === ((2L, Some("gamma"), Some(Seq.empty[Float]))))
  }

  test("gzip shards (.tfrecord.gz) round-trip records and Examples") {
    val d = dir()
    val recs = (0 until 40).map(i => Tuple1(s"gz record $i".getBytes))
    val n = TfRecord.writeRecords(recs.toDF("rec").repartition(3),
      "rec", s"$d/lake", compression = "GZIP")
    assert(n === 40L)
    val shardNames = new java.io.File(s"$d/lake").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // Hadoop local-FS .crc sidecars
      .filterNot(_ == "_SUCCESS")   // the driver's commit marker
    assert(shardNames.nonEmpty && shardNames.forall(_.endsWith(".tfrecord.gz")),
      shardNames.mkString(", "))
    val back = TfRecord.readRecords(spark, s"$d/lake")
      .select("record").collect()
      .map(r => new String(r.getAs[Array[Byte]](0))).sorted
    assert(back.toSeq === recs.map(r => new String(r._1)).sorted)
    // and the typed Example surface composes with gzip unchanged
    val df = Seq((7L, "zipped text")).toDF("doc_id", "text")
    TfRecord.writeExamples(df, s"$d/ex", Seq("doc_id", "text"),
      compression = "GZIP")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val row = TfRecord.readExamples(spark, s"$d/ex", schema).head()
    assert((row.getLong(0), row.getString(1)) === ((7L, "zipped text")))
  }

  test("compression matching is locale-independent: gzip/zlib round-trip" +
      " under a Turkish default locale (dotted-I case mapping)") {
    // tr_TR uppercases "gzip" to "GZİP" under default-locale
    // toUpperCase — the match must use Locale.ROOT or a legitimate
    // argument stops matching on such JVMs
    val saved = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      assert("gzip".toUpperCase !== "GZIP") // the hazard is real here
      val d = dir()
      for ((comp, ext) <- Seq("gzip" -> ".tfrecord.gz",
          "zlib" -> ".tfrecord.zlib")) {
        val n = TfRecord.writeRecords(
          Seq(Tuple1(s"$comp bytes".getBytes)).toDF("rec"),
          "rec", s"$d/$comp", compression = comp)
        assert(n === 1L)
        val shards = new java.io.File(s"$d/$comp").listFiles().map(_.getName)
          .filterNot(n => n.startsWith(".") || n == "_SUCCESS")
        assert(shards.forall(_.endsWith(ext)), shards.mkString(", "))
        val back = TfRecord.readRecords(spark, s"$d/$comp")
          .select("record").head().getAs[Array[Byte]](0)
        assert(new String(back) === s"$comp bytes")
      }
    } finally java.util.Locale.setDefault(saved)
  }

  test("inferSchema: kinds and multiplicity from a sample; mixed kinds" +
      " are a named error") {
    val d = dir()
    val df = Seq(
      (1L, "one", Seq(1.0f), Seq(10L, 11L)),
      (2L, "two", Seq(2.0f, 3.0f), Seq(20L)),
    ).toDF("id", "text", "vec", "tags")
    TfRecord.writeExamples(df, s"$d/lake", Seq("id", "text", "vec", "tags"))
    val inferred = TfRecord.inferSchema(spark, s"$d/lake")
    val byName = inferred.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("id") === LongType)
    assert(byName("text") === BinaryType) // bytes: the lossless default
    assert(byName("vec") === ArrayType(FloatType)) // multi in SOME record
    assert(byName("tags") === ArrayType(LongType))
    // and the inferred schema actually reads the lake back
    val back = TfRecord.readExamples(spark, s"$d/lake", inferred)
      .collect().map(r => (r.getLong(byName.keySet.toSeq.sorted.indexOf("id")),
        new String(r.getAs[Array[Byte]](inferred.fieldIndex("text")), "UTF-8")))
      .sortBy(_._1)
    assert(back.map(_._2).toSeq === Seq("one", "two"))
    // a feature changing kind across records must refuse, not guess
    val d2 = dir()
    val r1 = TfRecord.encodeExample(Map("x" -> TfRecord.Int64Feature(Seq(1L))))
    val r2 = TfRecord.encodeExample(Map("x" -> TfRecord.FloatFeature(Seq(1f))))
    TfRecord.writeRecords(Seq(Tuple1(r1), Tuple1(r2)).toDF("rec")
      .coalesce(1), "rec", s"$d2/lake")
    val e = intercept[IllegalArgumentException](
      TfRecord.inferSchema(spark, s"$d2/lake"))
    assert(e.getMessage.contains("changes kind"))
  }

  test("commit protocol: _SUCCESS marker gates reads; committed dirs" +
      " refuse re-write; uncommitted leftovers retry clean") {
    val d = dir()
    TfRecord.writeRecords(Seq(Tuple1(Array[Byte](1))).toDF("rec"),
      "rec", s"$d/lake")
    // the writer committed: marker present, read succeeds
    assert(new java.io.File(s"$d/lake/_SUCCESS").exists())
    assert(TfRecord.readRecords(spark, s"$d/lake").count() === 1L)
    // a COMMITTED dataset refuses a second write (would mix shards)
    val e = intercept[IllegalArgumentException](
      TfRecord.writeRecords(Seq(Tuple1(Array[Byte](2))).toDF("rec"),
        "rec", s"$d/lake"))
    assert(e.getMessage.contains("committed dataset"))
    // simulate a job that died after renaming SOME shards: marker gone
    assert(new java.io.File(s"$d/lake/_SUCCESS").delete())
    val e2 = intercept[IllegalArgumentException](
      TfRecord.readRecords(spark, s"$d/lake").count())
    assert(e2.getMessage.contains("_SUCCESS"))
    // external lakes (no marker by design) read with the flag
    assert(TfRecord.readRecords(spark, s"$d/lake",
      requireCommitted = false).count() === 1L)
    // and a RETRY of the write wipes the uncommitted leftovers cleanly
    val n = TfRecord.writeRecords(
      Seq(Tuple1(Array[Byte](2)), Tuple1(Array[Byte](3))).toDF("rec")
        .coalesce(1), "rec", s"$d/lake")
    assert(n === 2L)
    assert(TfRecord.readRecords(spark, s"$d/lake").count() === 2L)
    // attempt litter never survives the driver epilogue
    assert(!new java.io.File(s"$d/lake").listFiles()
      .exists(_.getName.startsWith("_tmp.")))
  }

  test("a retry-wipe whose recursive delete FAILS is a named error, not" +
      " a silent mix of stale shards into the new lake") {
    import java.nio.file.Paths
    val d = dir()
    // stale own-litter from a died job — eligible for the retry wipe
    Files.write(Paths.get(d, "part-00000.tfrecord"), Array[Byte](1, 2))
    spark.sparkContext.hadoopConfiguration
      .set("fs.faildel.impl", classOf[FailingDeleteFs].getName)
    val e = intercept[java.io.IOException](
      TfRecord.writeRecords(Seq(Tuple1(Array[Byte](9))).toDF("rec"),
        "rec", s"faildel:$d"))
    assert(e.getMessage.contains("could not wipe"), e.getMessage)
    // the stale shard is still there — refusal, not a half-wiped state
    assert(Files.exists(Paths.get(d, "part-00000.tfrecord")))
  }

  test("writeRecords refuses to wipe an uncommitted dir holding foreign" +
      " content; own-artifact-only litter still retries clean") {
    import java.nio.file.{Files, Paths}
    val d = dir()
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(d, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    // a lake written by another tool: .tfrecord shards under names this
    // writer never produces, no _SUCCESS marker — must NOT be destroyed
    put("extlake/data-00000-of-00001.tfrecord", Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException](
      TfRecord.writeRecords(Seq(Tuple1(Array[Byte](9))).toDF("rec"),
        "rec", s"$d/extlake"))
    assert(e.getMessage.contains("refusing to wipe"))
    assert(Files.exists(Paths.get(d, "extlake/data-00000-of-00001.tfrecord")),
      "foreign lake was destroyed")
    // a mistyped path pointing at arbitrary files is equally protected
    put("photos/img.png", Array[Byte](0x50))
    val e2 = intercept[IllegalArgumentException](
      TfRecord.writeRecords(Seq(Tuple1(Array[Byte](9))).toDF("rec"),
        "rec", s"$d/photos"))
    assert(e2.getMessage.contains("refusing to wipe"))
    assert(Files.exists(Paths.get(d, "photos/img.png")))
    // a SUBDIRECTORY is foreign content too, even under an own-like name
    put("sublake/part-00000.tfrecord/nested", Array[Byte](1))
    val e3 = intercept[IllegalArgumentException](
      TfRecord.writeRecords(Seq(Tuple1(Array[Byte](9))).toDF("rec"),
        "rec", s"$d/sublake"))
    assert(e3.getMessage.contains("refusing to wipe"))
    // own artifacts only (attempt tmp + shard names, no marker) = a
    // died prior writeRecords → wiped and retried clean
    put("ownlake/_tmp.part-00000.7", Array[Byte](1))
    put("ownlake/part-00000.tfrecord", Array[Byte](2))
    put("ownlake/part-00001.tfrecord.gz", Array[Byte](3))
    val n = TfRecord.writeRecords(
      Seq(Tuple1(Array[Byte](4))).toDF("rec").coalesce(1),
      "rec", s"$d/ownlake")
    assert(n === 1L)
    assert(TfRecord.readRecords(spark, s"$d/ownlake").count() === 1L)
  }

  test("an all-empty-partitions write commits a ZERO-shard lake that" +
      " reads back as an empty frame, not an error") {
    val d = dir()
    val n = TfRecord.writeRecords(
      Seq.empty[Tuple1[Array[Byte]]].toDF("rec"), "rec", s"$d/lake")
    assert(n === 0L)
    // the lake IS committed (marker present, no shards — every
    // partition was empty so no part files were renamed in)
    assert(new java.io.File(s"$d/lake/_SUCCESS").exists())
    val back = TfRecord.readRecords(spark, s"$d/lake")
    assert(back.count() === 0L)
    assert(back.schema.fieldNames.toSeq === Seq("path", "record"))
    // the typed surfaces ride the same path: an empty committed lake
    // reads as an empty TYPED frame too
    val seq = TfRecord.readSequenceExamples(spark, s"$d/lake",
      contextSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))),
      sequenceSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tokens",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
    assert(seq.count() === 0L)
    assert(seq.schema.fieldNames.toSeq === Seq("doc_id", "tokens"))
    // an UNcommitted shardless dir stays a loud error (wrong path /
    // never-ran write)
    assert(new java.io.File(s"$d/lake/_SUCCESS").delete())
    intercept[IllegalArgumentException](
      TfRecord.readRecords(spark, s"$d/lake", requireCommitted = false)
        .count())
  }

  test("readRecords marker error names the legacy-lake migration path") {
    import java.nio.file.{Files, Paths}
    val d = dir()
    TfRecord.writeRecords(Seq(Tuple1(Array[Byte](1))).toDF("rec"),
      "rec", s"$d/lake")
    Files.delete(Paths.get(d, "lake/_SUCCESS"))
    val e = intercept[IllegalArgumentException](
      TfRecord.readRecords(spark, s"$d/lake").count())
    // a pre-marker lake written by an older version of THIS library must
    // be pointed at the one-time migration, not just "another tool"
    assert(e.getMessage.contains("touch _SUCCESS"))
    assert(e.getMessage.contains("requireCommitted=false"))
  }

  test("readRecords runs exactly one task per shard file (round-robin," +
      " not hash-on-path)") {
    val d = dir()
    TfRecord.writeRecords(
      (0 until 64).map(i => Tuple1(s"rec $i".getBytes))
        .toDF("rec").repartition(8), "rec", s"$d/lake")
    val recs = TfRecord.readRecords(spark, s"$d/lake")
    // every partition holds the records of exactly one shard: distinct
    // paths per partition == 1, and no partition is empty
    val perPart = recs.rdd.mapPartitions { it =>
      Iterator.single(it.map(_.getString(0)).toSet.size)
    }.collect()
    assert(perPart.length === 8)
    assert(perPart.forall(_ === 1), perPart.mkString(","))
  }

  test("shardsToVisit bounds inferSchema's driver sweep to" +
      " min(shards, sampleRecords), evenly spread") {
    val shards = (0 until 1000).map(i => f"part-$i%05d")
    val v = TfRecord.shardsToVisit(shards, 10)
    assert(v.length === 10)
    assert(v.head === "part-00000") // first shard always sampled
    assert(v === v.sorted && v.distinct === v) // ordered, no repeats
    // evenly spread: consecutive picks ~100 apart
    val idx = v.map(s => s.drop(5).toInt)
    assert(idx.sliding(2).forall { case Seq(a, b) => b - a == 100 })
    // fewer shards than the sample -> all of them
    assert(TfRecord.shardsToVisit(shards.take(3), 10) === shards.take(3))
    // degenerate sample sizes still visit something
    assert(TfRecord.shardsToVisit(shards, 0).length === 1)
    // and end-to-end: a many-shard lake infers from a bounded sample
    val d = dir()
    val df = (0 until 40).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    TfRecord.writeExamples(df.repartition(20), s"$d/lake", Seq("id", "text"))
    val inferred = TfRecord.inferSchema(spark, s"$d/lake", sampleRecords = 5)
    assert(inferred.fieldNames.toSeq === Seq("id", "text"))
  }

  test("ZLIB shards (.tfrecord.zlib) round-trip; unknown compression is" +
      " a named error; bytes ARE raw zlib (RFC 1950)") {
    val d = dir()
    val recs = (0 until 30).map(i => Tuple1(s"zlib record $i".getBytes))
    val n = TfRecord.writeRecords(recs.toDF("rec").repartition(2),
      "rec", s"$d/lake", compression = "ZLIB")
    assert(n === 30L)
    val shards = new java.io.File(s"$d/lake").listFiles().map(_.getName)
      .filterNot(f => f.startsWith(".") || f == "_SUCCESS")
    assert(shards.nonEmpty && shards.forall(_.endsWith(".tfrecord.zlib")))
    // RFC 1950 header: CMF 0x78 (deflate, 32K window) in byte 0
    val raw = Files.readAllBytes(new java.io.File(s"$d/lake")
      .listFiles().filter(_.getName.endsWith(".zlib")).head.toPath)
    assert((raw(0) & 0xff) === 0x78)
    val back = TfRecord.readRecords(spark, s"$d/lake")
      .select("record").collect()
      .map(r => new String(r.getAs[Array[Byte]](0))).sorted
    assert(back.toSeq === recs.map(r => new String(r._1)).sorted)
    // Examples compose with ZLIB unchanged, incl. schema inference
    val df = Seq((3L, "zlib text")).toDF("doc_id", "text")
    TfRecord.writeExamples(df, s"$d/ex", Seq("doc_id", "text"),
      compression = "ZLIB")
    val inferred = TfRecord.inferSchema(spark, s"$d/ex")
    val row = TfRecord.readExamples(spark, s"$d/ex", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))).head()
    assert((row.getLong(0), row.getString(1)) === ((3L, "zlib text")))
    assert(inferred.fieldNames.toSeq === Seq("doc_id", "text"))
    val e = intercept[IllegalArgumentException](
      TfRecord.writeRecords(recs.toDF("rec"), "rec", s"$d/bad",
        compression = "LZ4"))
    assert(e.getMessage.contains("unknown compression"))
  }

  test("SequenceExample: context + feature_lists round-trip; interop" +
      " with the Example parser's Features layer; unknown fields skip") {
    val ctx = Map[String, TfRecord.FeatureValue](
      "utterance_id" -> TfRecord.BytesFeature(Seq("utt-42".getBytes)),
      "sample_rate" -> TfRecord.Int64Feature(Seq(16000L)))
    val lists = Map[String, Seq[TfRecord.FeatureValue]](
      "tokens" -> Seq(
        TfRecord.Int64Feature(Seq(5L, 7L)),
        TfRecord.Int64Feature(Seq(11L)),
        TfRecord.Int64Feature(Seq.empty)),
      "frames" -> Seq(
        TfRecord.FloatFeature(Seq(0.5f, -1.5f)),
        TfRecord.FloatFeature(Seq(2.25f))))
    val bytes = TfRecord.encodeSequenceExample(ctx, lists)
    val (c2, l2) = TfRecord.decodeSequenceExample(bytes)
    assert(c2.keySet === ctx.keySet)
    assert(new String(c2("utterance_id")
      .asInstanceOf[TfRecord.BytesFeature].values.head) === "utt-42")
    assert(c2("sample_rate") === TfRecord.Int64Feature(Seq(16000L)))
    assert(l2("tokens") === lists("tokens"))
    assert(l2("frames").map(_.asInstanceOf[TfRecord.FloatFeature].values)
      === Seq(Seq(0.5f, -1.5f), Seq(2.25f)))
    // determinism: identical inputs encode identically
    assert(TfRecord.encodeSequenceExample(ctx, lists).toSeq === bytes.toSeq)
    // unknown top-level field (field 9, wire 2) skips cleanly
    val unknown = Array[Byte](0x4a, 3, 1, 2, 3) ++ bytes
    assert(TfRecord.decodeSequenceExample(unknown)._2("tokens")
      === lists("tokens"))
    // empty SequenceExample decodes to empty maps
    assert(TfRecord.decodeSequenceExample(Array.empty) === ((Map.empty, Map.empty)))
  }

  test("writeSequenceExamples/readSequenceExamples: typed round-trip" +
      " (per-step scalars, per-step vectors, null context + sequence)") {
    val d = dir()
    val df = Seq(
      (0L, Option("utt-a"), Option(Seq(5L, 7L, 11L)),
        Option(Seq(Seq(0.5f, 1.5f), Seq(2.5f, 3.5f)))),
      (1L, None, Option(Seq(13L)), None),
      (2L, Option("utt-c"), None, Option(Seq(Seq(9.0f)))),
    ).toDF("id", "name", "tokens", "frames")
    val n = TfRecord.writeSequenceExamples(df, s"$d/lake",
      contextCols = Seq("id", "name"),
      sequenceCols = Seq("tokens", "frames"))
    assert(n === 3L)
    val ctxSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val seqSchema = StructType(Seq(
      StructField("tokens", ArrayType(LongType)),
      StructField("frames", ArrayType(ArrayType(FloatType)))))
    val back = TfRecord.readSequenceExamples(
        spark, s"$d/lake", ctxSchema, seqSchema)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getSeq[Long](2)).map(_.toSeq),
        Option(r.getSeq[scala.collection.Seq[Float]](3))
          .map(_.map(_.toSeq).toSeq)))
      .sortBy(_._1)
    assert(back(0) === ((0L, Some("utt-a"), Some(Seq(5L, 7L, 11L)),
      Some(Seq(Seq(0.5f, 1.5f), Seq(2.5f, 3.5f))))))
    // null context feature and null feature_list both read back null
    assert(back(1) === ((1L, None, Some(Seq(13L)), None)))
    assert(back(2) === ((2L, Some("utt-c"), None, Some(Seq(Seq(9.0f))))))
    // a non-array sequence column is a named error, write and read side
    val e = intercept[IllegalArgumentException](
      TfRecord.writeSequenceExamples(df, s"$d/bad",
        contextCols = Seq.empty, sequenceCols = Seq("id")))
    assert(e.getMessage.contains("must be array-typed"))
    val e2 = intercept[IllegalArgumentException](
      TfRecord.readSequenceExamples(spark, s"$d/lake",
        ctxSchema, StructType(Seq(StructField("tokens", LongType)))))
    assert(e2.getMessage.contains("must be array-typed"))
  }

  test("property: 300 random SequenceExamples encode/decode exactly") {
    val rnd = new scala.util.Random(16L)
    def randFeature(): TfRecord.FeatureValue = rnd.nextInt(3) match {
      case 0 => TfRecord.BytesFeature(Seq.fill(rnd.nextInt(3))(
        Array.fill(rnd.nextInt(20))(rnd.nextInt(256).toByte)))
      case 1 => TfRecord.Int64Feature(Seq.fill(rnd.nextInt(4))(rnd.nextLong()))
      case _ => TfRecord.FloatFeature(Seq.fill(rnd.nextInt(4))(rnd.nextFloat()))
    }
    def eq(a: TfRecord.FeatureValue, b: TfRecord.FeatureValue): Boolean =
      (a, b) match {
        case (TfRecord.BytesFeature(x), TfRecord.BytesFeature(y)) =>
          x.map(_.toSeq) == y.map(_.toSeq)
        case (x, y) => x == y
      }
    (0 until 300).foreach { i =>
      val ctx = (0 until rnd.nextInt(4))
        .map(j => s"c$j" -> randFeature()).toMap
      val lists = (0 until rnd.nextInt(4))
        .map(j => s"l$j" -> Seq.fill(rnd.nextInt(5))(randFeature())).toMap
      val (c2, l2) = TfRecord.decodeSequenceExample(
        TfRecord.encodeSequenceExample(ctx, lists))
      assert(c2.keySet === ctx.keySet, s"case $i ctx keys")
      ctx.foreach { case (k, v) => assert(eq(v, c2(k)), s"case $i ctx '$k'") }
      assert(l2.keySet === lists.keySet, s"case $i list keys")
      lists.foreach { case (k, vs) =>
        assert(vs.length === l2(k).length, s"case $i list '$k' length")
        vs.zip(l2(k)).foreach { case (a, b) =>
          assert(eq(a, b), s"case $i list '$k'") }
      }
    }
  }

  test("property: 500 random feature maps encode/decode exactly" +
      " (unicode names, negative/extreme longs, NaN/Inf floats)") {
    val rnd = new scala.util.Random(20260816L)
    def randName(): String = {
      // whole code points only: char-indexing a pool containing an
      // astral char (🌍 = surrogate PAIR) can emit a lone surrogate,
      // which is invalid UTF-16 and round-trips as '?' by design
      val pool = Seq("a", "b", "c", "X", "Y", "Z", "0", "1", "9", "_",
        "α", "β", "🌍", "-", "!", "/", ".")
      (0 until 1 + rnd.nextInt(12))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    def randFeature(): TfRecord.FeatureValue = rnd.nextInt(3) match {
      case 0 => TfRecord.BytesFeature(Seq.fill(rnd.nextInt(4))(
        Array.fill(rnd.nextInt(60))(rnd.nextInt(256).toByte)))
      case 1 => TfRecord.Int64Feature(Seq.fill(rnd.nextInt(6))(
        rnd.nextInt(5) match {
          case 0 => Long.MinValue
          case 1 => Long.MaxValue
          case 2 => -1L
          case _ => rnd.nextLong()
        }))
      case _ => TfRecord.FloatFeature(Seq.fill(rnd.nextInt(6))(
        rnd.nextInt(5) match {
          case 0 => Float.NaN
          case 1 => Float.PositiveInfinity
          case 2 => -0.0f
          case _ => rnd.nextFloat() * 1e6f - 5e5f
        }))
    }
    (0 until 500).foreach { i =>
      val feats = (0 until rnd.nextInt(5))
        .map(_ => randName() -> randFeature()).toMap
      val back = TfRecord.decodeExample(TfRecord.encodeExample(feats))
      assert(back.keySet === feats.keySet, s"case $i keys")
      feats.foreach { case (k, v) =>
        (v, back(k)) match {
          case (TfRecord.BytesFeature(a), TfRecord.BytesFeature(b)) =>
            assert(a.map(_.toSeq) === b.map(_.toSeq), s"case $i '$k'")
          case (TfRecord.Int64Feature(a), TfRecord.Int64Feature(b)) =>
            assert(a === b, s"case $i '$k'")
          case (TfRecord.FloatFeature(a), TfRecord.FloatFeature(b)) =>
            // bit-level compare: NaN != NaN under ===, -0.0 must survive
            assert(a.map(java.lang.Float.floatToRawIntBits) ===
              b.map(java.lang.Float.floatToRawIntBits), s"case $i '$k'")
          case (x, y) => fail(s"case $i '$k': kind changed $x -> $y")
        }
      }
    }
  }

  test("fuzz: 300 random bit flips never hang or mis-parse silently") {
    val d = dir()
    TfRecord.writeRecords(
      (0 until 20).map(i => Tuple1(s"record number $i with text".getBytes))
        .toDF("rec").coalesce(1), "rec", s"$d/lake")
    val shard = new java.io.File(s"$d/lake").listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head.toPath
    val good = Files.readAllBytes(shard)
    val rnd = new scala.util.Random(11)
    var loud = 0
    (0 until 300).foreach { _ =>
      val b = good.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        val p = rnd.nextInt(b.length)
        b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      try {
        val out = TfRecord.recordIterator(
          new java.io.ByteArrayInputStream(b), 1L << 20, true).toSeq
        // parsed without error: with CRC on, every surviving record's
        // checksum matched, so silent corruption cannot pass unnoticed
        assert(out.length <= 20)
      } catch {
        case _: IllegalArgumentException | _: java.io.EOFException =>
          loud += 1
      }
    }
    assert(loud > 0) // the fuzzer actually reached the parser
  }
}
