package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC container ingestion: framing (raw + per-record gzip members),
  * record/HTTP parsing, hostile input, and the full crawl→text chain
  * (WARC → response → HTML body → extracted text → quality/dedup).
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def page(i: Int): String =
    s"<html><head><title>Page $i</title></head><body><h1>H$i</h1>" +
      s"<p>body text number $i</p></body></html>"

  private def blob(ids: Seq[Int], gz: Boolean): Array[Byte] =
    Warc.encodeBlob(
      Warc.warcinfoRecord("test.warc") +: ids.map(i =>
        Warc.responseRecord(s"https://ex.com/p/$i",
          "2026-01-01T00:00:00Z", page(i))),
      gzipPerRecord = gz)

  test("round-trip: raw framing") {
    val recs = Warc.parseAll(blob(Seq(1, 2, 3), gz = false))
    assert(recs.map(_.recordType) === Seq("warcinfo", "response", "response",
      "response"))
    assert(recs(1).targetUri === "https://ex.com/p/1")
    val (status, mime, body) = Warc.parseHttp(recs(1).payload)
    assert(status === 200 && mime === "text/html")
    assert(new String(body, StandardCharsets.UTF_8) === page(1))
  }

  test("round-trip: per-record gzip members (Common Crawl layout)") {
    val recs = Warc.parseAll(blob(Seq(7, 8), gz = true))
    assert(recs.map(_.recordType) === Seq("warcinfo", "response", "response"))
    assert(recs(2).targetUri === "https://ex.com/p/8")
    assert(new String(Warc.parseHttp(recs(2).payload)._3,
      StandardCharsets.UTF_8) === page(8))
  }

  test("payload containing WARC/ and CRLF bytes does not split a record") {
    val tricky = "fake\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    val rec = Warc.encodeRecord(
      Seq("WARC-Type" -> "resource", "WARC-Target-URI" -> "u"),
      tricky.getBytes(StandardCharsets.UTF_8))
    val recs = Warc.parseAll(Warc.encodeBlob(Seq(rec,
      Warc.warcinfoRecord("f")), gzipPerRecord = false))
    assert(recs.length === 2) // Content-Length framing, not content scan
    assert(new String(recs.head.payload, StandardCharsets.UTF_8) === tricky)
    assert(recs(1).recordType === "warcinfo")
  }

  test("whole-stream gzip: ONE member holding many records keeps them all") {
    // real-world layout alongside per-record members: the entire record
    // stream gzipped as a single member
    val raw = blob(Seq(1, 2, 3), gz = false)
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(raw); g.close()
    val recs = Warc.parseAll(out.toByteArray)
    assert(recs.map(_.recordType) ===
      Seq("warcinfo", "response", "response", "response"))
    assert(recs(3).targetUri === "https://ex.com/p/3")
  }

  test("malformed Content-Length drops the record, not the task") {
    val good = Warc.responseRecord("https://ex.com/ok", "d", page(1))
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 12abc\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    // raw stream: bad record frames as length 0 and parses with empty
    // payload instead of NumberFormatException-aborting the split
    val recs = Warc.parseAll(Warc.encodeBlob(Seq(bad, good),
      gzipPerRecord = false))
    assert(recs.exists(_.targetUri === "https://ex.com/ok"))
    assert(recs.forall(r => r.payload != null))
    // NEGATIVE length must not move the frame end before its start
    // (copyOfRange IAE / infinite loop) — frames as length 0 instead
    val neg = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: -40\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val recs2 = Warc.parseAll(Warc.encodeBlob(Seq(neg, good),
      gzipPerRecord = false))
    assert(recs2.exists(_.targetUri === "https://ex.com/ok"))
    assert(Warc.parseRecord(neg).payload.length === 0)
  }

  test("responses() honors the Content-Type charset parameter") {
    val bodyText = "café niño" // é/ñ: differ between 8859-1 and UTF-8
    val payload = Warc.encodeHttpResponse(200,
      "text/html; charset=iso-8859-1",
      s"<html><body><p>$bodyText</p></body></html>"
        .getBytes(StandardCharsets.ISO_8859_1))
    val rec = Warc.encodeRecord(
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://l.com/a",
        "Content-Type" -> "application/http; msgtype=response"), payload)
    val df = Seq((1L, Warc.encodeBlob(Seq(rec), gzipPerRecord = true)))
      .toDF("file_id", "warc")
    val row = Warc.responses(df, "warc")
      .select("mime", "body").collect().head
    assert(row.getString(0) === "text/html") // charset split off the mime
    assert(row.getString(1).contains(bodyText)) // decoded, not mojibake
    // and an unknown charset falls back to UTF-8 without failing
    val m = Warc.parseHttpMessage(Warc.encodeHttpResponse(200,
      "text/plain; charset=x-no-such-cs", "plain".getBytes("UTF-8")))
    assert(m.charset === "x-no-such-cs" && m.text === "plain")
  }

  test("corrupt gzip tail drops alone; leading members survive") {
    val good = blob(Seq(1), gz = true)
    val corrupt = good ++ Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0,
      1, 2, 3)
    val recs = Warc.parseAll(corrupt)
    assert(recs.map(_.recordType) === Seq("warcinfo", "response"))
  }

  test("hostile input: junk, truncation, empty") {
    assert(Warc.parseAll(Array.emptyByteArray) === Seq())
    assert(Warc.parseAll("not a warc at all".getBytes) === Seq())
    val truncated = blob(Seq(1), gz = false).take(40)
    assert(Warc.parseAll(truncated) === Seq()) // no blank line yet
    // truncated payload: record parses, payload clipped at the blob end
    val half = blob(Seq(1), gz = false).dropRight(60)
    val recs = Warc.parseAll(half)
    assert(recs.nonEmpty)
  }

  test("gzip bomb: a member inflating past the cap drops as corrupt tail," +
      " leading members survive") {
    val good = blob(Seq(1), gz = true) // two small members (warcinfo + resp)
    // a member of 64 KB zeros — crosses a 1 KB test cap by 64x
    val bombPayload = Warc.encodeRecord(Seq("WARC-Type" -> "resource"),
      new Array[Byte](64 * 1024))
    val bomb = Warc.encodeBlob(Seq(bombPayload), gzipPerRecord = true)
    val recs = Warc.splitBlob(good ++ bomb, maxInflated = 1024)
      .flatMap(b => Option(Warc.parseRecord(b)))
    assert(recs.map(_.recordType) === Seq("warcinfo", "response"))
    // with the real cap the same blob parses all three
    assert(Warc.parseAll(good ++ bomb).size === 3)
  }

  test("streaming reader: lying Content-Length, newline-free stream, and" +
      " huge status are bounded and loud-dropped") {
    // record claiming 1e9 bytes over a short stream: drops, prior kept
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 1000000000\r\n\r\nshort").getBytes
    val okThenLying = blob(Seq(1), gz = false) ++ lying
    val got = Warc.recordIterator(
      new java.io.ByteArrayInputStream(okThenLying)).toSeq
    assert(got.map(_.recordType) === Seq("warcinfo", "response"))
    // newline-free 3 MB stream: terminates with zero records
    val noNewline = Array.fill(3 << 20)('A'.toByte)
    assert(Warc.recordIterator(
      new java.io.ByteArrayInputStream(noNewline)).toSeq === Seq())
    // all-digit status wider than Int must yield null, not blow the task
    val bad = ("HTTP/1.1 99999999999 OK\r\nContent-Type: text/plain" +
      "\r\n\r\nx").getBytes
    assert(Warc.parseHttpMessage(bad) === null)
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 -20 NO\r\n\r\nx".getBytes) === null)
    // signed forms parse under toIntOption but the status grammar is
    // digits only
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 +200 OK\r\n\r\nx".getBytes) === null)
    // ...and ASCII digits only: Char.isDigit (and Integer.parseInt)
    // accept Unicode digits — Arabic-Indic "٢٠٠" and Devanagari "२००"
    // would otherwise parse as 200 despite RFC 9112's 3-DIGIT grammar
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 ٢٠٠ OK\r\n\r\nx".getBytes("UTF-8")) === null)
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 २०० OK\r\n\r\nx".getBytes("UTF-8")) === null)
  }

  test("records(): one row per record, carried columns preserved") {
    val df = Seq((10L, blob(Seq(1, 2), gz = true)),
      (11L, blob(Seq(3), gz = false))).toDF("file_id", "warc")
    val out = Warc.records(df, "warc")
      .select("file_id", "warc_type", "target_uri")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(r => (r._1, r._3))
    assert(out.count(_._2 == "warcinfo") === 2)
    assert(out.filter(_._2 == "response").map(_._3).toSeq ===
      Seq("https://ex.com/p/1", "https://ex.com/p/2", "https://ex.com/p/3"))
  }

  test("responses(): HTTP split + WET-style extracted text") {
    val df = Seq((1L, blob(Seq(4, 5), gz = true))).toDF("file_id", "warc")
    val wet = Warc.responses(df, "warc")
      .select(col("target_uri"), col("http_status"), col("mime"),
        Html.extractText(col("body")).as("text"),
        Html.title(col("body")).as("title"))
      .collect().sortBy(_.getString(0))
    assert(wet.length === 2)
    assert(wet(0).getInt(1) === 200 && wet(0).getString(2) === "text/html")
    assert(wet(0).getString(3) === "H4\nbody text number 4")
    assert(wet(0).getString(4) === "Page 4")
  }

  test("binaryFile on-ramp: WARC files on disk → records → text") {
    val dir = java.nio.file.Files.createTempDirectory("warc-lake").toFile
    java.nio.file.Files.write(new java.io.File(dir, "seg-0.warc.gz").toPath,
      blob(Seq(1, 2), gz = true))
    java.nio.file.Files.write(new java.io.File(dir, "seg-1.warc").toPath,
      blob(Seq(3), gz = false))
    val files = spark.read.format("binaryFile")
      .load(dir.getAbsolutePath + "/*")
      .select(col("path"), col("content"))
    val texts = Warc.responses(files, "content")
      .select(col("target_uri"), Html.extractText(col("body")).as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts.keySet === Set("https://ex.com/p/1", "https://ex.com/p/2",
      "https://ex.com/p/3"))
    assert(texts("https://ex.com/p/3") === "H3\nbody text number 3")
  }

  test("recordsFromPaths: streaming ingress matches the blob path") {
    val dir = java.nio.file.Files.createTempDirectory("warc-stream").toFile
    java.nio.file.Files.write(new java.io.File(dir, "seg-0.warc.gz").toPath,
      blob(Seq(1, 2), gz = true))
    java.nio.file.Files.write(new java.io.File(dir, "seg-1.warc").toPath,
      blob(Seq(3), gz = false))
    val paths = Warc.filesAt(spark, dir.getAbsolutePath + "/*")
    assert(paths.count() === 2)
    val streamed = Warc.recordsFromPaths(paths)
      .select("warc_type", "target_uri", "payload")
      .collect().map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), StandardCharsets.UTF_8)))
      .sortBy(r => (r._1, r._2)).toSeq
    val viaBlob = spark.read.format("binaryFile")
      .load(dir.getAbsolutePath + "/*")
    val blobRows = Warc.records(viaBlob.select("content"), "content")
      .select("warc_type", "target_uri", "payload")
      .collect().map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), StandardCharsets.UTF_8)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(streamed === blobRows)
    assert(streamed.count(_._1 == "response") === 3)
  }

  test("recordsFromPaths: a corrupt gzip header degrades to zero records," +
      " not a failed task") {
    val dir = java.nio.file.Files.createTempDirectory("warc-corrupt").toFile
    // gzip magic followed by garbage: GZIPInputStream's constructor throws
    java.nio.file.Files.write(new java.io.File(dir, "bad.warc.gz").toPath,
      Array[Byte](0x1f, 0x8b.toByte, 99, 1, 2, 3, 4, 5))
    java.nio.file.Files.write(new java.io.File(dir, "good.warc.gz").toPath,
      blob(Seq(1), gz = true))
    val out = Warc.recordsFromPaths(
      Warc.filesAt(spark, dir.getAbsolutePath + "/*"))
      .select("warc_type").collect().map(_.getString(0)).sorted.toSeq
    assert(out === Seq("response", "warcinfo")) // bad file silently empty
  }

  test("recordsFromPaths: a multi-hundred-MB segment streams with bounded memory") {
    // ~2500 records × ~90 KB body ≈ 220 MB raw on disk — far above any
    // sane per-record buffer; the reader must stream, never materialize
    val f = java.nio.file.Files.createTempFile("big", ".warc").toFile
    f.deleteOnExit()
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 20)
    val filler = "lorem ipsum dolor sit amet " * 3300 // ~89 KB
    val n = 2500
    (0 until n).foreach { i =>
      out.write(Warc.responseRecord(s"https://big.com/p/$i", "d",
        s"<html><body><p>$i $filler</p></body></html>"))
    }
    out.close()
    assert(f.length() > 200L * 1024 * 1024, s"fixture only ${f.length()} B")
    val recs = Warc.recordsFromPaths(
      Seq(f.getAbsolutePath).toDF("path"))
    assert(recs.count() === n)
    val uris = recs.select("target_uri")
      .filter(col("target_uri").endsWith("/p/2499")).count()
    assert(uris === 1)
    f.delete()
  }

  test("ingestCrawl: WARC → robots gate → curate()-ready corpus") {
    def respPage(uri: String, body: String) =
      Warc.responseRecord(uri, "2026-01-01T00:00:00Z", body)
    val blocked = respPage("https://a.com/private/x", page(1))
    val okA = respPage("https://a.com/pub/1", page(2))
    val okB = respPage("https://b.com/z", page(3))
    val notFound = Warc.encodeRecord(
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://a.com/gone",
        "Content-Type" -> "application/http; msgtype=response"),
      Warc.encodeHttpResponse(404, "text/html", "gone".getBytes("UTF-8")))
    val image = Warc.encodeRecord(
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://a.com/i.png",
        "Content-Type" -> "application/http; msgtype=response"),
      Warc.encodeHttpResponse(200, "image/png", Array[Byte](1, 2, 3)))
    val df = Seq((1L, Warc.encodeBlob(
      Seq(Warc.warcinfoRecord("f"), blocked, okA, okB, notFound, image),
      gzipPerRecord = true))).toDF("file_id", "warc")
    val robots = Robots.rules(
      Seq(("a.com", "User-agent: *\nDisallow: /private"))
        .toDF("domain", "robots"), "robots")
    val out = Curation.ingestCrawl(df, "warc", robotsRules = Some(robots))
      .select("url", "domain", "path", "title", "text", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getString(4))))
      .toMap
    // 404 and non-HTML gated; /private robots-blocked; b.com untouched
    assert(out.keySet === Set("https://a.com/pub/1", "https://b.com/z"))
    assert(out("https://a.com/pub/1") ===
      (("a.com", "/pub/1", "Page 2", "H2\nbody text number 2")))
    assert(out("https://b.com/z")._1 === "b.com")
    // and the result drops straight into curate()
    val (curated, _) = Curation.curate(
      Curation.ingestCrawl(df, "warc").withColumn("doc_id",
        org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("url"))),
      "doc_id", "text", "lang", "domain",
      Curation.CurationConfig(gopher = false, dropExact = true))
    assert(curated.count() === 3) // no robots gate here: 3 distinct 200/html pages
  }

  test("crawl chain end-to-end: WARC → text → quality filter → exact dedup") {
    // two files share page 1 (a cross-file duplicate); page 9 is junk
    val junk = "<html><body><p>zz</p></body></html>"
    val mk = (recs: Seq[Array[Byte]]) => Warc.encodeBlob(recs, gzipPerRecord = true)
    val df = Seq(
      (1L, mk(Seq(Warc.responseRecord("https://a/1", "d", page(1)),
        Warc.responseRecord("https://a/2", "d", page(2))))),
      (2L, mk(Seq(Warc.responseRecord("https://b/1", "d", page(1)),
        Warc.responseRecord("https://b/9", "d", junk)))),
    ).toDF("file_id", "warc")
    val text = Warc.responses(df, "warc")
      .select(col("target_uri"),
        Html.extractText(col("body")).as("text"))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .filter(col("n_tokens") >= 4) // junk page drops (2 tokens)
    val kept = Dedup.dropExactDuplicates(text, "text", "target_uri")
      .select("target_uri").as[String].collect().toSet
    // page(1) text is identical across files → one survivor
    assert(kept.size === 2)
    assert(kept.contains("https://a/2"))
    assert(kept.intersect(Set("https://a/1", "https://b/1")).size === 1)
  }

  test("ingestCrawlFromPaths: path route == blob route, rows, schema and all") {
    val dir = java.nio.file.Files.createTempDirectory("warc-ingest").toFile
    java.nio.file.Files.write(new java.io.File(dir, "seg-0.warc.gz").toPath,
      blob(Seq(1, 2), gz = true))
    java.nio.file.Files.write(new java.io.File(dir, "seg-1.warc").toPath,
      blob(Seq(3), gz = false))
    val robots = Robots.rules(
      Seq(("ex.com", "User-agent: *\nDisallow: /p/2"))
        .toDF("domain", "robots"), "robots")
    val fromPaths = Curation.ingestCrawlFromPaths(
      Warc.filesAt(spark, dir.getAbsolutePath + "/*"),
      robotsRules = Some(robots))
    val fromBlobs = Curation.ingestCrawl(
      spark.read.format("binaryFile").load(dir.getAbsolutePath + "/*")
        .select("content"), "content", robotsRules = Some(robots))
    assert(fromPaths.schema === fromBlobs.schema) // incl. no leaked file path
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("url").collect().map(_.toSeq).toSeq
    assert(key(fromPaths) === key(fromBlobs))
    assert(fromPaths.count() === 2) // /p/2 robots-blocked, warcinfo gated
  }

  test("ingestCrawlFromPaths: the 220 MB streamed segment reaches the text" +
      " lake and matches the blob route") {
    // the scale on-ramp end-to-end: a multi-hundred-MB segment must flow
    // paths → records → HTTP split → HTML extraction without ever
    // materializing the file (memory stays bounded by one record), and
    // produce byte-identical text to the 2 GB-capped blob route
    val f = java.nio.file.Files.createTempFile("big-ingest", ".warc").toFile
    f.deleteOnExit()
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 20)
    val filler = "lorem ipsum dolor sit amet " * 3300 // ~89 KB
    val n = 2500
    (0 until n).foreach { i =>
      out.write(Warc.responseRecord(s"https://big.com/p/$i", "d",
        s"<html><head><title>T$i</title></head><body><p>$i $filler</p></body></html>"))
    }
    out.close()
    assert(f.length() > 200L * 1024 * 1024, s"fixture only ${f.length()} B")
    // order-insensitive content digest: no 200 MB collect to the driver
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.withColumn("h", xxhash64(col("url"), col("domain"),
          col("path"), col("title"), col("text"), col("lang")))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val viaPaths = digest(Curation.ingestCrawlFromPaths(
      Seq(f.getAbsolutePath).toDF("path")))
    val viaBlobs = digest(Curation.ingestCrawl(
      spark.read.format("binaryFile").load(f.getAbsolutePath)
        .select("content"), "content"))
    assert(viaPaths._1 === n)
    assert(viaPaths === viaBlobs)
    f.delete()
  }
}
