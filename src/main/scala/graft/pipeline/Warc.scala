package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) container ingestion — the Common Crawl on-ramp. A
  * crawl snapshot is a lake of `.warc.gz` files, each a concatenation of
  * per-record gzip members; this module turns a binary column of such
  * blobs into record rows, splits HTTP response payloads into status /
  * headers / body, and (composed with [[Html]]) yields the WET-style
  * extracted-text view entirely inside the engine.
  *
  * Parsing runs as a `mapPartitions` iterator transform (codec work is
  * not expressible as a Catalyst projection — same justification as
  * [[Multimodal]]): constant memory per task, record explosion local to
  * the blob, no shuffle. At 100 TB the right ingress is
  * [[recordsFromPaths]] — a path column streamed off the Hadoop
  * `FileSystem`, memory bounded by ONE record; the `binaryFile` blob
  * route ([[records]]) suits small/medium segments but caps at the 2 GB
  * JVM-array ceiling per file.
  *
  * Format notes (warc-specification 1.0/1.1):
  *  - a record = `WARC/1.x\r\n`, header lines `Name: value`, blank line,
  *    `Content-Length` payload bytes, `\r\n\r\n` separator;
  *  - Common Crawl gzips each record as its own member and concatenates
  *    the members; [[splitBlob]] detects the 1F 8B magic and inflates
  *    members individually (a plain uncompressed record stream also
  *    parses);
  *  - HTTP response payloads start with a status line and their own
  *    header block terminated by a blank line.
  */
object Warc {

  /** One parsed WARC record (headers in document order, case preserved;
    * lookup is case-insensitive).
    */
  case class Record(headers: Seq[(String, String)], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    def recordType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
    def date: String = header("WARC-Date").getOrElse("")
    def contentType: String = header("Content-Type").getOrElse("")
  }

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Per-member inflate cap (1 GiB): deflate's ~1000:1 max ratio lets a
    * megabyte-scale hostile member (a zip bomb — real crawls contain
    * them) inflate to executor-OOM scale; past the cap the member is
    * treated as corrupt (tail drops, job survives). Legit whole-stream
    * members larger than this belong on the streaming
    * [[recordsFromPaths]] route, which never materializes a member.
    */
  val MaxInflatedMemberBytes: Int = 1 << 30

  /** Header-line cap for the streaming reader: WARC/HTTP header lines
    * are short; a newline-free hostile stream must not buffer itself
    * into memory as one "line".
    */
  val MaxHeaderLineBytes: Int = 1 << 20

  /** Split a blob that is either a plain WARC record stream or a
    * concatenation of per-record gzip members into individual record
    * byte ranges (inflated when needed).
    */
  def splitBlob(blob: Array[Byte]): Seq[Array[Byte]] =
    splitBlob(blob, MaxInflatedMemberBytes)

  /** [[splitBlob]] with an explicit inflate cap (test hook for the bomb
    * guard — a real 1 GiB-crossing fixture would be a 1 GiB test).
    */
  private[pipeline] def splitBlob(
      blob: Array[Byte], maxInflated: Int): Seq[Array[Byte]] =
    if (blob.length >= 2 && blob(0) == GzipMagic0 && blob(1) == GzipMagic1) {
      // concatenated gzip members: inflate one member at a time so a
      // corrupt member truncates only the tail, never the whole blob
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var off = 0
      while (off + 10 <= blob.length && blob(off) == GzipMagic0 &&
        blob(off + 1) == GzipMagic1) {
        try {
          val (data, next) = inflateMember(blob, off, maxInflated)
          // a member usually holds exactly one record (Common Crawl), but
          // whole-stream-gzipped WARCs pack MANY records into a single
          // member — re-frame every member so neither layout loses data
          // (splitRaw of a single record returns it unchanged)
          out ++= splitRaw(data)
          off = next
        } catch {
          case _: Exception => return out.toSeq // corrupt tail drops
        }
      }
      out.toSeq
    } else splitRaw(blob)

  /** Inflate the gzip member starting at `off`: walks the member header
    * (fixed fields + optional FEXTRA/FNAME/FCOMMENT/FHCRC), inflates the
    * raw deflate stream with one pass, and returns (data, offset past the
    * 8-byte CRC/ISIZE trailer).
    */
  private def inflateMember(blob: Array[Byte], off: Int,
      maxInflated: Int): (Array[Byte], Int) = {
    var i = off
    require(blob(i) == GzipMagic0 && blob(i + 1) == GzipMagic1, "not gzip")
    val flg = blob(i + 3) & 0xff
    i += 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = (blob(i) & 0xff) | ((blob(i + 1) & 0xff) << 8)
      i += 2 + xlen
    }
    if ((flg & 8) != 0) { while (blob(i) != 0) i += 1; i += 1 } // FNAME
    if ((flg & 16) != 0) { while (blob(i) != 0) i += 1; i += 1 } // FCOMMENT
    if ((flg & 2) != 0) i += 2 // FHCRC
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(blob, i, blob.length - i)
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(tmp)
      if (n > 0) {
        if (buf.size() + n > maxInflated) {
          inf.end()
          throw new java.io.IOException(
            s"gzip member inflates past $maxInflated bytes (bomb?)")
        }
        buf.write(tmp, 0, n)
      }
      else if (inf.needsInput())
        throw new java.io.IOException("truncated gzip member")
    }
    val compressed = inf.getBytesRead.toInt
    inf.end()
    (buf.toByteArray, i + compressed + 8) // + CRC32 + ISIZE trailer
  }

  /** Split an UNCOMPRESSED record stream on `Content-Length` walking —
    * never on payload content (payloads may contain `WARC/` bytes).
    */
  private def splitRaw(blob: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    while (off < blob.length) {
      // skip inter-record CRLFs
      while (off < blob.length &&
        (blob(off) == '\r' || blob(off) == '\n')) off += 1
      if (off >= blob.length) return out.toSeq
      val headerEnd = indexOfBlankLine(blob, off)
      if (headerEnd < 0) return out.toSeq
      val head = new String(blob, off, headerEnd - off, StandardCharsets.UTF_8)
      // toLongOption + non-negative guard: a malformed length in one
      // record must drop that record, not NumberFormatException-abort
      // the task (and a NEGATIVE length must not move `end` before
      // `off` — copyOfRange IllegalArgumentException / infinite loop)
      val len = head.linesIterator.collectFirst {
        case l if l.toLowerCase(java.util.Locale.ROOT)
            .startsWith("content-length:") =>
          l.substring(l.indexOf(':') + 1).trim
      }.flatMap(_.toLongOption).filter(_ >= 0).getOrElse(0L)
      val end = math.min(headerEnd + 4 + len, blob.length.toLong).toInt
      out += java.util.Arrays.copyOfRange(blob, off, end)
      off = end
    }
    out.toSeq
  }

  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Parse one record's bytes (already inflated). Null for non-WARC
    * input (dropped upstream rather than failing the task).
    */
  def parseRecord(bytes: Array[Byte]): Record = {
    if (bytes.length < 8 ||
      !new String(bytes, 0, 5, StandardCharsets.UTF_8).equals("WARC/")) return null
    val headerEnd = indexOfBlankLine(bytes, 0)
    if (headerEnd < 0) return null
    val head = new String(bytes, 0, headerEnd, StandardCharsets.UTF_8)
    val lines = head.split("\r\n").toSeq.drop(1) // drop the version line
    val headers = lines.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None else Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
    }
    val len = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Length") => v
    }.flatMap(_.toLongOption).filter(_ >= 0)
      .getOrElse((bytes.length - headerEnd - 4).toLong)
    val start = headerEnd + 4
    val end = math.min(start + len, bytes.length.toLong).toInt
    Record(headers, java.util.Arrays.copyOfRange(bytes, start, end))
  }

  /** All records of a blob (either framing), parse failures dropped. */
  def parseAll(blob: Array[Byte]): Seq[Record] =
    splitBlob(blob).flatMap(b => Option(parseRecord(b)))

  /** Explode a binary column of WARC blobs into one row per record:
    * carries the input's non-binary columns plus
    * `(warc_type, target_uri, warc_date, content_type, payload)`.
    */
  def records(df: DataFrame, binCol: String): DataFrame = {
    val carried = df.schema.fields.filterNot(_.name == binCol)
    val outSchema = StructType(carried ++ Seq(
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("warc_date", StringType),
      StructField("content_type", StringType),
      StructField("payload", BinaryType),
    ))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val carryIdx = carried.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = Option(r.getAs[Array[Byte]](binIdx))
          .getOrElse(Array.emptyByteArray)
        val carry = carryIdx.map(r.get).toSeq
        parseAll(blob).map { rec =>
          Row.fromSeq(carry ++ Seq(rec.recordType, rec.targetUri, rec.date,
            rec.contentType, rec.payload))
        }
      }
    }(enc)
  }

  /** One parsed HTTP response: `charset` is the Content-Type charset
    * parameter (lowercased, "" when absent) and `text` decodes the body
    * with it — falling back to UTF-8 for missing/unknown charsets — so
    * legacy-encoded pages (ISO-8859-1, windows-1252, GBK) don't turn
    * into mojibake.
    */
  case class HttpMessage(status: Int, mime: String, charset: String,
      body: Array[Byte]) {
    def text: String = {
      val cs =
        try {
          if (charset.nonEmpty && java.nio.charset.Charset.isSupported(charset))
            java.nio.charset.Charset.forName(charset)
          else StandardCharsets.UTF_8
        } catch { case _: Exception => StandardCharsets.UTF_8 }
      new String(body, cs)
    }
  }

  /** Parse an HTTP message payload into status / mime / charset / body.
    * Null when the payload is not an HTTP response.
    */
  def parseHttpMessage(payload: Array[Byte]): HttpMessage = {
    if (payload.length < 12 ||
      !new String(payload, 0, 5, StandardCharsets.UTF_8).equals("HTTP/")) return null
    val headerEnd = indexOfBlankLine(payload, 0)
    if (headerEnd < 0) return null
    val head = new String(payload, 0, headerEnd, StandardCharsets.UTF_8)
    val lines = head.split("\r\n").toSeq
    // Both checks are needed: toIntOption alone accepts a signed form
    // ("+200") the status grammar forbids, and digits-then-toInt alone
    // let an all-digit status longer than Int ("99999999999") blow the
    // task with NumberFormatException. The digit test is ASCII-only
    // ('0'..'9'): Char.isDigit also accepts Unicode digits (Arabic-Indic
    // "٢٠٠", Devanagari "२००") that Integer.parseInt would then parse,
    // which the RFC 9112 status grammar (3 DIGIT) forbids
    val status = lines.head.split(" ") match {
      case parts if parts.length >= 2 && parts(1).nonEmpty &&
          parts(1).forall(c => c >= '0' && c <= '9') &&
          parts(1).toIntOption.isDefined =>
        parts(1).toInt
      case _ => return null
    }
    val contentType = lines.tail.collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT)
          .startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    val ctParts = contentType.split(";").toSeq
    val mime = ctParts.head.trim
    val charset = ctParts.tail.map(_.trim).collectFirst {
      case p if p.toLowerCase(java.util.Locale.ROOT)
          .startsWith("charset=") =>
        p.substring(8).trim.stripPrefix("\"").stripSuffix("\"")
          .toLowerCase(java.util.Locale.ROOT)
    }.getOrElse("")
    HttpMessage(status, mime, charset,
      java.util.Arrays.copyOfRange(payload, headerEnd + 4, payload.length))
  }

  /** [[parseHttpMessage]] as a (status, mimeType, bodyBytes) tuple. */
  def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val m = parseHttpMessage(payload)
    if (m == null) null else (m.status, m.mime, m.body)
  }

  /** Response-record view: one row per `response` record with the HTTP
    * payload split — `(…, target_uri, warc_date, http_status, mime,
    * body)` where `body` is the UTF-8 decoded entity. The WET-style
    * text lake is `responses(df, c).select(Html.extractText($"body"))`.
    */
  def responses(df: DataFrame, binCol: String): DataFrame =
    responsesFromRecords(records(df, binCol))

  /** The record-rows → HTTP half of [[responses]], callable on ANY record
    * frame — [[records]] (blob route) or [[recordsFromPaths]] (the
    * streaming 100-TB on-ramp) — so the scale ingress composes all the
    * way to the text lake instead of dead-ending before the HTTP split.
    * Input must carry `(warc_type, content_type, payload)`; every other
    * column (e.g. `recordsFromPaths`' `path`) carries through.
    */
  def responsesFromRecords(recs0: DataFrame): DataFrame = {
    val recs = recs0.filter(col("warc_type") === "response")
    val carried = recs.schema.fields
      .filterNot(f => f.name == "payload" || f.name == "warc_type" ||
        f.name == "content_type")
    val outSchema = StructType(carried ++ Seq(
      StructField("http_status", IntegerType),
      StructField("mime", StringType),
      StructField("body", StringType),
    ))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val payloadIdx = recs.schema.fieldIndex("payload")
    val carryIdx = carried.map(f => recs.schema.fieldIndex(f.name))
    recs.mapPartitions { rows =>
      rows.flatMap { r =>
        val http = parseHttpMessage(r.getAs[Array[Byte]](payloadIdx))
        if (http == null) None
        else Some(Row.fromSeq(carryIdx.map(r.get).toSeq ++
          Seq(http.status, http.mime, http.text)))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // streaming path-based ingress (the 100-TB on-ramp)
  // ------------------------------------------------------------------

  /** Frame records off an InputStream without ever materializing the
    * file: header lines are read byte-by-byte (buffered), the payload is
    * read as exactly `Content-Length` bytes, memory is bounded by ONE
    * record. Gzip input (per-record members or whole-stream — both
    * real-world layouts) is detected by magic and inflated streaming;
    * `GZIPInputStream` natively walks concatenated members. Malformed
    * input ends the iterator (parsed prefix is kept, tail drops) —
    * mirroring [[splitBlob]]'s corrupt-tail contract.
    */
  def recordIterator(in0: java.io.InputStream): Iterator[Record] = {
    val pb = new java.io.PushbackInputStream(in0, 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val in: java.io.InputStream =
      if (b0 == (GzipMagic0 & 0xff) && b1 == (GzipMagic1 & 0xff))
        new java.util.zip.GZIPInputStream(pb, 1 << 16)
      else pb
    val buf = new java.io.BufferedInputStream(in, 1 << 16)

    def readLine(): String = {
      val sb = new ByteArrayOutputStream(128)
      var c = buf.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        // header lines are short; a newline-free hostile stream must not
        // buffer itself into driver/executor memory as one "line" —
        // treat as malformed (ends the iterator, parsed prefix kept)
        if (sb.size() >= MaxHeaderLineBytes) return null
        sb.write(c); c = buf.read()
      }
      val bytes = sb.toByteArray
      val n =
        if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
        else bytes.length
      new String(bytes, 0, n, StandardCharsets.UTF_8)
    }

    new Iterator[Record] {
      private var nextRec: Record = advance()

      private def advance(): Record =
        try {
          var line = readLine() // skip inter-record separators / garbage
          while (line != null && !line.startsWith("WARC/")) line = readLine()
          if (line == null) return null
          val headers = scala.collection.mutable.ArrayBuffer
            .empty[(String, String)]
          var h = readLine()
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0)
              headers += h.substring(0, i).trim -> h.substring(i + 1).trim
            h = readLine()
          }
          if (h == null) return null // EOF inside header block
          val len = headers.collectFirst {
            case (k, v) if k.equalsIgnoreCase("Content-Length") => v
          }.flatMap(_.toLongOption).filter(_ >= 0).getOrElse(0L)
          if (len > Int.MaxValue - 16) return null // >2 GB single payload
          // chunked read, NOT a len-sized pre-allocation: a lying
          // Content-Length (2 GB on a 1 KB stream) must cost memory
          // proportional to the BYTES ACTUALLY PRESENT, and a short read
          // must drop the record, not keep a mostly-zero giant array
          val acc = new ByteArrayOutputStream(math.min(len, 1L << 16).toInt)
          val tmp = new Array[Byte](1 << 16)
          var remaining = len
          var truncated = false
          while (remaining > 0 && !truncated) {
            val k = buf.read(tmp, 0, math.min(remaining, tmp.length.toLong).toInt)
            if (k < 0) truncated = true
            else { acc.write(tmp, 0, k); remaining -= k }
          }
          if (truncated) return null // truncated payload drops
          Record(headers.toSeq, acc.toByteArray)
        } catch { case _: Exception => null }

      def hasNext: Boolean = nextRec != null
      def next(): Record = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  /** Record rows from a column of FILE PATHS — the scale-path ingress:
    * each task opens its file off the Hadoop `FileSystem` and streams
    * records through [[recordIterator]], so a 1 GB+ Common Crawl segment
    * never materializes as a single binary cell (the 2 GB JVM-array
    * ceiling of the `binaryFile` route) and task memory stays bounded by
    * one record. Output matches [[records]]: carried columns plus
    * `(warc_type, target_uri, warc_date, content_type, payload)`.
    */
  def recordsFromPaths(df: DataFrame, pathCol: String = "path"): DataFrame = {
    val carried = df.schema.fields.filterNot(_.name == pathCol)
    val outSchema = StructType(Array(StructField(pathCol, StringType)) ++
      carried ++ Seq(
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("warc_date", StringType),
      StructField("content_type", StringType),
      StructField("payload", BinaryType),
    ))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val pathIdx = df.schema.fieldIndex(pathCol)
    val carryIdx = carried.map(f => df.schema.fieldIndex(f.name))
    // ship the SESSION'S Hadoop conf (spark.hadoop.* — S3 credentials,
    // endpoints) — a bare executor-side `new Configuration()` reads only
    // classpath XML and silently drops them (round-11 review find)
    val confBox = df.sparkSession.sparkContext.broadcast(
      org.apache.spark.GraftSparkBridge.hadoopConfBox(df.sparkSession.sparkContext))
    df.mapPartitions { rows =>
      // one conf handle per TASK, not per file (FileSystem instances are
      // cached per scheme+conf by Hadoop)
      val conf = confBox.value.value
      rows.flatMap { r =>
        val p = r.getString(pathIdx)
        val carry = carryIdx.map(r.get).toSeq
        val hPath = new org.apache.hadoop.fs.Path(p)
        val stream =
          try hPath.getFileSystem(conf).open(hPath)
          catch { case _: Exception => null }
        if (stream == null) Iterator.empty
        else {
          // close on task end too (early termination — e.g. a limit —
          // abandons the iterator before exhaustion)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
            try stream.close() catch { case _: Exception => () }
          }
          // a corrupt/truncated gzip HEADER throws from the
          // GZIPInputStream constructor inside recordIterator — one bad
          // file must degrade to zero records, not abort the job
          val it =
            try recordIterator(stream)
            catch {
              case _: Exception =>
                try stream.close() catch { case _: Exception => () }
                Iterator.empty[Record]
            }
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = it.hasNext
              if (!h) { try stream.close() catch { case _: Exception => () } }
              h
            }
            def next(): Row = {
              val rec = it.next()
              Row.fromSeq((p +: carry) ++ Seq(rec.recordType, rec.targetUri,
                rec.date, rec.contentType, rec.payload))
            }
          }
        }
      }
    }(enc)
  }

  /** One row per file matching `pattern` (Hadoop glob) — the driver-side
    * listing that feeds [[recordsFromPaths]]; `repartition` the result to
    * spread segments across the cluster.
    */
  def filesAt(
      spark: org.apache.spark.sql.SparkSession,
      pattern: String,
  ): DataFrame = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(pattern)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
    statuses.filter(_.isFile).map(_.getPath.toString).toSeq.toDF("path")
  }

  // ------------------------------------------------------------------
  // writer (fixtures / tests / WARC sink)
  // ------------------------------------------------------------------

  /** Serialize one record (correct Content-Length framing). */
  def encodeRecord(
      headers: Seq[(String, String)],
      payload: Array[Byte],
  ): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
    head.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** HTTP response payload with standard headers. */
  def encodeHttpResponse(
      status: Int,
      mime: String,
      body: Array[Byte],
  ): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: $mime\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(StandardCharsets.UTF_8))
    out.write(body)
    out.toByteArray
  }

  /** Concatenate records into a blob; `gzipPerRecord` wraps each record
    * in its own gzip member (the Common Crawl layout).
    */
  def encodeBlob(
      records: Seq[Array[Byte]],
      gzipPerRecord: Boolean,
  ): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(r)
        // close(), not finish(): close releases the native Deflater
        // (finish leaves it for the GC — at corpus scale that is a
        // native-memory leak that degrades every task on the executor);
        // closing the underlying ByteArrayOutputStream is a no-op
        gz.close()
      } else out.write(r)
    }
    out.toByteArray
  }

  /** Response record for `uri` with an HTML body — the fixture shape
    * (warcinfo + responses) used by specs and the driver gate.
    */
  def responseRecord(uri: String, date: String, html: String): Array[Byte] =
    encodeRecord(
      Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> date,
        "Content-Type" -> "application/http; msgtype=response"),
      encodeHttpResponse(200, "text/html",
        html.getBytes(StandardCharsets.UTF_8)))

  def warcinfoRecord(filename: String): Array[Byte] =
    encodeRecord(
      Seq("WARC-Type" -> "warcinfo", "WARC-Filename" -> filename,
        "Content-Type" -> "application/warc-fields"),
      s"software: graft\r\n".getBytes(StandardCharsets.UTF_8))
}
