package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dependency-free TFRecord source/sink — the interchange format of
  * TF/JAX training pipelines, so a corpus curated here can feed a data
  * loader (and an existing TFRecord lake can be audited here) without a
  * TensorFlow dependency. Two layers, both implemented to the PUBLIC
  * specs:
  *
  *  - '''record framing''' (`tensorflow/core/lib/io/record_writer`):
  *    `uint64 length (LE) | masked crc32c(length) | data |
  *    masked crc32c(data)`, `mask(c) = ((c >>> 15) | (c << 17)) +
  *    0xa282ead8` over uint32, CRC32C = Castagnoli
  *    (`java.util.zip.CRC32C`);
  *  - '''`tf.train.Example` / `tf.train.SequenceExample`''' protobuf
  *    subsets (`Example → Features → map<string, Feature>`,
  *    `Feature = BytesList | FloatList | Int64List`; SequenceExample
  *    adds `context` + `feature_lists`): hand-rolled protobuf wire
  *    encode/decode (varints, length-delimited fields, packed AND
  *    unpacked repeated scalars; unknown fields skipped by wire type).
  *
  * Scale shape: writes stream one `.tfrecord` shard per input partition
  * from the executors (Hadoop FS — local/hdfs/s3a — temp name + rename
  * per shard); reads list the shard files (driver state is the file
  * LIST only) and stream-decode with memory bounded by ONE record.
  * Hostile-input posture matches WARC: a lying length field is capped
  * by `maxRecordBytes` with a named error before any allocation, CRC
  * mismatches name the offset, truncated tails fail loudly.
  */
object TfRecord {

  /** Framing mask from the TFRecord spec. */
  private def maskCrc(crc: Long): Int =
    ((((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL).toInt

  private def crc32c(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    c.getValue
  }

  /** Frame one record into `out`. */
  private def writeFramed(out: java.io.DataOutputStream,
      data: Array[Byte]): Unit = {
    val lenBuf = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(data.length.toLong)
      .array()
    out.write(lenBuf)
    writeIntLE(out, maskCrc(crc32c(lenBuf, 0, 8)))
    out.write(data)
    writeIntLE(out, maskCrc(crc32c(data, 0, data.length)))
  }

  private def writeIntLE(out: java.io.DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Streaming record iterator over one framed stream. `verifyCrc`
    * checks both checksums (default — corruption fails loudly with the
    * record offset); `maxRecordBytes` bounds the allocation a lying
    * length field can cause (the WARC zip-bomb posture).
    */
  private[pipeline] def recordIterator(
      in: java.io.InputStream,
      maxRecordBytes: Long,
      verifyCrc: Boolean,
  ): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private val din = new java.io.DataInputStream(
      new java.io.BufferedInputStream(in, 1 << 16))
    private var nextRec: Array[Byte] = null
    private var done = false
    private var offset = 0L

    private def readIntLE(): Int = {
      val a = din.read(); val b = din.read(); val c = din.read(); val d = din.read()
      if ((a | b | c | d) < 0) throw new java.io.EOFException(
        s"tfrecord: truncated checksum at offset $offset")
      a | (b << 8) | (c << 16) | (d << 24)
    }

    private def advance(): Unit = {
      if (done || nextRec != null) return
      val lenBuf = new Array[Byte](8)
      val first = din.read()
      if (first < 0) { done = true; return } // clean EOF at a boundary
      lenBuf(0) = first.toByte
      var got = 1
      while (got < 8) {
        val k = din.read(lenBuf, got, 8 - got)
        if (k < 0) throw new java.io.EOFException(
          s"tfrecord: truncated length header at offset $offset")
        got += k
      }
      val len = java.nio.ByteBuffer.wrap(lenBuf)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      val lenCrc = readIntLE()
      if (verifyCrc) {
        val want = maskCrc(crc32c(lenBuf, 0, 8))
        if (lenCrc != want) throw new IllegalArgumentException(
          f"tfrecord: length checksum mismatch at offset $offset " +
            f"(stored 0x$lenCrc%08x, computed 0x$want%08x)")
      }
      // allocation bound BEFORE the array exists: a lying 8-byte length
      // must not become a heap-sized allocation. The effective cap also
      // clamps to what a JVM byte array can hold, so a caller-supplied
      // maxRecordBytes past 2^31 cannot overflow the Int conversion
      val cap = math.min(maxRecordBytes, (Int.MaxValue - 16).toLong)
      if (len < 0 || len > cap) throw new IllegalArgumentException(
        s"tfrecord: record of $len bytes at offset $offset exceeds " +
          s"maxRecordBytes=$cap (corrupt or hostile length)")
      val data = new Array[Byte](len.toInt)
      var dGot = 0
      while (dGot < len) {
        val k = din.read(data, dGot, len.toInt - dGot)
        if (k < 0) throw new java.io.EOFException(
          s"tfrecord: truncated record data at offset $offset")
        dGot += k
      }
      val dataCrc = readIntLE()
      if (verifyCrc) {
        val want = maskCrc(crc32c(data, 0, data.length))
        if (dataCrc != want) throw new IllegalArgumentException(
          f"tfrecord: data checksum mismatch at offset $offset " +
            f"(stored 0x$dataCrc%08x, computed 0x$want%08x)")
      }
      offset += 8 + 4 + len + 4
      nextRec = data
    }

    override def hasNext: Boolean = { advance(); nextRec != null }
    override def next(): Array[Byte] = {
      advance()
      if (nextRec == null) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  // ------------------------------------------------------------------
  // protobuf wire subset (tf.train.Example)
  // ------------------------------------------------------------------

  private def varintLen(v: Long): Int = {
    var n = 1
    var x = v
    while ((x & ~0x7fL) != 0) { n += 1; x >>>= 7 }
    n
  }

  private final class ProtoOut(cap: Int = 64) {
    private var buf = new Array[Byte](cap)
    private var n = 0
    // largest byte[] a JVM reliably allocates; also the framing cap
    private val MaxMessageBytes = Int.MaxValue - 16
    private def ensure(k: Int): Unit = {
      // guard BEFORE the doubling loop: once capacity passes 2^30 the
      // `c *= 2` would overflow Int (2^31 → negative → 0) and spin
      // forever, hanging the task instead of failing with a named error
      if (k < 0 || n > MaxMessageBytes - k)
        throw new IllegalArgumentException(
          s"tfrecord proto: example too large ($n + $k bytes exceeds " +
            s"the $MaxMessageBytes-byte message cap)")
      if (n + k > buf.length) {
        var c = buf.length
        while (c < n + k)
          c = if (c > MaxMessageBytes / 2) MaxMessageBytes else c * 2
        buf = java.util.Arrays.copyOf(buf, c)
      }
    }
    def varint(v: Long): Unit = {
      ensure(10)
      var x = v
      while ((x & ~0x7fL) != 0) { buf(n) = ((x & 0x7f) | 0x80).toByte; n += 1; x >>>= 7 }
      buf(n) = x.toByte; n += 1
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, buf, n, b.length); n += b.length }
    def floatLE(f: Float): Unit = {
      ensure(4)
      val bits = java.lang.Float.floatToIntBits(f)
      buf(n) = bits.toByte; buf(n + 1) = (bits >>> 8).toByte
      buf(n + 2) = (bits >>> 16).toByte; buf(n + 3) = (bits >>> 24).toByte
      n += 4
    }
    def lenDelimited(field: Int, payload: ProtoOut): Unit = {
      tag(field, 2); varint(payload.n.toLong); ensure(payload.n)
      System.arraycopy(payload.buf, 0, buf, n, payload.n); n += payload.n
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, n)
    def size: Int = n
  }

  /** One typed feature value. */
  sealed trait FeatureValue
  final case class BytesFeature(values: Seq[Array[Byte]]) extends FeatureValue
  final case class Int64Feature(values: Seq[Long]) extends FeatureValue
  final case class FloatFeature(values: Seq[Float]) extends FeatureValue

  /** One `Feature` message (`BytesList`/`FloatList`/`Int64List`). */
  private def encodeFeature(fv: FeatureValue): ProtoOut = {
    val feature = new ProtoOut()
    fv match {
      case BytesFeature(vs) =>
        val bl = new ProtoOut()
        vs.foreach { b => bl.tag(1, 2); bl.varint(b.length.toLong); bl.bytes(b) }
        feature.lenDelimited(1, bl)
      case FloatFeature(vs) =>
        val fl = new ProtoOut()
        // packed form (what TF writes): field 1, wire 2, 4·n payload
        fl.tag(1, 2); fl.varint(4L * vs.length)
        vs.foreach(fl.floatLE)
        feature.lenDelimited(2, fl)
      case Int64Feature(vs) =>
        val il = new ProtoOut()
        il.tag(1, 2); il.varint(vs.map(varintLen).map(_.toLong).sum)
        vs.foreach(il.varint)
        feature.lenDelimited(3, il)
    }
    feature
  }

  /** One `Features` message: `map<string, Feature>` as repeated
    * key/value entry messages, sorted by name for determinism.
    */
  private def encodeFeatures(features: Map[String, FeatureValue]): ProtoOut = {
    val featuresMsg = new ProtoOut()
    features.toSeq.sortBy(_._1).foreach { case (name, fv) =>
      val entry = new ProtoOut()
      val key = name.getBytes("UTF-8")
      entry.tag(1, 2); entry.varint(key.length.toLong); entry.bytes(key)
      entry.lenDelimited(2, encodeFeature(fv))
      featuresMsg.lenDelimited(1, entry)
    }
    featuresMsg
  }

  /** Encode one `tf.train.Example` from a feature map (deterministic:
    * features emit in sorted-name order, so identical maps produce
    * identical bytes — TF parsers do not care about entry order).
    */
  def encodeExample(features: Map[String, FeatureValue]): Array[Byte] = {
    val example = new ProtoOut()
    example.lenDelimited(1, encodeFeatures(features))
    example.toArray
  }

  /** Encode one `tf.train.SequenceExample` — the context + feature_lists
    * form sequence/speech pipelines store (public proto:
    * `SequenceExample{ Features context = 1; FeatureLists
    * feature_lists = 2; }`, `FeatureLists{ map<string, FeatureList>
    * feature_list = 1; }`, `FeatureList{ repeated Feature feature = 1 }`).
    * Deterministic like [[encodeExample]]: both maps emit sorted by name.
    */
  def encodeSequenceExample(
      context: Map[String, FeatureValue],
      featureLists: Map[String, Seq[FeatureValue]],
  ): Array[Byte] = {
    val out = new ProtoOut()
    out.lenDelimited(1, encodeFeatures(context))
    val lists = new ProtoOut()
    featureLists.toSeq.sortBy(_._1).foreach { case (name, fvs) =>
      val list = new ProtoOut()
      fvs.foreach(fv => list.lenDelimited(1, encodeFeature(fv)))
      val entry = new ProtoOut()
      val key = name.getBytes("UTF-8")
      entry.tag(1, 2); entry.varint(key.length.toLong); entry.bytes(key)
      entry.lenDelimited(2, list)
      lists.lenDelimited(1, entry)
    }
    out.lenDelimited(2, lists)
    out.toArray
  }

  private final class ProtoIn(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      while (true) {
        if (pos >= end) throw new IllegalArgumentException(
          s"tfrecord proto: truncated varint at $pos")
        if (shift >= 64) throw new IllegalArgumentException(
          s"tfrecord proto: varint wider than 64 bits at $pos")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      0L // unreachable
    }
    def sub(len: Int): ProtoIn = {
      require(len >= 0 && pos + len <= end,
        s"tfrecord proto: length $len at $pos runs past $end")
      val s = new ProtoIn(buf, pos, pos + len)
      pos += len
      s
    }
    def slice(len: Int): Array[Byte] = {
      require(len >= 0 && pos + len <= end,
        s"tfrecord proto: length $len at $pos runs past $end")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    def floatLE(): Float = {
      require(pos + 4 <= end, s"tfrecord proto: truncated float at $pos")
      val bits = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => val l = varint(); sub(l.toInt); ()
      case 5 => require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case other => throw new IllegalArgumentException(
        s"tfrecord proto: unsupported wire type $other")
    }
  }

  /** Parse a `Features` message payload into `out`. */
  private def decodeFeaturesMsg(features: ProtoIn,
      out: scala.collection.mutable.LinkedHashMap[String, FeatureValue]): Unit =
    while (features.hasMore) {
      val ftag = features.varint()
      if ((ftag >> 3) == 1 && (ftag & 7) == 2) {
        val entry = features.sub(features.varint().toInt)
        var key: String = null
        var value: FeatureValue = null
        while (entry.hasMore) {
          val etag = entry.varint()
          (etag >> 3, etag & 7) match {
            case (1, 2) => key = new String(entry.slice(entry.varint().toInt), "UTF-8")
            case (2, 2) => value = decodeFeature(entry.sub(entry.varint().toInt))
            case (_, w) => entry.skip(w.toInt)
          }
        }
        if (key != null && value != null) out(key) = value
      } else features.skip((ftag & 7).toInt)
    }

  /** Decode an Example's feature map (subset parser; unknown fields at
    * any level skip by wire type, exactly like a generated parser).
    */
  def decodeExample(bytes: Array[Byte]): Map[String, FeatureValue] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, FeatureValue]
    val ex = new ProtoIn(bytes, 0, bytes.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2)
        decodeFeaturesMsg(ex.sub(ex.varint().toInt), out)
      else ex.skip((tag & 7).toInt)
    }
    out.toMap
  }

  /** Decode a SequenceExample into (context, feature_lists). Unknown
    * fields skip by wire type at every level, like [[decodeExample]].
    */
  def decodeSequenceExample(bytes: Array[Byte])
      : (Map[String, FeatureValue], Map[String, Seq[FeatureValue]]) = {
    val ctx = scala.collection.mutable.LinkedHashMap.empty[String, FeatureValue]
    val lists =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[FeatureValue]]
    val se = new ProtoIn(bytes, 0, bytes.length)
    while (se.hasMore) {
      val tag = se.varint()
      (tag >> 3, tag & 7) match {
        case (1, 2) => decodeFeaturesMsg(se.sub(se.varint().toInt), ctx)
        case (2, 2) => // FeatureLists
          val fls = se.sub(se.varint().toInt)
          while (fls.hasMore) {
            val ftag = fls.varint()
            if ((ftag >> 3) == 1 && (ftag & 7) == 2) {
              val entry = fls.sub(fls.varint().toInt)
              var key: String = null
              val fvs = scala.collection.mutable.ArrayBuffer.empty[FeatureValue]
              while (entry.hasMore) {
                val etag = entry.varint()
                (etag >> 3, etag & 7) match {
                  case (1, 2) =>
                    key = new String(entry.slice(entry.varint().toInt), "UTF-8")
                  case (2, 2) => // FeatureList{ repeated Feature = 1 }
                    val fl = entry.sub(entry.varint().toInt)
                    while (fl.hasMore) {
                      val ltag = fl.varint()
                      if ((ltag >> 3) == 1 && (ltag & 7) == 2)
                        fvs += decodeFeature(fl.sub(fl.varint().toInt))
                      else fl.skip((ltag & 7).toInt)
                    }
                  case (_, w) => entry.skip(w.toInt)
                }
              }
              if (key != null) lists(key) = fvs.toSeq
            } else fls.skip((ftag & 7).toInt)
          }
        case (_, w) => se.skip(w.toInt)
      }
    }
    (ctx.toMap, lists.toMap)
  }

  private def decodeFeature(f: ProtoIn): FeatureValue = {
    var out: FeatureValue = null
    while (f.hasMore) {
      val tag = f.varint()
      (tag >> 3, tag & 7) match {
        case (1, 2) => // BytesList
          val bl = f.sub(f.varint().toInt)
          val vs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (bl.hasMore) {
            val t = bl.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) vs += bl.slice(bl.varint().toInt)
            else bl.skip((t & 7).toInt)
          }
          out = BytesFeature(vs.toSeq)
        case (2, 2) => // FloatList (packed or message-framed)
          val fl = f.sub(f.varint().toInt)
          val vs = scala.collection.mutable.ArrayBuffer.empty[Float]
          while (fl.hasMore) {
            val t = fl.varint()
            (t >> 3, t & 7) match {
              case (1, 2) => // packed block
                val block = fl.sub(fl.varint().toInt)
                while (block.hasMore) vs += block.floatLE()
              case (1, 5) => vs += fl.floatLE() // unpacked element
              case (_, w) => fl.skip(w.toInt)
            }
          }
          out = FloatFeature(vs.toSeq)
        case (3, 2) => // Int64List (packed or unpacked)
          val il = f.sub(f.varint().toInt)
          val vs = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (il.hasMore) {
            val t = il.varint()
            (t >> 3, t & 7) match {
              case (1, 2) =>
                val block = il.sub(il.varint().toInt)
                while (block.hasMore) vs += block.varint()
              case (1, 0) => vs += il.varint()
              case (_, w) => il.skip(w.toInt)
            }
          }
          out = Int64Feature(vs.toSeq)
        case (_, w) => f.skip(w.toInt)
      }
    }
    if (out == null) BytesFeature(Seq.empty) else out
  }

  // ------------------------------------------------------------------
  // Spark surface
  // ------------------------------------------------------------------

  /** Name of the driver-written commit marker (Hadoop convention). */
  val SuccessMarker = "_SUCCESS"

  /** Shard compression, mirroring the public `TFRecordOptions`
    * compression_type values: `""` (none), `"GZIP"`, `"ZLIB"` (raw
    * RFC 1950 deflate). Either wraps the WHOLE framed stream; framing
    * is unchanged. TF readers take the compression as an option (files
    * carry no marker); this engine encodes it in the shard extension
    * (`.tfrecord` / `.tfrecord.gz` / `.tfrecord.zlib`) so reads
    * self-describe per file.
    */
  // Locale.ROOT: a tr/az default-locale JVM uppercases "gzip" to
  // "GZ\u0130P" (dotted capital I) and a legitimate argument stops
  // matching
  private def shardExt(compression: String): String =
    compression.toUpperCase(java.util.Locale.ROOT) match {
      case "" | "NONE" => ".tfrecord"
      case "GZIP" => ".tfrecord.gz"
      case "ZLIB" => ".tfrecord.zlib"
      case other => throw new IllegalArgumentException(
        s"tfrecord: unknown compression '$other' (use '', GZIP or ZLIB)")
    }

  private def wrapOut(raw: java.io.OutputStream,
      compression: String): java.io.OutputStream =
    compression.toUpperCase(java.util.Locale.ROOT) match {
      case "" | "NONE" => raw
      case "GZIP" => new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      case "ZLIB" => new java.util.zip.DeflaterOutputStream(raw,
        new java.util.zip.Deflater(), 1 << 16)
      case other => throw new IllegalArgumentException(
        s"tfrecord: unknown compression '$other'")
    }

  private def wrapIn(path: String,
      raw: java.io.InputStream): java.io.InputStream =
    if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
    else if (path.endsWith(".zlib"))
      new java.util.zip.InflaterInputStream(raw,
        new java.util.zip.Inflater(), 1 << 16)
    else raw

  /** Write a binary column as framed TFRecord shards, one
    * `part-NNNNN.tfrecord` per input partition, streamed from the
    * executors through the Hadoop FS. Commit protocol (safe under
    * speculative execution and task retries):
    *
    *  - each task ATTEMPT writes `_tmp.part-NNNNN.<taskAttemptId>` — two
    *    live attempts of the same partition never touch the same file;
    *  - the attempt renames its tmp to `part-NNNNN.tfrecord`;
    *    if the final name already exists (a sibling attempt committed
    *    first) the rename is treated as success and the loser's tmp is
    *    deleted — the committed bytes are an identical encode of the
    *    same partition;
    *  - after the job, the DRIVER sweeps `_tmp.*` litter and writes a
    *    `_SUCCESS` marker; [[readRecords]] requires the marker by
    *    default, so a job that died after renaming SOME shards is not
    *    silently read as a complete dataset.
    *
    * Returns the record count. `dir` must not already contain a
    * committed dataset (a `_SUCCESS` marker — appending would mix
    * shards); an UNcommitted leftover dir from a died job is wiped so
    * retries are clean — but ONLY when it holds nothing besides this
    * writer's own artifact names (`_tmp.part-*` attempts and
    * `part-*.tfrecord*` shards). A dir with any other content (a lake
    * written by another tool, a mistyped path) is refused loudly
    * rather than destroyed.
    *
    * Determinism requirement: the idempotent sibling-commit step treats
    * an already-present final shard as an equivalent encode of the same
    * partition. That holds only for DETERMINISTIC lineage — the same
    * requirement Spark's own file committers place on their jobs
    * (SPARK-23207). After a round-robin `repartition(n)` or other
    * unordered shuffle, a retried attempt may encode different rows; the
    * shard content is then whichever attempt committed first and the
    * returned count may come from the discarded attempt. Sort or
    * hash-partition on a key before writing if exact shard contents
    * matter.
    */
  def writeRecords(df: DataFrame, binCol: String, dir: String,
      compression: String = ""): Long = {
    val spark = df.sparkSession
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) {
      require(!fs.exists(new org.apache.hadoop.fs.Path(hp, SuccessMarker)),
        s"tfrecord: $dir already holds a committed dataset — writing " +
          "into it would mix shards")
      // No marker: EITHER a prior writeRecords died mid-job (the dir
      // then holds only this writer's own artifact names) — wipe for a
      // clean retry — OR it is a lake written by another tool / a
      // mistyped path, which must be refused, not destroyed.
      val foreign = fs.listStatus(hp).filterNot { st =>
        val n = st.getPath.getName
        st.isFile && (n.startsWith("_tmp.part-") ||
          (n.startsWith("part-") && n.contains(".tfrecord")))
      }
      require(foreign.isEmpty,
        s"tfrecord: $dir exists without a $SuccessMarker marker and " +
          s"holds content not written by this writer (e.g. " +
          s"'${foreign.head.getPath.getName}') — refusing to wipe it; " +
          "delete the directory explicitly or choose another path")
      // a SILENTLY failed wipe (delete returning false) would let stale
      // part-N shards from the died job survive under the NEW job's
      // _SUCCESS when the new job writes fewer partitions — the same
      // silent-false class as CopyTool's stale-destination delete
      if (!fs.delete(hp, true)) throw new java.io.IOException(
        s"tfrecord: could not wipe leftover uncommitted dir $dir for a " +
          "clean retry — stale shards would mix with the new write")
    }
    fs.mkdirs(hp)
    val confBox = spark.sparkContext.broadcast(
      org.apache.spark.GraftSparkBridge.hadoopConfBox(spark.sparkContext))
    val idx = df.schema.fieldIndex(binCol)
    require(df.schema(idx).dataType == BinaryType,
      s"tfrecord: $binCol must be binary, got ${df.schema(idx).dataType}")
    val ext = shardExt(compression)
    val counts = df.rdd.mapPartitionsWithIndex { (part, rows) =>
      val conf = confBox.value.value
      val tc = org.apache.spark.TaskContext.get()
      val attempt = if (tc == null) 0L else tc.taskAttemptId()
      // Locale.ROOT: shard names are PROTOCOL (the own-litter matching
      // and natural sort key on them) — the f-interpolator's %05d pads
      // with the DEFAULT locale's zero digit, which is not ASCII '0' on
      // every JVM locale
      val part5 = String.format(java.util.Locale.ROOT, "%05d",
        Integer.valueOf(part))
      val fin = new org.apache.hadoop.fs.Path(dir, s"part-$part5$ext")
      val tmp = new org.apache.hadoop.fs.Path(
        dir, s"_tmp.part-$part5.$attempt")
      val pfs = fin.getFileSystem(conf)
      val raw: java.io.OutputStream =
        new java.io.BufferedOutputStream(pfs.create(tmp, true), 1 << 16)
      val out = new java.io.DataOutputStream(wrapOut(raw, compression))
      var n = 0L
      try {
        rows.foreach { r =>
          val b = r.getAs[Array[Byte]](idx)
          if (b != null) { writeFramed(out, b); n += 1 }
        }
      } finally out.close()
      if (n == 0) { pfs.delete(tmp, false); Iterator.single(0L) }
      else if (pfs.rename(tmp, fin)) Iterator.single(n)
      else if (pfs.exists(fin)) {
        // idempotent commit: a sibling/prior attempt of this partition
        // already renamed its identical encode into place
        pfs.delete(tmp, false)
        Iterator.single(n)
      } else throw new java.io.IOException(s"tfrecord: could not commit $fin")
    }.collect()
    // driver-side epilogue: sweep attempt litter, then mark committed
    fs.listStatus(hp).foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith("_tmp."))
        fs.delete(st.getPath, false)
    }
    fs.create(new org.apache.hadoop.fs.Path(hp, SuccessMarker), true).close()
    counts.sum
  }

  private def listShards(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    fs.listStatus(hp)
      .filter(st => st.isFile && (st.getPath.getName.endsWith(".tfrecord")
        || st.getPath.getName.endsWith(".tfrecord.gz")
        || st.getPath.getName.endsWith(".tfrecord.zlib")))
      .map(_.getPath).sortBy(_.getName).toSeq

  /** Read framed TFRecord shards back as `(path, record: binary)` —
    * one task per shard file, memory bounded by one record.
    *
    * `requireCommitted` (default true) demands the writer's `_SUCCESS`
    * marker, so a [[writeRecords]] job that died after committing SOME
    * shards reads as a loud error instead of a silently-partial
    * dataset. Pass false for lakes written by OTHER tools (TF's own
    * writers emit no marker).
    */
  def readRecords(
      spark: SparkSession,
      dir: String,
      maxRecordBytes: Long = 1L << 30,
      verifyCrc: Boolean = true,
      requireCommitted: Boolean = true,
  ): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (requireCommitted)
      require(fs.exists(new org.apache.hadoop.fs.Path(hp, SuccessMarker)),
        s"tfrecord: $dir has no $SuccessMarker marker — the write never " +
          "committed; OR the lake predates this library's marker " +
          s"protocol (if it is known complete, touch $SuccessMarker " +
          "into it once to migrate); OR it was written by another " +
          "tool: pass requireCommitted=false")
    val files = listShards(fs, hp).map(_.toString)
    // a COMMITTED lake with zero shards is a legitimately empty dataset
    // (every input partition was empty, so no part files were renamed in)
    // — read it as an empty frame, not an error; only an UNcommitted
    // shardless dir is a wrong path / never-ran write and stays loud
    if (files.isEmpty &&
        fs.exists(new org.apache.hadoop.fs.Path(hp, SuccessMarker))) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("path", StringType),
          StructField("record", BinaryType))))
    }
    require(files.nonEmpty, s"tfrecord: no .tfrecord shards under $dir")
    import spark.implicits._
    // parallelize with numSlices == files.length puts EXACTLY one path
    // per partition → one task per shard file, no shuffle. (Hashing on
    // the path — repartition(n, col) — collides several shards into
    // one task and leaves others empty; round-robin repartition from a
    // multi-partition local relation starts each input partition at a
    // pseudo-random offset and collides the same way.)
    val paths = spark.sparkContext.parallelize(files, files.length)
      .toDF("path")
    val confBox = spark.sparkContext.broadcast(
      org.apache.spark.GraftSparkBridge.hadoopConfBox(spark.sparkContext))
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("record", BinaryType)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    paths.mapPartitions { rows =>
      val conf = confBox.value.value
      rows.flatMap { r =>
        val p = r.getString(0)
        val hPath = new org.apache.hadoop.fs.Path(p)
        val fsStream = hPath.getFileSystem(conf).open(hPath)
        val stream = wrapIn(p, fsStream)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          try stream.close() catch { case _: Exception => () }
          try fsStream.close() catch { case _: Exception => () }
        }
        recordIterator(stream, maxRecordBytes, verifyCrc)
          .map(rec => Row(p, rec))
      }
    }(enc)
  }

  /** Supported per-column Example encodings (see [[writeExamples]]). */
  private def featureOf(dt: DataType, v: Any): FeatureValue = (dt, v) match {
    case (StringType, s: String) => BytesFeature(Seq(s.getBytes("UTF-8")))
    case (BinaryType, b: Array[Byte]) => BytesFeature(Seq(b))
    case (LongType, l: Long) => Int64Feature(Seq(l))
    case (IntegerType, i: Int) => Int64Feature(Seq(i.toLong))
    case (FloatType, f: Float) => FloatFeature(Seq(f))
    case (DoubleType, d: Double) => FloatFeature(Seq(d.toFloat))
    case (ArrayType(LongType, _), s: scala.collection.Seq[_]) =>
      Int64Feature(s.map(_.asInstanceOf[Long]).toSeq)
    case (ArrayType(IntegerType, _), s: scala.collection.Seq[_]) =>
      Int64Feature(s.map(_.asInstanceOf[Int].toLong).toSeq)
    case (ArrayType(FloatType, _), s: scala.collection.Seq[_]) =>
      FloatFeature(s.map(_.asInstanceOf[Float]).toSeq)
    case (ArrayType(DoubleType, _), s: scala.collection.Seq[_]) =>
      FloatFeature(s.map(_.asInstanceOf[Double].toFloat).toSeq)
    case (other, _) => throw new IllegalArgumentException(
      s"tfrecord: unsupported feature type $other")
  }

  /** Write `cols` of `df` as `tf.train.Example` records (feature name =
    * column name; string/binary → BytesList, integral → Int64List,
    * floating → FloatList — `double` narrows to proto `float`, the
    * Example schema's only floating type). Null-valued features are
    * omitted from their record (proto absence), matching TF convention.
    */
  def writeExamples(df: DataFrame, dir: String, cols: Seq[String],
      compression: String = ""): Long = {
    require(cols.nonEmpty, "no feature columns given")
    val fields = cols.map(c => df.schema(df.schema.fieldIndex(c)))
    val src = df.select(cols.map(col): _*)
    val outSchema = StructType(Seq(StructField("example", BinaryType)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val encoded = src.mapPartitions { rows =>
      rows.map { r =>
        val feats = fields.zipWithIndex.flatMap { case (f, i) =>
          if (r.isNullAt(i)) None
          else Some(f.name -> featureOf(f.dataType, r.get(i)))
        }.toMap
        Row(encodeExample(feats))
      }
    }(enc)
    writeRecords(encoded, "example", dir, compression)
  }

  /** Infer a Spark schema from up to `sampleRecords` Examples sampled
    * ACROSS the shards (driver-side, bounded streams, records split
    * evenly over the files — the audit entry point for an unknown
    * TFRecord lake): BytesList → `binary` (or
    * `array<binary>` when any sampled record is multi-valued),
    * Int64List → `long`/`array<long>`, FloatList →
    * `float`/`array<float>`. Every field is nullable (absence is the
    * proto convention). Feature names sort for determinism. Callers
    * wanting `string` for text features re-type after inspection —
    * bytes is the only lossless default (proto cannot distinguish).
    */
  /** The shards [[inferSchema]] actually opens: at most
    * `min(shards, sampleRecords)` of them, spread evenly across the
    * sorted list (first shard always included). A lake of a million
    * shards must not cost a million serial driver-side opens for a
    * 100-record sample — the old `max(1, sample/shards)` per-shard
    * floor did exactly that.
    */
  private[pipeline] def shardsToVisit[A](shards: Seq[A],
      sampleRecords: Int): Seq[A] = {
    val k = math.min(shards.length, math.max(1, sampleRecords))
    if (k >= shards.length) shards
    else (0 until k).map(i => shards((i.toLong * shards.length / k).toInt))
  }

  def inferSchema(
      spark: SparkSession,
      dir: String,
      sampleRecords: Int = 100,
      maxRecordBytes: Long = 1L << 30,
  ): StructType = {
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val allShards = listShards(fs, hp)
    require(allShards.nonEmpty, s"tfrecord: no .tfrecord shards under $dir")
    val shards = shardsToVisit(allShards, sampleRecords)
    val perShard = math.max(1, sampleRecords / shards.length)
    // (kind, everMultiValued) per feature name
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[String, (Int, Boolean)]
    shards.foreach { shard =>
      val fsStream = fs.open(shard)
      val stream = wrapIn(shard.getName, fsStream)
      try {
        recordIterator(stream, maxRecordBytes, verifyCrc = true)
          .take(perShard)
          .foreach { rec =>
            decodeExample(rec).foreach { case (k, v) =>
              val (kind, n) = v match {
                case BytesFeature(vs) => (0, vs.length)
                case FloatFeature(vs) => (1, vs.length)
                case Int64Feature(vs) => (2, vs.length)
              }
              seen.get(k) match {
                case Some((k0, _)) if k0 != kind =>
                  throw new IllegalArgumentException(
                    s"tfrecord: feature '$k' changes kind across records — " +
                      "pass an explicit schema")
                case Some((k0, multi)) => seen(k) = (k0, multi || n > 1)
                case None => seen(k) = (kind, n > 1)
              }
            }
          }
      } finally { stream.close(); fsStream.close() }
    }
    require(seen.nonEmpty, s"tfrecord: no decodable Examples under $dir")
    StructType(seen.toSeq.sortBy(_._1).map { case (name, (kind, multi)) =>
      val scalar = kind match {
        case 0 => BinaryType
        case 1 => FloatType
        case _ => LongType
      }
      StructField(name, if (multi) ArrayType(scalar) else scalar)
    })
  }

  /** Read an Example lake back into typed columns: for each requested
    * field, the feature decodes to the Spark type — `string`/`binary`
    * take the FIRST BytesList element, `long` the first Int64 element,
    * `float` the first float, `array<...>` the whole list; absent
    * features yield null. One task per shard, streaming.
    */
  def readExamples(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      maxRecordBytes: Long = 1L << 30,
      verifyCrc: Boolean = true,
      requireCommitted: Boolean = true,
  ): DataFrame = {
    // requireCommitted passes through: [[inferSchema]] deliberately takes
    // no marker (it is the audit entry for lakes OTHER tools wrote), so
    // the typed read of such a lake needs the same escape
    val recs = readRecords(spark, dir, maxRecordBytes, verifyCrc,
      requireCommitted)
    val enc: Encoder[Row] = Encoders.row(schema)
    recs.select("record").mapPartitions { rows =>
      rows.map { r =>
        val feats = decodeExample(r.getAs[Array[Byte]](0))
        Row.fromSeq(schema.fields.toSeq.map { f =>
          feats.get(f.name).map(typedValue(f.name, f.dataType, _)).orNull
        })
      }
    }(enc)
  }

  /** One feature decoded to the requested Spark type: `string`/`binary`
    * take the FIRST BytesList element, `long` the first Int64, `float`
    * the first float, `array<...>` the whole list.
    */
  private def typedValue(name: String, dt: DataType, v: FeatureValue): Any =
    (dt, v) match {
      case (StringType, BytesFeature(vs)) =>
        vs.headOption.map(new String(_, "UTF-8")).orNull
      case (BinaryType, BytesFeature(vs)) => vs.headOption.orNull
      case (LongType, Int64Feature(vs)) => vs.headOption.map(Long.box).orNull
      case (FloatType, FloatFeature(vs)) => vs.headOption.map(Float.box).orNull
      case (DoubleType, FloatFeature(vs)) =>
        vs.headOption.map(x => Double.box(x.toDouble)).orNull
      case (ArrayType(BinaryType, _), BytesFeature(vs)) => vs
      case (ArrayType(StringType, _), BytesFeature(vs)) =>
        vs.map(new String(_, "UTF-8"))
      case (ArrayType(LongType, _), Int64Feature(vs)) => vs
      case (ArrayType(FloatType, _), FloatFeature(vs)) => vs
      case (ArrayType(DoubleType, _), FloatFeature(vs)) => vs.map(_.toDouble)
      case (other, got) => throw new IllegalArgumentException(
        s"tfrecord: feature '$name' is ${got.getClass.getSimpleName}, " +
          s"requested $other")
    }

  // ------------------------------------------------------------------
  // SequenceExample Spark surface
  // ------------------------------------------------------------------

  /** Write rows as `tf.train.SequenceExample` records. `contextCols`
    * encode like [[writeExamples]] (scalar/array → context features).
    * Each of `sequenceCols` must be array-typed and becomes a
    * FeatureList — the TIMESTEP axis is the outer array:
    *
    *  - `array<long|int|float|double|string|binary>` → one SINGLE-valued
    *    Feature per element (the classic per-timestep token/label form);
    *  - `array<array<long|int|float|double>>` → one multi-valued Feature
    *    per inner list (per-timestep vectors, e.g. audio frames).
    *
    * Null context features are omitted (proto absence); a null sequence
    * column yields an absent feature_list. Returns the record count.
    */
  def writeSequenceExamples(df: DataFrame, dir: String,
      contextCols: Seq[String], sequenceCols: Seq[String],
      compression: String = ""): Long = {
    require(sequenceCols.nonEmpty, "no sequence columns given")
    val all = contextCols ++ sequenceCols
    require(all.distinct.length == all.length,
      s"tfrecord: context/sequence column names overlap: " +
        all.diff(all.distinct).distinct.mkString(", "))
    val fields = all.map(c => df.schema(df.schema.fieldIndex(c)))
    val nCtx = contextCols.length
    // per-timestep element type of each sequence column (validated once)
    val seqElem = fields.drop(nCtx).map { f =>
      f.dataType match {
        case ArrayType(et, _) => et
        case other => throw new IllegalArgumentException(
          s"tfrecord: sequence column ${f.name} must be array-typed, " +
            s"got $other")
      }
    }
    val src = df.select(all.map(col): _*)
    val outSchema = StructType(Seq(StructField("example", BinaryType)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val encoded = src.mapPartitions { rows =>
      rows.map { r =>
        val ctx = fields.take(nCtx).zipWithIndex.flatMap { case (f, i) =>
          if (r.isNullAt(i)) None
          else Some(f.name -> featureOf(f.dataType, r.get(i)))
        }.toMap
        val lists = fields.drop(nCtx).zipWithIndex.flatMap { case (f, j) =>
          val i = nCtx + j
          if (r.isNullAt(i)) None
          else {
            val steps = r.getSeq[Any](i)
            Some(f.name -> steps.map(step =>
              featureOf(seqElem(j), step)).toSeq)
          }
        }.toMap
        Row(encodeSequenceExample(ctx, lists))
      }
    }(enc)
    writeRecords(encoded, "example", dir, compression)
  }

  /** Read a SequenceExample lake back into typed columns. Context
    * fields decode like [[readExamples]]. Sequence fields must be
    * array-typed: the OUTER array is the timestep axis — declare
    * `array<T>` (T scalar) for single-valued-per-step lists, or
    * `array<array<T>>` for per-step vectors. Absent features/lists
    * yield null. One task per shard, streaming.
    */
  def readSequenceExamples(
      spark: SparkSession,
      dir: String,
      contextSchema: StructType,
      sequenceSchema: StructType,
      maxRecordBytes: Long = 1L << 30,
      verifyCrc: Boolean = true,
      requireCommitted: Boolean = true,
  ): DataFrame = {
    val seqStep: Seq[DataType] = sequenceSchema.fields.toSeq.map { f =>
      f.dataType match {
        case ArrayType(et, _) => et
        case other => throw new IllegalArgumentException(
          s"tfrecord: sequence field ${f.name} must be array-typed " +
            s"(outer array = timesteps), got $other")
      }
    }
    val schema = StructType(contextSchema.fields.toSeq ++
      sequenceSchema.fields.toSeq)
    require(schema.fieldNames.distinct.length == schema.fieldNames.length,
      s"tfrecord: context/sequence field names overlap: " +
        schema.fieldNames.diff(schema.fieldNames.distinct)
          .distinct.mkString(", "))
    val recs = readRecords(spark, dir, maxRecordBytes, verifyCrc,
      requireCommitted)
    val enc: Encoder[Row] = Encoders.row(schema)
    recs.select("record").mapPartitions { rows =>
      rows.map { r =>
        val (ctx, lists) = decodeSequenceExample(r.getAs[Array[Byte]](0))
        val ctxVals = contextSchema.fields.toSeq.map { f =>
          ctx.get(f.name).map(typedValue(f.name, f.dataType, _)).orNull
        }
        val seqVals = sequenceSchema.fields.toSeq.zip(seqStep).map {
          case (f, step) => lists.get(f.name)
            .map(_.map(fv => typedValue(f.name, step, fv)))
            .orNull
        }
        Row.fromSeq(ctxVals ++ seqVals)
      }
    }(enc)
  }
}
