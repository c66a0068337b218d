package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in executor-side batches.
  *
  * Decode is REAL for the bundled dependency-free codecs — PNG/BMP
  * ([[PixelCodec]]), JPEG baseline + progressive ([[Jpeg]]), GIF
  * ([[Gif]]), WAV-PCM audio, MJPEG-AVI video ([[Avi]]) and the GVID
  * fixture container; formats outside that subset degrade to a
  * deterministic byte-derived metadata row rather than failing the
  * task. The Spark-side contract is the point either way: the schema,
  * the batched `mapPartitions` shape (the Scala analog of
  * `mapInPandas`), and the partition-size guidance for wide binary
  * rows.
  */
object Multimodal {

  /** Metadata extracted by the (stubbed) decoder. */
  case class MediaMeta(width: Int, height: Int, format: String, byteLen: Long)

  /** Decoded-asset schema appended by [[decodeMeta]]. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
  ))

  /** Container-header metadata decode. Real parsing for the three
    * fixed-layout headers that need no codec — PNG (IHDR), JPEG (SOFn
    * frame marker), WAV (fmt chunk: samples/sec × channels stand in for
    * width/height) — and a clearly-marked deterministic STUB for anything
    * else (pixel/audio *decoding* needs codec libraries this environment
    * doesn't ship; the fake derives stable pseudo-metadata from the raw
    * bytes so plumbing tests and oracles are reproducible).
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    def u16be(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def u32be(i: Int) =
      ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    def u16le(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32le(i: Int) =
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    val len = bytes.length.toLong
    // PNG: 8-byte signature, then the IHDR chunk at fixed offset
    if (len >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G')
      MediaMeta(u32be(16), u32be(20), "png", len)
    // JPEG: scan markers for the first SOFn (C0-C3) frame header
    else if (len >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      var out: MediaMeta = null
      while (out == null && i + 9 < bytes.length) {
        if ((bytes(i) & 0xff) == 0xff) {
          val marker = bytes(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xc3)
            out = MediaMeta(u16be(i + 7), u16be(i + 5), "jpeg", len)
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else i += 2 + u16be(i + 2)
        } else i += 1
      }
      if (out != null) out else MediaMeta(0, 0, "jpeg", len)
    }
    // WAV: RIFF....WAVE with an LE fmt chunk at the canonical offset
    else if (len >= 36 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V')
      MediaMeta(u32le(24), u16le(22), "wav", len) // sample rate, channels
    else stubMeta(bytes)
  }

  /** The deterministic fallback for non-container bytes (STUB — stands in
    * for codec-based feature extraction).
    */
  def stubMeta(bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    val fmt = if (bytes.isEmpty) "empty" else ((bytes(0) & 0xff) % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "wav"
    }
    MediaMeta((len % 640).toInt, ((len / 640) % 480).toInt, fmt, len)
  }

  /** Batched metadata extraction over a binary column: `mapPartitions`
    * with an iterator-to-iterator transform (constant memory per task, the
    * executor never materializes a partition). At 100 TB, pair with
    * `spark.sql.files.maxPartitionBytes` tuned down so that wide binary
    * rows keep tasks balanced.
    */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ MetaSchema.fields)
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        // Null binary values (nullable column) read as empty assets
        // rather than NPE-ing the whole task.
        val m = decodeStub(
          Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray))
        Row.fromSeq(r.toSeq ++ Seq(m.width, m.height, m.format, m.byteLen))
      }
    }(enc)
  }

  /** Batched fixed-dimension feature extraction over a binary column
    * (STUB kernel: a normalized 16-bucket byte histogram tiled to `dim` —
    * stands in for a codec+model embedding; schema/batching real). Output
    * appends `features: array<float>` of exactly `dim`.
    */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
        val n = math.max(bytes.length, 1).toFloat
        val feats = Array.tabulate(dim)(d => hist(d % 16) / n)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Batched "resize" over a binary column (STUB kernel: nearest-neighbor
    * byte resampling to `targetLen` — stands in for pixel-space resize;
    * the iterator-to-iterator batch shape and output schema contract are
    * the real plumbing). Output replaces the column with fixed-length
    * binary and appends the original length.
    */
  def resizeStub(df: DataFrame, binCol: String, targetLen: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("orig_len", LongType, nullable = false))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val resized =
          if (bytes.isEmpty) new Array[Byte](targetLen)
          else Array.tabulate(targetLen)(i => bytes((i.toLong * bytes.length / targetLen).toInt))
        Row.fromSeq(r.toSeq.updated(idx, resized) :+ bytes.length.toLong)
      }
    }(enc)
  }

  /** Fixed-count frame sampling positions for a (stubbed) video column:
    * byte offsets at which a real decoder would seek. Pure expressions —
    * demonstrates the plumbing of per-asset fan-out (one row per sampled
    * frame) without a codec.
    */
  def sampleFrameOffsets(df: DataFrame, binCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_offset",
        explode(transform(
          sequence(lit(0), lit(nFrames - 1)),
          i => floor((length(col(binCol)).cast("long") * i) / nFrames).cast("long"),
        )))

  /** Perceptual difference-hash (dHash) of an image binary: resample the
    * decoded grayscale to a 9×8 grid, set bit (r,c) iff cell (r,c) is
    * brighter than its right neighbor — 64 bits whose Hamming distance
    * tracks visual similarity. The *decode* is the STUB (nearest-neighbor
    * byte resample stands in for pixel luma — no codecs here); the grid
    * comparison, bit packing, and the near-dup machinery on top are real
    * and carry over unchanged to a real decoder.
    */
  def dHashStub(bytes: Array[Byte]): Long = {
    val cells = new Array[Int](72)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < 72) {
        cells(i) = bytes(((i.toLong * bytes.length) / 72).toInt) & 0xff
        i += 1
      }
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        h = (h << 1) | (if (cells(r * 9 + c) > cells(r * 9 + c + 1)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    h
  }

  /** REAL pixel-level image features for containers the dependency-free
    * codecs decode (PNG — [[PixelCodec.decodePng]]; baseline JPEG —
    * [[Jpeg.decode]]): appends nullable `img_width, img_height,
    * img_channels, mean_luma, img_dhash`, null for undecodable rows
    * (progressive JPEG and exotic subsets reject loudly inside the
    * try). Same iterator-to-iterator batch shape as [[decodeMeta]];
    * decode failures null the row's features instead of failing the
    * task.
    */
  def imageColumns(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_channels", IntegerType, nullable = true),
      StructField("mean_luma", DoubleType, nullable = true),
      StructField("img_dhash", LongType, nullable = true)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val feats =
          try {
            val img = PixelCodec.decodeImage(bytes)
            val g = PixelCodec.grayscale(img)
            var s = 0.0
            g.pixels.foreach(b => s += (b & 0xff))
            Seq[Any](img.width, img.height, img.channels,
              s / g.pixels.length, PixelCodec.dHash(img))
          } catch { case _: Exception => Seq[Any](null, null, null, null, null) }
        Row.fromSeq(r.toSeq ++ feats)
      }
    }(enc)
  }

  /** REAL signal-level audio features for PCM WAV
    * ([[PixelCodec.decodeWav]]): appends nullable `sample_rate,
    * audio_channels, duration_s, rms, zcr`; null for undecodable rows.
    */
  def audioColumns(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("audio_channels", IntegerType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("zcr", DoubleType, nullable = true),
      StructField("dominant_hz", DoubleType, nullable = true),
      StructField("spectral_centroid_hz", DoubleType, nullable = true)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val feats =
          try {
            val a = PixelCodec.decodeWav(bytes)
            val (dur, rms, zcr) = PixelCodec.audioFeatures(a)
            val (dom, centroid) = PixelCodec.spectralFeatures(a)
            Seq[Any](a.sampleRate, a.nChannels, dur, rms, zcr, dom, centroid)
          } catch {
            case _: Exception =>
              Seq[Any](null, null, null, null, null, null, null)
          }
        Row.fromSeq(r.toSeq ++ feats)
      }
    }(enc)
  }

  /** Log-mel embedding of an audio column: `mel: array<float>` of
    * `nMels` filterbank energies ([[PixelCodec.melSpectrum]]) — the
    * codec-independent audio vector for the embedding-similarity
    * family (cosine near-dup via [[Dedup.embeddingNearDuplicates]],
    * IVF indexing, clustering). Undecodable rows get NULL. Batched
    * `mapPartitions`, same shape as [[audioColumns]].
    */
  def audioEmbedding(df: DataFrame, binCol: String, nMels: Int = 26): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("mel", ArrayType(FloatType, containsNull = false),
        nullable = true))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val mel =
          try {
            PixelCodec.melSpectrum(PixelCodec.decodeWav(bytes), nMels)
              .map(_.toFloat).toSeq
          } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ mel)
      }
    }(enc)
  }

  /** Content dHash for PNG / baseline-JPEG bytes via the real codecs,
    * falling back to the byte-level [[dHashStub]] for containers the
    * dependency-free codecs can't decode — so mixed corpora still hash
    * every asset.
    */
  /** Content fingerprint for AUDIO bytes: the windowed spectral
    * fingerprint of the decoded signal, so the same recording re-encoded
    * at a different bit depth / int-vs-float PCM hashes identically;
    * undecodable bytes fall back to the byte-level stub (mirrors
    * [[dHashAuto]]).
    */
  def audioHashAuto(bytes: Array[Byte]): Long =
    try PixelCodec.audioFingerprint(PixelCodec.decodeWav(bytes))
    catch { case _: Exception => dHashStub(bytes) }

  /** Near-duplicate audio pairs by banded spectral fingerprint — the
    * audio twin of [[imageNearDuplicates]] (same pigeonhole banding,
    * different content hash).
    */
  def audioNearDuplicates(df: DataFrame, binCol: String, idCol: String,
      maxDistance: Int): DataFrame =
    imageNearDuplicates(df, binCol, idCol, maxDistance, audioHashAuto)

  def dHashAuto(bytes: Array[Byte]): Long =
    try PixelCodec.dHash(PixelCodec.decodeImage(bytes))
    catch { case _: Exception => dHashStub(bytes) }

  /** DCT perceptual hash over any decodable container (see
    * [[PixelCodec.pHash]]); byte-level stub fallback like [[dHashAuto]].
    * Use as the `hasher` of [[imageNearDuplicates]] when near-dups may
    * be RESCALED copies — dHash's resample grid shifts under scaling,
    * the low-frequency spectrum does not.
    */
  def pHashAuto(bytes: Array[Byte]): Long =
    try PixelCodec.pHash(PixelCodec.decodeImage(bytes))
    catch { case _: Exception => dHashStub(bytes) }

  /** Appends `dhash: long` — batched `hasher` over the binary column
    * (iterator-to-iterator, constant memory, same shape as
    * [[decodeMeta]]). Default [[dHashStub]]; pass [[dHashAuto]] to hash
    * decodable assets by CONTENT (real pixels) instead of raw bytes.
    */
  def dHash(df: DataFrame, binCol: String,
      hasher: Array[Byte] => Long = dHashStub): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("dhash", LongType, nullable = false))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        Row.fromSeq(r.toSeq :+ hasher(bytes))
      }
    }(enc)
  }

  /** Near-duplicate image pairs by dHash Hamming distance: pigeonhole the
    * 64-bit hash into `maxDistance + 1` blocks (≤ `maxDistance` differing
    * bits can corrupt at most `maxDistance` blocks, so some block matches
    * exactly), equi-join per block, verify with `bit_count(xor)`. Returns
    * distinct `(id_a, id_b, distance)` with `id_a < id_b` — the image-side
    * analog of SimHash text near-dup, same bounded-cardinality shuffle:
    * never an all-pairs comparison.
    */
  def imageNearDuplicates(
      df: DataFrame,
      binCol: String,
      idCol: String,
      maxDistance: Int,
      hasher: Array[Byte] => Long = dHashStub,
  ): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 64, s"maxDistance=$maxDistance")
    val nBlocks = maxDistance + 1
    val blocks = (0 until nBlocks).map { b =>
      val start = b * 64 / nBlocks
      val width = (b + 1) * 64 / nBlocks - start
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(b).as("bidx"),
        shiftrightunsigned(col("dhash"), start).bitwiseAND(lit(mask)).as("bval"))
    }
    // null/empty binaries all hash to 0 and would pair up as spurious
    // exact duplicates of each other — exclude them from pairing
    val present = df.filter(col(binCol).isNotNull && length(col(binCol)) > 0)
    val sides = dHash(present, binCol, hasher)
      .select(col(idCol).as("id"), col("dhash"),
        explode(array(blocks: _*)).as("_b"))
      .select(col("id"), col("dhash"),
        col("_b.bidx").as("bidx"), col("_b.bval").as("bval"))
    sides.as("a").join(sides.as("b"), Seq("bidx", "bval"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("distance"))
      .filter(col("distance") <= maxDistance)
      .distinct()
  }

  // ---- video container: real frame-sampling plumbing ----
  //
  // Real video codecs (H.264 etc.) need libraries this environment doesn't
  // ship, so the CONTAINER is a minimal seekable format of PNG frames —
  // "GVID": magic, u32 frame count, u32 fps×1000, then per frame
  // u32 length + PNG bytes — and the frame DECODE is the real PNG codec
  // ([[PixelCodec.decodePng]]). Everything a production frame-sampler
  // needs is therefore exercised for real: header-only metadata reads,
  // seek-to-frame without decoding the rest, per-asset fan-out to one row
  // per sampled frame, and pixel-level features on the decoded frames.

  private val GvidMagic = Array[Byte]('G', 'V', 'I', 'D')

  /** Encode PNG frames into a GVID container. */
  def encodeVideo(frames: Seq[Array[Byte]], fpsMilli: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      12 + frames.map(_.length + 4).sum)
    bb.put(GvidMagic)
    bb.putInt(frames.length)
    bb.putInt(fpsMilli)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** Container header + frame offsets WITHOUT decoding any frame —
    * the seek table a sampler needs. Throws on non-GVID bytes. Every
    * header-declared count/length is validated against the buffer's
    * actual size BEFORE allocation: a corrupt/hostile header declaring
    * a huge `n` would otherwise allocate gigabytes and raise an
    * OutOfMemoryError — an Error, which the drop-undecodable-rows
    * `catch (Exception)` in videoColumns/sampleVideoFrames does NOT
    * contain.
    */
  def videoIndex(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 12 && GvidMagic.indices.forall(i => bytes(i) == GvidMagic(i)),
      "not a GVID container")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(4)
    val n = bb.getInt
    val fpsMilli = bb.getInt
    // each frame costs ≥ 4 header bytes, so n can never exceed this
    require(n >= 0 && n <= (bytes.length - 12) / 4,
      s"GVID declares $n frames in a ${bytes.length}-byte buffer")
    val offsets = new Array[Int](n)
    var i = 0
    var pos = 12
    while (i < n) {
      require(pos + 4 <= bytes.length, s"frame $i header past end of buffer")
      val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      // long arithmetic: pos + 4 + Int.MaxValue wraps negative in int
      require(len >= 0 && pos + 4L + len <= bytes.length,
        s"frame $i length $len past end of buffer")
      offsets(i) = pos + 4
      pos += 4 + len
      i += 1
    }
    (n, fpsMilli, offsets)
  }

  /** Extract one frame's PNG bytes by index via the seek table. */
  def videoFrame(bytes: Array[Byte], index: Int): Array[Byte] = {
    val (n, _, offsets) = videoIndex(bytes)
    require(index >= 0 && index < n, s"frame $index of $n")
    val len = java.nio.ByteBuffer.wrap(bytes, offsets(index) - 4, 4).getInt
    java.util.Arrays.copyOfRange(bytes, offsets(index), offsets(index) + len)
  }

  /** Container dispatch by signature — GVID or AVI/MJPEG ([[Avi]]) —
    * as `(nFrames, fps·1000, frame extractor)`. Both walks validate
    * every declared size before allocating, so hostile headers throw
    * rather than OOM.
    */
  def videoInfo(bytes: Array[Byte]): (Int, Int, Int => Array[Byte]) =
    if (Avi.isAvi(bytes)) {
      val info = Avi.index(bytes)
      (info.nFrames, math.round(info.fps * 1000).toInt,
        i => Avi.frame(bytes, info, i))
    } else {
      val (n, fpsMilli, _) = videoIndex(bytes)
      (n, fpsMilli, i => videoFrame(bytes, i))
    }

  /** Per-asset video metadata: appends nullable `n_frames, fps,
    * duration_ms` from the container header only (no frame decode, no
    * full-buffer scan beyond the seek walk). GVID and AVI/MJPEG
    * containers both decode; undecodable rows null out.
    */
  def videoColumns(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", IntegerType, nullable = true),
      StructField("fps", DoubleType, nullable = true),
      StructField("duration_ms", DoubleType, nullable = true)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val feats =
          try {
            val (n, fpsMilli, _) = videoInfo(bytes)
            val fps = fpsMilli / 1000.0
            Seq[Any](n, fps, if (fps > 0) n / fps * 1000.0 else null)
          } catch { case _: Exception => Seq[Any](null, null, null) }
        Row.fromSeq(r.toSeq ++ feats)
      }
    }(enc)
  }

  /** Evenly-spaced frame sampling with REAL pixel features: one output
    * row per sampled frame with `frame_idx, frame_dhash, frame_luma`
    * (dHash + mean luma of the decoded frame — PNG frames in GVID,
    * JPEG frames in AVI/MJPEG). Iterator-to-iterator
    * `mapPartitions` fan-out — the Scala analog of a `mapInPandas`
    * batch explode; memory per task is one asset's sampled frames, not
    * the partition. Undecodable containers yield zero rows (drop-on-
    * error semantics — the curation default).
    */
  def sampleVideoFrames(df: DataFrame, binCol: String, nSamples: Int): DataFrame = {
    require(nSamples > 0, "nSamples must be positive")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_dhash", LongType, nullable = false),
      StructField("frame_luma", DoubleType, nullable = false)))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        try {
          val (n, _, frameAt) = videoInfo(bytes)
          val picks =
            (0 until math.min(nSamples, n)).map(i => i * n / math.min(nSamples, n))
          picks.iterator.map { fi =>
            val img = PixelCodec.decodeImage(frameAt(fi))
            val g = PixelCodec.grayscale(img)
            var s = 0.0
            g.pixels.foreach(b => s += (b & 0xff))
            Row.fromSeq(r.toSeq ++ Seq[Any](fi, PixelCodec.dHash(img),
              s / g.pixels.length))
          }
        } catch { case _: Exception => Iterator.empty }
      }
    }(enc)
  }
}
