package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition over a MIXED media column: one binary column
  * holding PNG / JPEG (baseline + progressive) / GIF / BMP images, WAV
  * audio, an MJPEG AVI video, and junk — driven through the real
  * decoders into features and cross-format near-dup clustering. This is
  * the multimodal-corpus shape: you never get one format per table.
  */
class MultimodalPipelineSpec extends SparkSpec {
  import spark.implicits._

  // a 32x16 gradient with few distinct colors (GIF-encodable)
  private val baseImg = PixelCodec.Image(32, 16, 3,
    Array.tabulate(32 * 16 * 3) { j =>
      val p = j / 3
      (((p % 32) / 4 * 32 + (j % 3) * 10) % 250).toByte
    })

  test("cross-format duplicate detection: one image, four containers") {
    val png = PixelCodec.encodePng(baseImg)
    val bmp = PixelCodec.encodeBmp(baseImg)
    val gif = Gif.encode(baseImg)
    val jpg = Jpeg.encode(baseImg, quality = 95)
    val jpgProg = Jpeg.encodeProgressive(baseImg, quality = 95)
    // a genuinely different image
    val other = PixelCodec.encodePng(PixelCodec.Image(32, 16, 3,
      Array.tabulate(32 * 16 * 3)(j => ((j * 17) % 251).toByte)))
    val df = Seq(
      (1L, png), (2L, bmp), (3L, gif), (4L, jpg), (5L, jpgProg), (6L, other),
    ).toDF("id", "media")

    // lossless containers decode to identical pixels → identical dHash →
    // distance-0 pairs; the two JPEG entropy layouts decode to identical
    // pixels too (same quantized coefficients)
    val pairs = Multimodal.imageNearDuplicates(df, "media", "id",
      maxDistance = 4, hasher = Multimodal.dHashAuto)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lossless = Set(1L, 2L, 3L)
    for (a <- lossless; b <- lossless if a < b)
      assert(pairs.contains((a, b)), s"lossless pair ($a,$b)")
    assert(pairs.contains((4L, 5L)), "baseline vs progressive JPEG")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L),
      "the unrelated image must not pair")
  }

  private def toneWav(hz: Double, bits: Int, seconds: Double = 0.4): Array[Byte] = {
    val rate = 8000
    val n = (rate * seconds).toInt
    val bytesPer = if (bits == -32) 4 else bits / 8
    val data = java.nio.ByteBuffer.allocate(n * bytesPer)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      val v = 0.5 * math.sin(2 * math.Pi * hz * i / rate)
      bits match {
        case 16 => data.putShort((v * 32767).toShort)
        case 24 =>
          val q = (v * 8388607).toInt
          data.put((q & 0xff).toByte).put(((q >> 8) & 0xff).toByte)
            .put(((q >> 16) & 0xff).toByte)
        case -32 => data.putFloat(v.toFloat)
      }
    }
    val fmt = if (bits == -32) 3 else 1
    val b = if (bits == -32) 32 else bits
    val out = java.nio.ByteBuffer.allocate(44 + data.capacity())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + data.capacity()).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(1)
      .putInt(rate).putInt(rate * bytesPer).putShort(bytesPer.toShort)
      .putShort(b.toShort)
    out.put("data".getBytes).putInt(data.capacity()).put(data.array())
    out.array()
  }

  test("audio near-dup: same recording across sample formats, not across tones") {
    val df = Seq(
      (1L, toneWav(500, 16)),
      (2L, toneWav(500, 24)),   // same content, different bit depth
      (3L, toneWav(500, -32)),  // same content, float PCM
      (4L, toneWav(2000, 16)),  // different material
    ).toDF("id", "media")
    // re-encodings fingerprint identically → distance-0 pairs
    val fp1 = Multimodal.audioHashAuto(toneWav(500, 16))
    assert(fp1 === Multimodal.audioHashAuto(toneWav(500, 24)))
    assert(fp1 === Multimodal.audioHashAuto(toneWav(500, -32)))
    assert(fp1 !== Multimodal.audioHashAuto(toneWav(2000, 16)))
    val pairs = Multimodal.audioNearDuplicates(df, "media", "id", maxDistance = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (a <- Seq(1L, 2L); b <- Seq(2L, 3L) if a < b)
      assert(pairs.contains((a, b)), s"($a,$b)")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "the 2 kHz tone must not pair with the 500 Hz recordings")
  }

  test("one mixed column feeds image, audio and video features side by side") {
    val wav = {
      val n = 800
      val data = java.nio.ByteBuffer.allocate(n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach { i =>
        data.putShort((0.4 * math.sin(2 * math.Pi * 500 * i / 8000.0) * 32767).toShort)
      }
      val out = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      out.put("data".getBytes).putInt(n * 2).put(data.array())
      out.array()
    }
    val avi = Avi.encode(
      (0 until 3).map(p => Jpeg.encode(PixelCodec.Image(16, 16, 1,
        Array.tabulate(256)(i => ((i + p * 9) % 256).toByte)), quality = 90)),
      16, 16, fps = 20.0)
    val df = Seq(
      (1L, PixelCodec.encodePng(baseImg)),
      (2L, wav),
      (3L, avi),
      (4L, "not media at all".getBytes),
    ).toDF("id", "media")

    val img = Multimodal.imageColumns(df, "media")
      .select("id", "img_width").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(img === Map(1L -> 32, 2L -> -1, 3L -> -1, 4L -> -1))

    val aud = Multimodal.audioColumns(df, "media")
      .select("id", "sample_rate", "dominant_hz").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(aud === Map(1L -> -1, 2L -> 8000, 3L -> -1, 4L -> -1))

    val vid = Multimodal.videoColumns(df, "media")
      .select("id", "n_frames").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(vid === Map(1L -> -1, 2L -> -1, 3L -> 3, 4L -> -1))

    // frame sampling only fans out the video rows; others drop silently
    val frames = Multimodal.sampleVideoFrames(df, "media", nSamples = 2)
      .select("id").collect().map(_.getLong(0))
    assert(frames.toSeq === Seq(3L, 3L))
  }
}
