package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JpegSpec extends SparkSpec {
  import spark.implicits._

  /** Smooth test content — JPEG is lossy, so round-trip error is only
    * bounded on band-limited images, not white noise.
    */
  private def gradient(w: Int, h: Int, ch: Int): PixelCodec.Image =
    PixelCodec.Image(w, h, ch, Array.tabulate(w * h * ch) { i =>
      val p = i / ch; val c = i % ch
      val x = p % w; val y = p / w
      ((x * 6 + y * 3 + c * 40) % 200 + 20).toByte
    })

  private def mae(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.sum
      .toDouble / a.length
  }

  test("gray round-trip: dimensions exact, error bounded") {
    val img = gradient(32, 24, 1)
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 90))
    assert(dec.width === 32 && dec.height === 24 && dec.channels === 1)
    assert(mae(img.pixels, dec.pixels) < 3.0)
  }

  test("RGB 4:4:4 round-trip on odd dimensions (partial MCUs)") {
    val img = gradient(37, 23, 3)
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 90))
    assert(dec.width === 37 && dec.height === 23 && dec.channels === 3)
    assert(mae(img.pixels, dec.pixels) < 6.0)
  }

  test("RGB 4:2:0 round-trip (subsampled chroma, generic MCU walk)") {
    val img = gradient(35, 21, 3) // odd dims: padded 16x16 MCUs + upsample
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 90, subsample = true))
    assert(dec.width === 35 && dec.height === 21 && dec.channels === 3)
    assert(mae(img.pixels, dec.pixels) < 10.0)
  }

  test("restart markers: DRI-coded stream decodes identically") {
    val img = gradient(64, 48, 3)
    val plain = Jpeg.decode(Jpeg.encode(img, quality = 90))
    val rst = Jpeg.encode(img, quality = 90, restartInterval = 3)
    // the stream really contains RST markers
    assert((0 until rst.length - 1).exists(i =>
      (rst(i) & 0xff) == 0xff && (rst(i + 1) & 0xff) >= 0xd0 &&
        (rst(i + 1) & 0xff) <= 0xd7))
    val dec = Jpeg.decode(rst)
    assert(dec.pixels.toSeq === plain.pixels.toSeq)
  }

  test("quality dial: higher quality = bigger file, lower error") {
    val img = gradient(48, 32, 3)
    val lo = Jpeg.encode(img, quality = 30)
    val hi = Jpeg.encode(img, quality = 95)
    assert(hi.length > lo.length)
    assert(mae(img.pixels, Jpeg.decode(hi).pixels) <
      mae(img.pixels, Jpeg.decode(lo).pixels))
  }

  test("unsupported subsets reject loudly; truncation cannot hang") {
    // progressive with no scans (SOF2 then nothing) must throw, not hang
    val sof2 = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b,
      8, 0, 16, 0, 16, 1, 1, 0x11, 0).map(_.toByte)
    intercept[Exception](Jpeg.decode(sof2))
    intercept[IllegalArgumentException](Jpeg.decode("junk".getBytes))
    // valid stream cut mid-entropy-data must throw, not loop
    val good = Jpeg.encode(gradient(32, 32, 1))
    intercept[Exception](Jpeg.decode(good.take(good.length / 2)))
    // progressive stream cut mid-scan as well
    val prog = Jpeg.encodeProgressive(gradient(32, 32, 1))
    intercept[Exception](Jpeg.decode(prog.take(prog.length / 2)))
  }

  test("progressive round-trip decodes to EXACTLY the baseline pixels") {
    // the progressive scan script codes the same quantized coefficients
    // as the baseline entropy coder, so the reconstruction must match
    // bit for bit — any scan-order / refinement / EOB-run bug breaks this
    for {
      (w, h) <- Seq((32, 24), (17, 13), (8, 8), (40, 9))
      ch <- Seq(1, 3)
      sub <- if (ch == 3) Seq(false, true) else Seq(false)
    } {
      val img = gradient(w, h, ch)
      val base = Jpeg.decode(Jpeg.encode(img, quality = 85, subsample = sub))
      val prog = Jpeg.decode(Jpeg.encodeProgressive(img, quality = 85,
        subsample = sub))
      assert(prog.width === base.width && prog.height === base.height &&
        prog.channels === base.channels, s"dims $w x $h ch=$ch sub=$sub")
      assert(prog.pixels.toSeq === base.pixels.toSeq,
        s"pixel mismatch at $w x $h ch=$ch sub=$sub")
    }
  }

  test("progressive: sparse and noisy content exercises ZRL and EOB runs") {
    // mostly-flat blocks (long EOB runs across blocks), isolated spikes
    // (ZRL + high-index coefficients), and noise (dense refinement bits)
    val rnd = new scala.util.Random(7)
    val flat = PixelCodec.Image(64, 48, 1, Array.fill(64 * 48)(100.toByte))
    val spikes = PixelCodec.Image(64, 48, 1, Array.tabulate(64 * 48)(i =>
      if (i % 97 == 0) 250.toByte else 80.toByte))
    val noise = PixelCodec.Image(48, 32, 3,
      Array.fill(48 * 32 * 3)((rnd.nextInt(256)).toByte))
    for ((img, name) <- Seq((flat, "flat"), (spikes, "spikes"), (noise, "noise"))) {
      val base = Jpeg.decode(Jpeg.encode(img, quality = 75))
      val prog = Jpeg.decode(Jpeg.encodeProgressive(img, quality = 75))
      assert(prog.pixels.toSeq === base.pixels.toSeq, s"$name content")
    }
  }

  test("decodeImage and imageColumns handle progressive JPEGs") {
    val img = gradient(20, 16, 3)
    val prog = Jpeg.encodeProgressive(img)
    val dec = PixelCodec.decodeImage(prog)
    assert(dec.width === 20 && dec.height === 16 && dec.channels === 3)
    val rows = Seq((1L, prog)).toDF("id", "img")
    val feats = Multimodal.imageColumns(rows, "img")
      .select("img_width", "img_height", "img_channels").head()
    assert((feats.getInt(0), feats.getInt(1), feats.getInt(2)) === ((20, 16, 3)))
  }

  test("decodeImage dispatches PNG and JPEG by signature") {
    val img = gradient(16, 16, 3)
    assert(PixelCodec.decodeImage(PixelCodec.encodePng(img)).pixels.toSeq
      === img.pixels.toSeq)
    val viaJpeg = PixelCodec.decodeImage(Jpeg.encode(img, quality = 95))
    assert(viaJpeg.width === 16 && viaJpeg.channels === 3)
    intercept[IllegalArgumentException](PixelCodec.decodeImage("nope".getBytes))
  }

  test("imageColumns extracts real features from JPEG rows") {
    val png = PixelCodec.encodePng(gradient(20, 10, 3))
    val jpg = Jpeg.encode(gradient(20, 10, 3), quality = 92)
    val df = Seq((1L, png), (2L, jpg), (3L, "garbage".getBytes))
      .toDF("id", "img")
    val out = Multimodal.imageColumns(df, "img").orderBy("id").collect()
    assert(out(0).getAs[Int]("img_width") === 20)
    assert(out(1).getAs[Int]("img_width") === 20)
    assert(out(1).getAs[Int]("img_channels") === 3)
    // lossy but close: luma means of the same image via PNG vs JPEG agree
    assert(math.abs(out(0).getAs[Double]("mean_luma") -
      out(1).getAs[Double]("mean_luma")) < 2.0)
    assert(out(2).getAs[Any]("img_width") === null)
    // perceptual hash survives the codec change (near-dup machinery)
    val d = java.lang.Long.bitCount(
      out(0).getAs[Long]("img_dhash") ^ out(1).getAs[Long]("img_dhash"))
    assert(d <= 6, s"dHash hamming distance $d across codecs")
  }
}
