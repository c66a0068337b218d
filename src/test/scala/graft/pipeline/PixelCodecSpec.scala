package graft.pipeline

import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PixelCodecSpec extends SparkSpec {
  import spark.implicits._

  private def testImage(w: Int, h: Int, ch: Int, seed: Int = 1): PixelCodec.Image = {
    val r = new scala.util.Random(seed)
    PixelCodec.Image(w, h, ch, Array.fill(w * h * ch)(r.nextInt(256).toByte))
  }

  test("PNG round-trips random images across all channel layouts") {
    Seq(1, 2, 3, 4).foreach { ch =>
      val img = testImage(13, 7, ch, seed = ch)
      val dec = PixelCodec.decodePng(PixelCodec.encodePng(img))
      assert(dec.width === 13 && dec.height === 7 && dec.channels === ch)
      assert(dec.pixels.toSeq === img.pixels.toSeq, s"channels=$ch")
    }
  }

  /** Build a PNG whose rows use a CHOSEN filter type, filtering the
    * reference pixels by hand — exercises all five unfilter paths.
    */
  private def pngWithFilters(img: PixelCodec.Image, filters: Seq[Int]): Array[Byte] = {
    val stride = img.width * img.channels
    val ch = img.channels
    val raw = new Array[Byte](img.height * (stride + 1))
    (0 until img.height).foreach { r =>
      val ft = filters(r % filters.length)
      raw(r * (stride + 1)) = ft.toByte
      (0 until stride).foreach { x =>
        val cur = img.pixels(r * stride + x) & 0xff
        val left = if (x >= ch) img.pixels(r * stride + x - ch) & 0xff else 0
        val up = if (r > 0) img.pixels((r - 1) * stride + x) & 0xff else 0
        val ul = if (r > 0 && x >= ch) img.pixels((r - 1) * stride + x - ch) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        raw(r * (stride + 1) + 1 + x) = (f & 0xff).toByte
      }
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zb.write(tmp, 0, d.deflate(tmp))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val colorType = Map(1 -> 0, 2 -> 4, 3 -> 2, 4 -> 6)(ch)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array()); chunk("IDAT", zb.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  test("decode reverses every PNG filter type (sub/up/average/paeth)") {
    val img = testImage(11, 10, 3, seed = 9)
    Seq(Seq(1), Seq(2), Seq(3), Seq(4), Seq(0, 1, 2, 3, 4)).foreach { fs =>
      val dec = PixelCodec.decodePng(pngWithFilters(img, fs))
      assert(dec.pixels.toSeq === img.pixels.toSeq, s"filters $fs")
    }
  }

  test("16-bit and palette-without-PLTE PNGs reject loudly") {
    val img = testImage(4, 4, 3)
    val good = PixelCodec.encodePng(img)
    val deep = good.clone(); deep(8 + 8 + 8) = 16 // IHDR bit depth
    val e = intercept[IllegalArgumentException] { PixelCodec.decodePng(deep) }
    assert(e.getMessage.contains("bit depth"))
    // color type 3 declared but no PLTE chunk present
    val pal = good.clone(); pal(8 + 8 + 9) = 3
    val e2 = intercept[IllegalArgumentException] { PixelCodec.decodePng(pal) }
    assert(e2.getMessage.contains("PLTE"))
  }

  test("corrupt chunk lengths fail loudly instead of looping") {
    val good = PixelCodec.encodePng(testImage(4, 4, 3))
    val bad = good.clone()
    bad(8) = 0xff.toByte // IHDR length -> huge/negative
    val e = intercept[IllegalArgumentException] { PixelCodec.decodePng(bad) }
    assert(e.getMessage.contains("corrupt PNG chunk"))
    val wav = sineWav(8000, 100.0, 0.01)
    val badWav = wav.clone()
    badWav(16) = 0xff.toByte; badWav(17) = 0xff.toByte
    badWav(18) = 0xff.toByte; badWav(19) = 0x7f.toByte // fmt length past EOF
    val e2 = intercept[IllegalArgumentException] { PixelCodec.decodeWav(badWav) }
    assert(e2.getMessage.contains("corrupt WAV chunk"))
  }

  test("resize and dHash behave on real pixels") {
    val img = testImage(32, 24, 3, seed = 4)
    val small = PixelCodec.resizeNearest(img, 8, 6)
    assert(small.width === 8 && small.height === 6 && small.channels === 3)
    // identical content -> identical hash; small perturbation -> small distance
    val h1 = PixelCodec.dHash(img)
    assert(PixelCodec.dHash(PixelCodec.decodePng(PixelCodec.encodePng(img))) === h1)
    val tweaked = img.pixels.clone()
    (0 until 30).foreach(i => tweaked(i * 7) = (tweaked(i * 7) + 3).toByte)
    val d = java.lang.Long.bitCount(
      h1 ^ PixelCodec.dHash(PixelCodec.Image(32, 24, 3, tweaked)))
    assert(d <= 12, s"perturbation moved $d dHash bits")
  }

  private def sineWav(rate: Int, hz: Double, seconds: Double,
      amp: Double = 0.5, channels: Int = 1): Array[Byte] = {
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * channels * 2)
    (0 until n).foreach { i =>
      val v = (amp * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      (0 until channels).foreach { c =>
        data((i * channels + c) * 2) = (v & 0xff).toByte
        data((i * channels + c) * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes).putInt(data.length).put(data)
    out.array()
  }

  test("WAV decode recovers sine-wave signal features") {
    val wav = sineWav(8000, 440.0, 0.5)
    val a = PixelCodec.decodeWav(wav)
    assert(a.sampleRate === 8000 && a.nChannels === 1)
    val (dur, rms, zcr) = PixelCodec.audioFeatures(a)
    assert(math.abs(dur - 0.5) < 1e-9)
    // sine RMS = amp/sqrt(2); zero crossings = 2 per cycle
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms $rms")
    assert(math.abs(zcr - 2.0 * 440 / 8000) < 0.01, s"zcr $zcr")
    // stereo averages to the same mono signal
    val st = PixelCodec.decodeWav(sineWav(8000, 440.0, 0.5, channels = 2))
    assert(st.nChannels === 2)
    assert(math.abs(PixelCodec.audioFeatures(st)._2 - rms) < 1e-3)
  }

  /** Same sine, arbitrary sample format: 24-bit int or 32-bit float. */
  private def sineWavFmt(rate: Int, hz: Double, seconds: Double,
      bits: Int): Array[Byte] = {
    val n = (rate * seconds).toInt
    val bytesPer = if (bits == -32) 4 else bits / 8
    val data = java.nio.ByteBuffer.allocate(n * bytesPer)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      val v = 0.5 * math.sin(2 * math.Pi * hz * i / rate)
      bits match {
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
    out.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort)
      .putShort(1).putInt(rate)
      .putInt(rate * bytesPer).putShort(bytesPer.toShort).putShort(b.toShort)
    out.put("data".getBytes).putInt(data.capacity()).put(data.array())
    out.array()
  }

  test("24-bit and float-32 WAV decode to the same signal as 16-bit") {
    val a16 = PixelCodec.decodeWav(sineWav(8000, 440.0, 0.25))
    val a24 = PixelCodec.decodeWav(sineWavFmt(8000, 440.0, 0.25, bits = 24))
    val af = PixelCodec.decodeWav(sineWavFmt(8000, 440.0, 0.25, bits = -32))
    val (_, rms16, zcr16) = PixelCodec.audioFeatures(a16)
    for ((a, name) <- Seq(a24 -> "24-bit", af -> "float")) {
      val (dur, rms, zcr) = PixelCodec.audioFeatures(a)
      assert(math.abs(dur - 0.25) < 1e-9, name)
      assert(math.abs(rms - rms16) < 1e-3, s"$name rms $rms vs $rms16")
      assert(math.abs(zcr - zcr16) < 1e-3, s"$name zcr")
    }
    // 20-bit and non-float 32 stay rejected
    val bad = sineWavFmt(8000, 440.0, 0.05, bits = 24)
    bad(34) = 20 // declared bits
    intercept[IllegalArgumentException](PixelCodec.decodeWav(bad))
  }

  test("spectral features locate the dominant tone") {
    val a = PixelCodec.decodeWav(sineWav(8000, 440.0, 0.5))
    val (dom, centroid) = PixelCodec.spectralFeatures(a)
    val hzPerBin = 8000.0 / 4096
    assert(math.abs(dom - 440.0) <= 2 * hzPerBin, s"dominant $dom")
    assert(math.abs(centroid - 440.0) < 30.0, s"centroid $centroid")
    // a brighter signal moves the centroid up, dominant follows the peak
    val n = 4000
    val two = PixelCodec.Audio(8000, 1, Array.tabulate(n) { i =>
      0.2 * math.sin(2 * math.Pi * 440 * i / 8000.0) +
        0.6 * math.sin(2 * math.Pi * 2000 * i / 8000.0)
    })
    val (dom2, centroid2) = PixelCodec.spectralFeatures(two)
    assert(math.abs(dom2 - 2000.0) <= 2 * hzPerBin, s"dominant $dom2")
    assert(centroid2 > 1000.0 && centroid2 < 2000.0, s"centroid $centroid2")
  }

  test("BMP round-trip, padding rows, top-down variant, rejects") {
    val img = testImage(13, 7, 3, seed = 5) // width 13: 39-byte rows pad to 40
    val bmp = PixelCodec.encodeBmp(img)
    val dec = PixelCodec.decodeBmp(bmp)
    assert(dec.width === 13 && dec.height === 7 && dec.channels === 3)
    assert(dec.pixels.toSeq === img.pixels.toSeq)
    // gray input expands to identical RGB channels
    val gray = testImage(8, 6, 1, seed = 9)
    val decG = PixelCodec.decodeBmp(PixelCodec.encodeBmp(gray))
    (0 until 48).foreach { i =>
      assert(decG.pixels(i * 3) === gray.pixels(i))
      assert(decG.pixels(i * 3 + 1) === gray.pixels(i))
    }
    // top-down: negate the height field; rows then read in file order
    val td = bmp.clone()
    val hNeg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-7).array()
    System.arraycopy(hNeg, 0, td, 22, 4)
    val decTd = PixelCodec.decodeBmp(td)
    (0 until 7).foreach { y =>
      val want = img.pixels.slice((6 - y) * 13 * 3, (7 - y) * 13 * 3)
      assert(decTd.pixels.slice(y * 13 * 3, (y + 1) * 13 * 3).toSeq ===
        want.toSeq, s"row $y")
    }
    // dispatcher routes by 'BM' signature
    assert(PixelCodec.decodeImage(bmp).pixels.toSeq === img.pixels.toSeq)
    // 8-bit and RLE reject loudly
    val bad8 = bmp.clone(); bad8(28) = 8
    intercept[IllegalArgumentException](PixelCodec.decodeBmp(bad8))
    val badRle = bmp.clone(); badRle(30) = 1
    intercept[IllegalArgumentException](PixelCodec.decodeBmp(badRle))
    // truncated pixel data caught before reading past the buffer
    intercept[IllegalArgumentException](
      PixelCodec.decodeBmp(bmp.take(bmp.length - 30)))
  }

  test("bilinear resize: identity is exact, ramps stay linear") {
    val img = testImage(16, 12, 3, seed = 3)
    val same = PixelCodec.resizeBilinear(img, 16, 12)
    assert(same.pixels.toSeq === img.pixels.toSeq)
    // a horizontal ramp upsampled 2x keeps exact linear interior values
    val ramp = PixelCodec.Image(9, 4, 1,
      Array.tabulate(36)(i => ((i % 9) * 20).toByte))
    val up = PixelCodec.resizeBilinear(ramp, 17, 4)
    (0 until 17).foreach { x =>
      assert((up.pixels(x) & 0xff) === x * 10, s"x=$x")
    }
    val down = PixelCodec.resizeBilinear(img, 8, 6)
    assert(down.width === 8 && down.height === 6 && down.channels === 3)
  }

  test("palette PNG round-trips losslessly at every bit depth") {
    for ((colors, depth) <- Seq((2, 1), (4, 2), (13, 4), (200, 8))) {
      val w = 19; val h = 7 // odd width: sub-byte rows have partial bytes
      val pal = Array.tabulate(colors)(i => (i * 37 % 256, i * 91 % 256, i * 53 % 256))
      val img = PixelCodec.Image(w, h, 3, Array.tabulate(w * h * 3) { j =>
        val (r, g, b) = pal((j / 3) % colors)
        (j % 3 match { case 0 => r; case 1 => g; case 2 => b }).toByte
      })
      val png = PixelCodec.encodePngPalette(img, depth)
      val dec = PixelCodec.decodePng(png)
      assert(dec.channels === 3, s"depth $depth")
      assert(dec.pixels.toSeq === img.pixels.toSeq, s"depth $depth")
      // dispatcher path too
      assert(PixelCodec.decodeImage(png).pixels.toSeq === img.pixels.toSeq)
    }
    intercept[IllegalArgumentException](
      PixelCodec.encodePngPalette(testImage(16, 16, 3, seed = 1), 2))
  }

  test("tRNS palette transparency yields RGBA output") {
    val img = PixelCodec.Image(4, 2, 3, Array.tabulate(24) { j =>
      (if ((j / 3) % 2 == 0) 10 else 200).toByte
    })
    val png = PixelCodec.encodePngPalette(img, 8)
    // splice a tRNS chunk right after PLTE: alpha 0 for entry 0, 255 next
    val plteStart = png.indexOfSlice("PLTE".getBytes)
    val plteLen = java.nio.ByteBuffer.wrap(png, plteStart - 4, 4).getInt
    val after = plteStart + 4 + plteLen + 4
    val trns = java.nio.ByteBuffer.allocate(14)
      .putInt(2).put("tRNS".getBytes).put(0.toByte).put(255.toByte)
      .putInt(0) // fake CRC (not validated)
      .array()
    val spliced = png.take(after) ++ trns ++ png.drop(after)
    val dec = PixelCodec.decodePng(spliced)
    assert(dec.channels === 4)
    val alphas = (0 until 8).map(p => dec.pixels(p * 4 + 3) & 0xff)
    assert(alphas.distinct.sorted === Seq(0, 255))
  }

  test("Adam7 interlaced PNG decodes to the sequential image") {
    val img = testImage(21, 13, 3, seed = 6) // odd dims: ragged passes
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val raw = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- passes) {
      val xs = x0 until img.width by dx
      val ys = y0 until img.height by dy
      if (xs.nonEmpty && ys.nonEmpty) ys.foreach { y =>
        raw.write(0) // filter 0
        xs.foreach { x =>
          (0 until 3).foreach(c =>
            raw.write(img.pixels((y * img.width + x) * 3 + c) & 0xff))
        }
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(typ.getBytes).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes); crc.update(data)
      b.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(21).putInt(13)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
      .put(1.toByte).array() // interlace = Adam7
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++
      chunk("IEND", Array.empty)
    val dec = PixelCodec.decodePng(png)
    assert(dec.width === 21 && dec.height === 13)
    assert(dec.pixels.toSeq === img.pixels.toSeq)
  }

  test("mu-law and A-law WAV decode to the companded sine") {
    // reference G.711 compressors (segment search over the expanded codec)
    def muCompress(s: Int): Byte = {
      val BIAS = 0x84
      val sign = if (s < 0) 0x80 else 0
      var mag = math.min(math.abs(s) + BIAS, 0x7fff)
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
      val mant = (mag >> (exp + 3)) & 0x0f
      (~(sign | (exp << 4) | mant)).toByte
    }
    def aCompress(s0: Int): Byte = {
      val sign = if (s0 >= 0) 0x80 else 0
      var mag = math.min(math.abs(s0), 0x7fff)
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
      val mant = if (exp == 0) (mag >> 4) & 0x0f else (mag >> (exp + 3)) & 0x0f
      ((sign | (exp << 4) | mant) ^ 0x55).toByte
    }
    for ((fmt, comp) <- Seq(7 -> muCompress _, 6 -> aCompress _)) {
      val n = 800
      val ref = Array.tabulate(n)(i =>
        (0.5 * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toInt)
      val data = ref.map(comp)
      val out = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      out.put("data".getBytes).putInt(n).put(data)
      val a = PixelCodec.decodeWav(out.array())
      assert(a.sampleRate === 8000 && a.samples.length === n, s"fmt $fmt")
      // companding error is bounded: relative RMS error under a few %
      var err = 0.0; var sig = 0.0
      (0 until n).foreach { i =>
        val want = ref(i) / 32768.0
        err += (a.samples(i) - want) * (a.samples(i) - want)
        sig += want * want
      }
      assert(math.sqrt(err / sig) < 0.05, s"fmt $fmt rel err")
      // the tone survives companding: dominant frequency unchanged
      val (dom, _) = PixelCodec.spectralFeatures(a)
      assert(math.abs(dom - 440.0) < 16.0, s"fmt $fmt dominant $dom")
    }
  }

  test("content-hash near-dup finds a re-encoded image via dHashAuto") {
    // same pixels encoded twice (filter-0 encoder vs hand-filtered
    // stream): byte-level hashing sees different files, content hashing
    // sees the same image
    val img = testImage(24, 16, 3, seed = 11)
    val enc1 = PixelCodec.encodePng(img)
    val enc2 = pngWithFilters(img, Seq(1, 2))
    assert(!java.util.Arrays.equals(enc1, enc2))
    val df = Seq((1L, enc1), (2L, enc2),
      (3L, PixelCodec.encodePng(testImage(24, 16, 3, seed = 99))))
      .toDF("id", "bin")
    val pairs = Multimodal.imageNearDuplicates(df, "bin", "id",
      maxDistance = 4, hasher = Multimodal.dHashAuto)
      .select("id_a", "id_b", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)) === Some(0), s"pairs=$pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("pHash: stable under rescale + recompression, separates content") {
    // smooth low-frequency content (the photo-like case pHash exists for)
    def smooth(w: Int, h: Int, fx: Double, fy: Double) = PixelCodec.Image(
      w, h, 1,
      Array.tabulate(w * h) { p =>
        val x = (p % w).toDouble / w; val y = (p / w).toDouble / h
        ((math.sin(fx * math.Pi * x) * math.cos(fy * math.Pi * y) * 0.5
          + 0.5) * 255).toInt.toByte
      })
    val base = smooth(64, 48, 2.0, 1.0)
    val scaled = PixelCodec.resizeBilinear(base, 128, 96)
    val recompressed = Jpeg.decode(Jpeg.encode(
      PixelCodec.Image(base.width, base.height, 1, base.pixels), quality = 80))
    // genuinely different content: different spatial frequencies (a
    // pure phase shift keeps the magnitude spectrum, hence ~the hash)
    val other = smooth(64, 48, 7.0, 5.0)
    val hBase = PixelCodec.pHash(base)
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(hBase, PixelCodec.pHash(scaled)) <= 6,
      s"rescale dist ${dist(hBase, PixelCodec.pHash(scaled))}")
    assert(dist(hBase, PixelCodec.pHash(recompressed)) <= 6,
      s"recompress dist ${dist(hBase, PixelCodec.pHash(recompressed))}")
    assert(dist(hBase, PixelCodec.pHash(other)) > 16,
      s"content dist ${dist(hBase, PixelCodec.pHash(other))}")
    // end-to-end: a 2x-RESCALED png copy pairs via pHashAuto
    val df = Seq(
      (1L, PixelCodec.encodePng(base)),
      (2L, PixelCodec.encodePng(scaled)),
      (3L, PixelCodec.encodePng(other)),
    ).toDF("id", "bin")
    val pairs = Multimodal.imageNearDuplicates(df, "bin", "id",
      maxDistance = 6, hasher = Multimodal.pHashAuto)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)), s"pairs=${pairs.toSeq}")
  }

  test("melSpectrum: energy lands in the right band, codec-independent") {
    val low = PixelCodec.decodeWav(sineWav(8000, 200.0, 0.25))
    val high = PixelCodec.decodeWav(sineWav(8000, 3000.0, 0.25))
    val nMels = 26
    val mLow = PixelCodec.melSpectrum(low, nMels)
    val mHigh = PixelCodec.melSpectrum(high, nMels)
    assert(mLow.length === nMels && mHigh.length === nMels)
    // a pure tone concentrates energy: the argmax band differs between
    // a 200 Hz and a 3 kHz tone, low's peak band below high's
    val (pLow, pHigh) = (mLow.indexOf(mLow.max), mHigh.indexOf(mHigh.max))
    assert(pLow < pHigh, s"peaks $pLow vs $pHigh")
    // 24-bit re-encode of the same material: near-identical vector
    val low24 = PixelCodec.decodeWav(sineWavFmt(8000, 200.0, 0.25, 24))
    val m24 = PixelCodec.melSpectrum(low24, nMels)
    val cos = {
      val dot = mLow.zip(m24).map { case (a, b) => a * b }.sum
      dot / math.sqrt(mLow.map(x => x * x).sum * m24.map(x => x * x).sum)
    }
    assert(cos > 0.9999, s"cross-codec cosine $cos")
    // degenerate inputs: zero vector, never a throw
    assert(PixelCodec.melSpectrum(
      PixelCodec.Audio(8000, 1, Array.emptyDoubleArray), nMels).toSeq ===
      Seq.fill(nMels)(0.0))
  }

  test("audioEmbedding feeds the embedding near-dup machinery") {
    val df = Seq(
      (1L, sineWav(8000, 200.0, 0.25)),
      (2L, sineWavFmt(8000, 200.0, 0.25, 24)), // same tone, other codec
      (3L, sineWav(8000, 3000.0, 0.25)),
      (4L, "junk".getBytes),
    ).toDF("id", "audio")
    val emb = Multimodal.audioEmbedding(df, "audio")
    val rows = emb.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) null else r.getSeq[Float](2))).toMap
    assert(rows(1L) != null)
    assert(rows(4L) == null)
    val pairs = Dedup.embeddingNearDuplicates(
      emb.filter(col("mel").isNotNull), "mel", "id",
      org.apache.spark.sql.functions.lit(0), threshold = 0.001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)), s"pairs=${pairs.toSeq}")
  }

  test("imageColumns / audioColumns decode real assets, null undecodables") {
    val png = PixelCodec.encodePng(testImage(16, 8, 3, seed = 2))
    val wav = sineWav(8000, 200.0, 0.1)
    val junk = Array.tabulate[Byte](50)(_.toByte)
    val df = Seq((1L, png), (2L, wav), (3L, junk)).toDF("id", "bin")
    val img = Multimodal.imageColumns(df, "bin")
      .select("id", "img_width", "img_height", "mean_luma").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(img(1L).getInt(1) === 16 && img(1L).getInt(2) === 8)
    assert(!img(1L).isNullAt(3))
    assert(img(2L).isNullAt(1) && img(3L).isNullAt(1))
    val aud = Multimodal.audioColumns(df, "bin")
      .select("id", "sample_rate", "duration_s", "rms", "dominant_hz")
      .collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(aud(2L).getInt(1) === 8000)
    assert(math.abs(aud(2L).getDouble(2) - 0.1) < 1e-9)
    // 0.1 s @ 8 kHz = 800 samples → 1024-point FFT, ~7.8 Hz bins
    assert(math.abs(aud(2L).getDouble(4) - 200.0) < 16.0)
    assert(aud(1L).isNullAt(1) && aud(3L).isNullAt(1))
  }
}
