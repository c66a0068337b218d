package graft.pipeline

import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free 8-bit PNG codec and WAV-PCM decode — the REAL decode
  * step behind [[Multimodal]]'s image/audio feature extraction: PNG is
  * zlib (`java.util.zip`) + five per-row unfilters, WAV is raw
  * little-endian PCM, and JPEG (baseline + progressive) lives in
  * [[Jpeg]] (huffman + DCT, also dependency-free) behind
  * [[decodeImage]].
  *
  * Supported PNG subset: bit depth 8, non-interlaced, color types
  * 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA). Palette and 16-bit
  * reject loudly.
  */
object PixelCodec {

  /** Row-major 8-bit interleaved pixels. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width×$height×$channels")
  }

  /** Mono float samples in [-1, 1] plus the sample rate. */
  final case class Audio(sampleRate: Int, nChannels: Int, samples: Array[Double])

  /** Decoded-image plausibility cap (2²⁷ pixels ≈ an 11600² image):
    * compressed formats declare their dimensions in a header, so a
    * hostile few-hundred-byte file can demand a multi-GB pixel buffer
    * before one compressed byte is read — under heap pressure that OOMs
    * the executor (the codec fuzz caught exactly this in-suite). Lying
    * headers must fail NAMED and cheap, before allocation.
    */
  val MaxDecodedPixels: Long = 1L << 27

  /** Shared guard: named error when `w × h` (per frame) is implausible. */
  private[pipeline] def checkDecodedDims(w: Int, h: Int, what: String): Unit =
    require(w.toLong * h <= MaxDecodedPixels,
      s"$what declares $w x $h = ${w.toLong * h} pixels — past the " +
        s"$MaxDecodedPixels plausibility cap (lying header?)")

  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  // ---- PNG decode ----

  // Adam7 pass layout: (x0, y0, dx, dy)
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  def decodePng(bytes: Array[Byte]): Image = {
    require(bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G', "not a PNG")
    var i = 8
    var width = 0; var height = 0
    var bitDepth = 0; var colorType = -1; var interlaced = false
    var palette: Array[Int] = null // 0xRRGGBB
    var trns: Array[Int] = null // per palette entry alpha
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val len = u32be(bytes, i)
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val data = i + 8
      // a corrupt (negative / past-EOF) length must fail, not loop
      require(len >= 0 && data.toLong + len + 4 <= bytes.length,
        s"corrupt PNG chunk $typ: length $len at offset $i")
      typ match {
        case "IHDR" =>
          width = u32be(bytes, data)
          height = u32be(bytes, data + 4)
          bitDepth = bytes(data + 8) & 0xff
          colorType = bytes(data + 9) & 0xff
          interlaced = (bytes(data + 12) & 0xff) == 1
          if (colorType == 3)
            require(Seq(1, 2, 4, 8).contains(bitDepth),
              s"bad palette PNG bit depth $bitDepth")
          else require(bitDepth == 8,
            s"unsupported PNG bit depth $bitDepth (16-bit out of scope)")
          require(Seq(0, 2, 3, 4, 6).contains(colorType),
            s"bad PNG color type $colorType")
        case "PLTE" =>
          require(len % 3 == 0 && len <= 256 * 3, s"bad PLTE length $len")
          palette = Array.tabulate(len / 3)(p =>
            ((bytes(data + p * 3) & 0xff) << 16) |
              ((bytes(data + p * 3 + 1) & 0xff) << 8) |
              (bytes(data + p * 3 + 2) & 0xff))
        case "tRNS" if colorType == 3 =>
          trns = Array.tabulate(len)(p => bytes(data + p) & 0xff)
        case "IDAT" => idat.write(bytes, data, len)
        case "IEND" => done = true
        case _      => // ancillary chunk — skip
      }
      i = data + len + 4 // skip CRC
    }
    require(width > 0 && height > 0 && colorType >= 0, "missing IHDR")
    checkDecodedDims(width, height, "PNG IHDR")
    val isPal = colorType == 3
    if (isPal) require(palette != null, "palette PNG without PLTE")
    // channels as stored in the stream (palette = 1 index channel)
    val chStream = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    def rowBytes(w: Int) = (w * chStream * bitDepth + 7) / 8
    // per-pixel SAMPLES of the full image, one byte per stream channel
    val samples = new Array[Byte](width.toLong.toInt * height * chStream)
    val passes =
      if (!interlaced) Array((0, 0, 1, 1))
      else Adam7
    val expected = passes.map { case (x0, y0, dx, dy) =>
      val wP = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val hP = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (wP == 0 || hP == 0) 0 else hP * (1 + rowBytes(wP))
    }.sum
    val raw = inflateAll(idat.toByteArray, expected)
    var off = 0
    passes.foreach { case (x0, y0, dx, dy) =>
      val wP = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val hP = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (wP > 0 && hP > 0) {
        val stride = rowBytes(wP)
        val pass = java.util.Arrays.copyOfRange(raw, off, off + hP * (1 + stride))
        off += hP * (1 + stride)
        // filters operate on BYTES with bpp = ceil(bits·ch/8) (min 1)
        val bpp = math.max(1, chStream * bitDepth / 8)
        val flat = unfilter(pass, stride, hP, bpp)
        var r = 0
        while (r < hP) {
          var c = 0
          while (c < wP) {
            val y = y0 + r * dy
            val x = x0 + c * dx
            var s = 0
            while (s < chStream) {
              val v =
                if (bitDepth == 8) flat(r * stride + c * chStream + s) & 0xff
                else { // sub-byte palette/gray indices, MSB-first packed
                  val bitPos = c * bitDepth
                  val b = flat(r * stride + bitPos / 8) & 0xff
                  (b >> (8 - bitDepth - bitPos % 8)) & ((1 << bitDepth) - 1)
                }
              samples((y.toLong * width + x).toInt * chStream + s) = v.toByte
              s += 1
            }
            c += 1
          }
          r += 1
        }
      }
    }
    if (!isPal) Image(width, height, chStream, samples)
    else {
      val hasAlpha = trns != null
      val outCh = if (hasAlpha) 4 else 3
      val out = new Array[Byte](width * height * outCh)
      var p = 0
      while (p < width * height) {
        val idx = samples(p) & 0xff
        require(idx < palette.length, s"palette index $idx out of range")
        val c = palette(idx)
        out(p * outCh) = ((c >> 16) & 0xff).toByte
        out(p * outCh + 1) = ((c >> 8) & 0xff).toByte
        out(p * outCh + 2) = (c & 0xff).toByte
        if (hasAlpha)
          out(p * outCh + 3) =
            (if (idx < trns.length) trns(idx) else 255).toByte
        p += 1
      }
      Image(width, height, outCh, out)
    }
  }

  private def inflateAll(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val k = inf.inflate(out, off, expected - off)
      require(k > 0 || inf.finished(), "truncated or corrupt PNG stream")
      off += k
    }
    inf.end()
    require(off == expected, s"PNG stream yielded $off of $expected bytes")
    out
  }

  /** The five PNG row filters, reversed in place. `stride` is the
    * filtered row's byte width, `bpp` the filter's byte distance to the
    * left neighbor (1 for sub-byte depths).
    */
  private def unfilter(raw: Array[Byte], stride: Int, h: Int, bpp: Int): Array[Byte] = {
    val out = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val ft = raw(r * (stride + 1)) & 0xff
      val src = r * (stride + 1) + 1
      val dst = r * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - stride + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp) out(dst - stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case other => throw new IllegalArgumentException(s"bad PNG filter $other")
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      r += 1
    }
    out
  }

  // ---- PNG encode (filter 0, one IDAT) — for tests and cube/image sinks ----

  /** Deflate a filtered raw stream and assemble the chunk skeleton —
    * shared by the truecolor and palette encoders.
    */
  private def pngFromRaw(width: Int, height: Int, bitDepth: Int,
      colorType: Int, plte: Option[Array[Byte]],
      raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zbuf.write(tmp, 0, d.deflate(tmp))
    d.end()
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
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    plte.foreach(chunk("PLTE", _))
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  def encodePng(img: Image): Array[Byte] = {
    val colorType = img.channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case other => throw new IllegalArgumentException(s"$other channels")
    }
    val stride = img.width * img.channels
    val raw = new Array[Byte](img.height * (stride + 1))
    (0 until img.height).foreach { r =>
      System.arraycopy(img.pixels, r * stride, raw, r * (stride + 1) + 1, stride)
    }
    pngFromRaw(img.width, img.height, 8, colorType, None, raw)
  }

  /** Palette (color type 3) PNG — the small-image/web form: RGB input
    * of ≤ 2^bitDepth distinct colors becomes per-pixel indices packed
    * MSB-first at 1/2/4/8 bits. Filter 0, no interlace.
    */
  def encodePngPalette(img: Image, bitDepth: Int = 8): Array[Byte] = {
    require(img.channels == 3, "palette PNG encode needs RGB input")
    require(Seq(1, 2, 4, 8).contains(bitDepth), s"bad bit depth $bitDepth")
    val n = img.width * img.height
    val rgb = Array.tabulate(n)(p =>
      ((img.pixels(p * 3) & 0xff) << 16) |
        ((img.pixels(p * 3 + 1) & 0xff) << 8) | (img.pixels(p * 3 + 2) & 0xff))
    val palette = rgb.distinct
    require(palette.length <= (1 << bitDepth),
      s"${palette.length} distinct colors exceed $bitDepth-bit palette")
    val palIdx = palette.zipWithIndex.toMap
    val stride = (img.width * bitDepth + 7) / 8
    val raw = new Array[Byte](img.height * (stride + 1))
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val idx = palIdx(rgb(y * img.width + x))
        val bitPos = x * bitDepth
        val at = y * (stride + 1) + 1 + bitPos / 8
        raw(at) = (raw(at) | (idx << (8 - bitDepth - bitPos % 8))).toByte
        x += 1
      }
      y += 1
    }
    val plte = palette.flatMap(c => Array(
      ((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte, (c & 0xff).toByte))
    pngFromRaw(img.width, img.height, bitDepth, 3, Some(plte), raw)
  }

  /** Decode any supported image container by signature: PNG
    * ([[decodePng]]) or baseline JPEG ([[Jpeg.decode]]). Anything else
    * (or an unsupported subset, e.g. progressive JPEG) throws.
    */
  def decodeImage(bytes: Array[Byte]): Image =
    if (bytes.length > 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
    else if (bytes.length > 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8) Jpeg.decode(bytes)
    else if (bytes.length > 54 && bytes(0) == 'B' && bytes(1) == 'M')
      decodeBmp(bytes)
    else if (Gif.isGif(bytes)) Gif.decode(bytes).firstImage
    else throw new IllegalArgumentException("unsupported image container")

  // ---- pixel ops ----

  /** Nearest-neighbor resample (the thumbnail/feature-prep primitive). */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, y * img.height / h)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, x * img.width / w)
        var c = 0
        while (c < img.channels) {
          out((y * w + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, img.channels, out)
  }

  /** Rec.601 luma (alpha ignored); gray passthrough. */
  def grayscale(img: Image): Image = {
    if (img.channels == 1) return img
    val out = new Array[Byte](img.width * img.height)
    var p = 0
    while (p < out.length) {
      val base = p * img.channels
      val v = img.channels match {
        case 2 => img.pixels(base) & 0xff // gray+alpha
        case _ =>
          (0.299 * (img.pixels(base) & 0xff) +
            0.587 * (img.pixels(base + 1) & 0xff) +
            0.114 * (img.pixels(base + 2) & 0xff)).round.toInt
      }
      out(p) = (v & 0xff).toByte
      p += 1
    }
    Image(img.width, img.height, 1, out)
  }

  /** Difference hash over REAL pixels: grayscale → 9×8 nearest resample
    * → 64 horizontal-gradient bits. Same banding/verify machinery as
    * [[Multimodal.dHashStub]], but content-derived.
    */
  def dHash(img: Image): Long = {
    val g = resizeNearest(grayscale(img), 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((g.pixels(y * 9 + x) & 0xff) < (g.pixels(y * 9 + x + 1) & 0xff))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Perceptual DCT hash (the pHash recipe): grayscale → 32×32 bilinear
    * resample → 2-D DCT-II → 8×8 lowest-frequency block → one bit per
    * coefficient above the mean of the block EXCLUDING the DC term.
    * Survives rescaling and recompression that flip [[dHash]]'s
    * pixel-gradient bits (dHash's nearest-neighbor grid shifts under
    * resampling; the low-frequency spectrum barely moves). Same 64-bit
    * banding/verify machinery downstream.
    */
  def pHash(img: Image): Long = {
    val n = 32
    val g = resizeBilinear(grayscale(img), n, n)
    // separable DCT-II: rows then columns (n is tiny — O(n^3) is fine)
    val cos = Array.tabulate(n, n)((k, x) =>
      math.cos((2 * x + 1) * k * math.Pi / (2.0 * n)))
    val rowT = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var k = 0
      while (k < n) {
        var s = 0.0
        var x = 0
        while (x < n) { s += (g.pixels(y * n + x) & 0xff) * cos(k)(x); x += 1 }
        rowT(y)(k) = s
        k += 1
      }
      y += 1
    }
    val freq = Array.ofDim[Double](8, 8)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rowT(yy)(u) * cos(v)(yy); yy += 1 }
        freq(v)(u) = s
        u += 1
      }
      v += 1
    }
    var mean = 0.0
    var i = 0
    while (i < 64) { if (i != 0) mean += freq(i / 8)(i % 8); i += 1 }
    mean /= 63.0
    var bits = 0L
    i = 0
    while (i < 64) {
      if (freq(i / 8)(i % 8) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  // ---- WAV PCM ----

  /** Decode a RIFF/WAVE file with 16-bit or 8-bit PCM samples; channels
    * are averaged to mono in [-1, 1].
    */
  def decodeWav(bytes: Array[Byte]): Audio = {
    def u32le(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def u16le(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    require(bytes.length > 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(8) == 'W' && bytes(9) == 'A', "not a WAV")
    var i = 12
    var rate = 0; var ch = 0; var bits = 0
    var audio: Array[Double] = null
    while (audio == null && i + 8 <= bytes.length) {
      val typ = new String(bytes, i, 4, "US-ASCII")
      val len = u32le(i + 4)
      require(len >= 0 && i.toLong + 8 + len <= bytes.length,
        s"corrupt WAV chunk $typ: length $len at offset $i")
      if (typ == "fmt ") {
        val fmt = u16le(i + 8)
        require(fmt == 1 || fmt == 3 || fmt == 6 || fmt == 7,
          s"WAV format $fmt unsupported (PCM/float/A-law/mu-law only)")
        ch = u16le(i + 10); rate = u32le(i + 12); bits = u16le(i + 22)
        fmt match {
          case 1 =>
            require(bits == 16 || bits == 8 || bits == 24,
              s"$bits-bit integer PCM unsupported")
          case 3 =>
            require(bits == 32, s"$bits-bit float PCM unsupported")
            bits = -32 // marker: float samples
          case 6 =>
            require(bits == 8, s"$bits-bit A-law unsupported")
            bits = -6 // marker: A-law companded bytes
          case 7 =>
            require(bits == 8, s"$bits-bit mu-law unsupported")
            bits = -7 // marker: mu-law companded bytes
        }
      } else if (typ == "data") {
        require(rate > 0, "WAV data chunk before fmt")
        val bytesPer = bits match {
          case -32 => 4
          case -6 | -7 => 1 // companded: one byte per sample
          case b => b / 8
        }
        val n = len / (ch * bytesPer)
        val out = new Array[Double](n)
        var s = 0
        while (s < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val off = i + 8 + (s * ch + c) * bytesPer
            acc += (bits match {
              case 16 =>
                ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort / 32768.0
              case 8 => ((bytes(off) & 0xff) - 128) / 128.0
              case 24 => // sign-extend the 3-byte little-endian sample
                ((((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
                  ((bytes(off + 2) & 0xff) << 16)) << 8) >> 8) / 8388608.0
              case -32 => java.lang.Float.intBitsToFloat(u32le(off)).toDouble
              case -7 => muLawExpand(bytes(off)) / 32768.0
              case -6 => aLawExpand(bytes(off)) / 32768.0
            })
            c += 1
          }
          out(s) = acc / ch
          s += 1
        }
        audio = out
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(audio != null, "WAV has no data chunk")
    Audio(rate, ch, audio)
  }

  /** G.711 µ-law expansion to a 16-bit-range magnitude. */
  private def muLawExpand(b: Byte): Int = {
    val u = ~b & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law expansion to a 16-bit-range magnitude. */
  private def aLawExpand(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    val exp = (a >> 4) & 7
    val mant = a & 0x0f
    val mag = if (exp == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (exp - 1)
    // A-law: bit 7 SET (after the 0x55 toggle) means positive
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Signal features: duration, RMS level, zero-crossing rate (the
    * speech/music/silence discriminators corpus filters use).
    */
  def audioFeatures(a: Audio): (Double, Double, Double) = {
    val n = a.samples.length
    if (n == 0) return (0.0, 0.0, 0.0)
    var sq = 0.0
    var zc = 0
    var i = 0
    while (i < n) {
      sq += a.samples(i) * a.samples(i)
      if (i > 0 && (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) zc += 1
      i += 1
    }
    (n.toDouble / a.sampleRate, math.sqrt(sq / n),
      if (n > 1) zc.toDouble / (n - 1) else 0.0)
  }

  /** Iterative radix-2 FFT (in-place, Cooley–Tukey) over `re`/`im` of
    * power-of-two length — the dependency-free kernel behind
    * [[spectralFeatures]].
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, "FFT length must be 2^k")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(blk + k); val ai = im(blk + k)
          val br = re(blk + k + len / 2); val bi = im(blk + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(blk + k) = ar + tr; im(blk + k) = ai + ti
          re(blk + k + len / 2) = ar - tr; im(blk + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum of the first `maxN` samples (zero-padded to the
    * next power of two, Hann-windowed): bins 0 .. n/2, bin k =
    * `k · rate / n` Hz.
    */
  def magnitudeSpectrum(a: Audio, maxN: Int = 1 << 14): Array[Double] = {
    val take = math.min(a.samples.length, maxN)
    var n = 1
    while (n < take) n <<= 1
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < take) {
      val w = 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / math.max(1, take - 1))
      re(i) = a.samples(i) * w
      i += 1
    }
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => math.hypot(re(k), im(k)))
  }

  /** Log-mel filterbank energies (the audio-ML front-end descriptor —
    * the filterbank half of MFCC): triangular filters spaced uniformly
    * on the mel scale (`2595·log10(1 + f/700)`) between 0 Hz and
    * Nyquist, applied to the Hann-windowed magnitude spectrum, log
    * compressed (`ln(1 + e)`). `nMels` energies out; deterministic and
    * codec-independent, so re-encodings across bit depths/containers
    * produce identical vectors — feed to the embedding-similarity
    * family (cosine near-dup, IVF) like any other vector column.
    */
  def melSpectrum(a: Audio, nMels: Int = 26, maxN: Int = 1 << 14): Array[Double] = {
    if (a.samples.length == 0 || a.sampleRate <= 0)
      return new Array[Double](nMels)
    val mag = magnitudeSpectrum(a, maxN)
    val n = (mag.length - 1) * 2
    if (n == 0) return new Array[Double](nMels)
    val hzPerBin = a.sampleRate.toDouble / n
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def melInv(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val melMax = mel(a.sampleRate / 2.0)
    // nMels triangles need nMels + 2 edge points
    val edges = Array.tabulate(nMels + 2)(i => melInv(melMax * i / (nMels + 1)))
    val out = new Array[Double](nMels)
    var m = 0
    while (m < nMels) {
      val lo = edges(m); val mid = edges(m + 1); val hi = edges(m + 2)
      var e = 0.0
      var k = 1
      while (k < mag.length) {
        val f = k * hzPerBin
        val w =
          if (f > lo && f <= mid) (f - lo) / math.max(mid - lo, 1e-12)
          else if (f > mid && f < hi) (hi - f) / math.max(hi - mid, 1e-12)
          else 0.0
        if (w > 0) e += w * mag(k) * mag(k)
        k += 1
      }
      out(m) = math.log1p(e)
      m += 1
    }
    out
  }

  /** Spectral features of the leading window: `(dominant_hz,
    * centroid_hz)` — the pitch/brightness discriminators that separate
    * tones, speech and noise in audio-corpus filters. DC (bin 0) is
    * excluded from the dominant-peak search.
    */
  def spectralFeatures(a: Audio, maxN: Int = 1 << 14): (Double, Double) = {
    if (a.samples.length == 0 || a.sampleRate <= 0) return (0.0, 0.0)
    val mag = magnitudeSpectrum(a, maxN)
    val n = (mag.length - 1) * 2
    if (n == 0) return (0.0, 0.0) // 1-sample signal: no non-DC bin exists
    val hzPerBin = a.sampleRate.toDouble / n
    var best = 1
    var sum = 0.0
    var wsum = 0.0
    var k = 1
    while (k < mag.length) {
      if (mag(k) > mag(best)) best = k
      sum += mag(k)
      wsum += mag(k) * k * hzPerBin
      k += 1
    }
    (best * hzPerBin, if (sum > 0) wsum / sum else 0.0)
  }

  /** Coarse spectral fingerprint: the dominant FFT bin of each
    * fixed-length window, quantized to `binsPerOctave`-style coarse
    * bins and packed into one Long (up to 16 windows × 4 bits). Two
    * encodings of the same recording — different bit depth, container,
    * or int-vs-float PCM — fingerprint identically, while different
    * material diverges. The audio analog of [[dHash]]: cheap,
    * content-derived, and bandable by the existing near-dup machinery.
    */
  def audioFingerprint(a: Audio, windows: Int = 16): Long = {
    if (a.samples.length == 0 || a.sampleRate <= 0) return 0L
    val nW = math.min(windows, 16)
    val win = math.max(256, Integer.highestOneBit(
      math.max(256, a.samples.length / math.max(1, nW))))
    var fp = 0L
    var w = 0
    while (w < nW) {
      val start = w * a.samples.length / nW
      val take = math.min(win, a.samples.length - start)
      if (take > 16) {
        val slice = Audio(a.sampleRate, 1,
          java.util.Arrays.copyOfRange(a.samples, start, start + take))
        val (dom, _) = spectralFeatures(slice, maxN = win)
        // quarter-octave-ish coarse bin: log2(hz) scaled ×2, clamped 0-15
        val coarse =
          if (dom < 20) 0
          else math.min(15, math.max(0,
            ((math.log(dom / 20.0) / math.log(2.0)) * 2).toInt))
        fp |= coarse.toLong << (w * 4)
      }
      w += 1
    }
    fp
  }

  // ---- BMP (Windows bitmap): the third web-corpus image container ----

  /** Decode an uncompressed 24/32-bit BI_RGB BMP (bottom-up or
    * top-down) to interleaved RGB. Palette/RLE variants reject loudly.
    */
  def decodeBmp(bytes: Array[Byte]): Image = {
    def u16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    require(bytes.length > 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOff = u32(10)
    val hdrSize = u32(14)
    require(hdrSize >= 40, s"BMP header size $hdrSize unsupported")
    val width = u32(18)
    val rawH = u32(22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    val bpp = u16(28)
    val compression = u32(30)
    require(compression == 0, s"compressed BMP (method $compression) unsupported")
    require(bpp == 24 || bpp == 32, s"$bpp-bit BMP unsupported (24/32 only)")
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"implausible BMP geometry $width x $height")
    val bytesPer = bpp / 8
    val rowStride = (width * bytesPer + 3) & ~3 // rows pad to 4 bytes
    require(dataOff.toLong + rowStride.toLong * height <= bytes.length,
      "BMP pixel data past end of buffer")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val p = dataOff + srcRow * rowStride + x * bytesPer
        val o = (y * width + x) * 3
        out(o) = bytes(p + 2) // BGR(A) → RGB
        out(o + 1) = bytes(p + 1)
        out(o + 2) = bytes(p)
        x += 1
      }
      y += 1
    }
    Image(width, height, 3, out)
  }

  /** Encode interleaved RGB (or gray, expanded) as a 24-bit bottom-up
    * BMP — the test/round-trip counterpart of [[decodeBmp]].
    */
  def encodeBmp(img: Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"BMP encode needs 1 or 3 channels, got ${img.channels}")
    val rowStride = (img.width * 3 + 3) & ~3
    val dataLen = rowStride * img.height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) =
          if (img.channels == 1) {
            val v = img.pixels(y * img.width + x)
            (v, v, v)
          } else {
            val o = (y * img.width + x) * 3
            (img.pixels(o), img.pixels(o + 1), img.pixels(o + 2))
          }
        bb.put(b).put(g).put(r)
        x += 1
      }
      var pad = img.width * 3
      while ((pad & 3) != 0) { bb.put(0.toByte); pad += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Bilinear resize — the quality default for feature extraction
    * (nearest stays for the fast path / exact-pixel tests).
    */
  def resizeBilinear(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, "target dims must be positive")
    val out = new Array[Byte](w * h * img.channels)
    val sx = if (w > 1) (img.width - 1).toDouble / (w - 1) else 0.0
    val sy = if (h > 1) (img.height - 1).toDouble / (h - 1) else 0.0
    var y = 0
    while (y < h) {
      val fy = y * sy
      val y0 = fy.toInt
      val y1 = math.min(img.height - 1, y0 + 1)
      val wy = fy - y0
      var x = 0
      while (x < w) {
        val fx = x * sx
        val x0 = fx.toInt
        val x1 = math.min(img.width - 1, x0 + 1)
        val wx = fx - x0
        var c = 0
        while (c < img.channels) {
          def px(xx: Int, yy: Int): Double =
            (img.pixels((yy * img.width + xx) * img.channels + c) & 0xff).toDouble
          val v = px(x0, y0) * (1 - wx) * (1 - wy) + px(x1, y0) * wx * (1 - wy) +
            px(x0, y1) * (1 - wx) * wy + px(x1, y1) * wx * wy
          out((y * w + x) * img.channels + c) = math.round(v).toInt
            .max(0).min(255).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, img.channels, out)
  }
}
