package graft.pipeline

import java.io.ByteArrayOutputStream

import PixelCodec.Image

/** Dependency-free GIF (87a/89a) codec — the fourth web-corpus image
  * container next to PNG/JPEG/BMP. Decode covers global and local
  * color tables, LZW with variable code widths, interlaced rows,
  * multiple frames (animation) with graphic-control disposal/
  * transparency metadata; encode writes a single-frame GIF89a from an
  * RGB image of ≤ 256 distinct colors (the test/round-trip path — GIF
  * is palette-bound, so lossless encode is only defined there).
  *
  * Every declared size is validated against the physical buffer before
  * allocation (the hostile-header rule shared with [[Avi]] and the
  * GVID walker).
  */
object Gif {

  final case class Frame(
      x: Int, y: Int, width: Int, height: Int,
      delayCs: Int, // hundredths of a second, from GCE (0 if none)
      pixels: Array[Byte], // interleaved RGB, transparency resolved
  )

  final case class Animation(width: Int, height: Int, frames: Seq[Frame]) {
    /** First frame composed onto the logical screen as RGB. */
    def firstImage: Image = {
      val f = frames.head
      if (f.x == 0 && f.y == 0 && f.width == width && f.height == height)
        Image(width, height, 3, f.pixels)
      else {
        val out = new Array[Byte](width * height * 3)
        var yy = 0
        while (yy < f.height) {
          var xx = 0
          while (xx < f.width) {
            val o = ((f.y + yy) * width + (f.x + xx)) * 3
            val s = (yy * f.width + xx) * 3
            out(o) = f.pixels(s); out(o + 1) = f.pixels(s + 1)
            out(o + 2) = f.pixels(s + 2)
            xx += 1
          }
          yy += 1
        }
        Image(width, height, 3, out)
      }
    }
  }

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Decode all frames. */
  def decode(bytes: Array[Byte]): Animation = {
    require(isGif(bytes), "not a GIF")
    def u16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val width = u16(6)
    val height = u16(8)
    require(width > 0 && height > 0, s"bad GIF geometry $width x $height")
    PixelCodec.checkDecodedDims(width, height, "GIF screen")
    val packed = bytes(10) & 0xff
    var pos = 13
    val globalTable: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        require(pos + 3 * n <= bytes.length, "global color table past EOF")
        val t = readColorTable(bytes, pos, n)
        pos += 3 * n
        t
      } else null

    val frames = scala.collection.mutable.ArrayBuffer[Frame]()
    var delayCs = 0
    var transparentIdx = -1
    var done = false
    while (!done) {
      require(pos < bytes.length, "truncated GIF before trailer")
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension
          require(pos + 2 <= bytes.length, "truncated extension")
          val label = bytes(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9) { // graphic control
            require(pos + 5 <= bytes.length && (bytes(pos) & 0xff) == 4,
              "bad or truncated GCE block")
            val flags = bytes(pos + 1) & 0xff
            delayCs = u16(pos + 2)
            transparentIdx = if ((flags & 1) != 0) bytes(pos + 4) & 0xff else -1
            pos += 5
          }
          pos = skipSubBlocks(bytes, pos)
        case 0x2c => // image descriptor
          require(pos + 10 <= bytes.length, "truncated image descriptor")
          val fx = u16(pos + 1); val fy = u16(pos + 3)
          val fw = u16(pos + 5); val fh = u16(pos + 7)
          val fFlags = bytes(pos + 9) & 0xff
          pos += 10
          require(fw > 0 && fh > 0 && fx + fw <= width && fy + fh <= height,
            s"frame $fx,$fy ${fw}x$fh outside ${width}x$height screen")
          val table =
            if ((fFlags & 0x80) != 0) {
              val n = 2 << (fFlags & 7)
              require(pos + 3 * n <= bytes.length, "local color table past EOF")
              val t = readColorTable(bytes, pos, n)
              pos += 3 * n
              t
            } else {
              require(globalTable != null, "frame without any color table")
              globalTable
            }
          val interlaced = (fFlags & 0x40) != 0
          require(pos < bytes.length, "truncated before LZW data")
          val minCodeSize = bytes(pos) & 0xff
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad LZW min code size $minCodeSize")
          pos += 1
          val (indices, next) = lzwDecode(bytes, pos, minCodeSize, fw * fh)
          pos = next
          val rows =
            if (!interlaced) indices
            else deinterlace(indices, fw, fh)
          val px = new Array[Byte](fw * fh * 3)
          var i = 0
          while (i < fw * fh) {
            val idx = rows(i) & 0xff
            require(idx < table.length, s"palette index $idx out of range")
            if (idx != transparentIdx) {
              val c = table(idx)
              px(i * 3) = ((c >> 16) & 0xff).toByte
              px(i * 3 + 1) = ((c >> 8) & 0xff).toByte
              px(i * 3 + 2) = (c & 0xff).toByte
            } // transparent pixels stay black (composition is caller's)
            i += 1
          }
          frames += Frame(fx, fy, fw, fh, delayCs, px)
          delayCs = 0
          transparentIdx = -1
        case other =>
          throw new IllegalArgumentException(
            s"unexpected GIF block 0x${other.toHexString} at $pos")
      }
    }
    require(frames.nonEmpty, "GIF has no image data")
    Animation(width, height, frames.toSeq)
  }

  private def readColorTable(bytes: Array[Byte], pos: Int, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((bytes(pos + i * 3) & 0xff) << 16) |
        ((bytes(pos + i * 3 + 1) & 0xff) << 8) |
        (bytes(pos + i * 3 + 2) & 0xff)
    }

  private def skipSubBlocks(bytes: Array[Byte], start: Int): Int = {
    var pos = start
    while ({
      require(pos < bytes.length, "truncated sub-blocks")
      val n = bytes(pos) & 0xff
      pos += 1 + n
      n != 0
    }) ()
    pos
  }

  /** GIF-flavor LZW: codes packed LSB-first across 255-byte sub-blocks,
    * width grows 'minCodeSize+1'..12, clear resets the dictionary.
    * Returns exactly `expected` indices plus the position after the
    * data's terminating 0-length sub-block.
    */
  private def lzwDecode(bytes: Array[Byte], start: Int, minCodeSize: Int,
      expected: Int): (Array[Byte], Int) = {
    val clearCode = 1 << minCodeSize
    val eoiCode = clearCode + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary: prefix link + appended byte per code
    val maxCodes = 4096
    val prefix = new Array[Int](maxCodes)
    val append = new Array[Byte](maxCodes)
    var nextCode = eoiCode + 1
    var codeSize = minCodeSize + 1
    var prev = -1

    var pos = start
    var blockLeft = 0
    var acc = 0
    var accBits = 0
    var finished = false

    def readCode(): Int = {
      while (accBits < codeSize) {
        if (blockLeft == 0) {
          require(pos < bytes.length, "truncated LZW stream")
          blockLeft = bytes(pos) & 0xff
          pos += 1
          require(blockLeft > 0, "LZW data ended before EOI")
          require(pos + blockLeft <= bytes.length, "LZW sub-block past EOF")
        }
        acc |= (bytes(pos) & 0xff) << accBits
        accBits += 8
        pos += 1
        blockLeft -= 1
      }
      val code = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize
      accBits -= codeSize
      code
    }

    // expansion stack: one phrase (≤ 4096) plus the KwKwK extra byte
    val stack = new Array[Byte](maxCodes + 4)
    // reversed expansion of `c` pushed above sp0; returns the new sp
    def pushExpansion(code0: Int, sp0: Int): Int = {
      var sp = sp0
      var c = code0
      while (c > eoiCode) {
        require(sp < stack.length, "LZW expansion too long")
        stack(sp) = append(c); sp += 1; c = prefix(c)
      }
      require(c < clearCode, s"bad LZW root code $c")
      stack(sp) = c.toByte
      sp + 1
    }
    def firstByte(code0: Int): Byte = {
      var c = code0
      while (c > eoiCode) c = prefix(c)
      c.toByte
    }

    while (!finished) {
      val code = readCode()
      if (code == clearCode) {
        nextCode = eoiCode + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code == eoiCode) {
        finished = true
      } else {
        require(code < nextCode || (code == nextCode && prev >= 0),
          s"LZW code $code out of range (next $nextCode)")
        var sp = 0
        if (code == nextCode) {
          // KwKwK: expansion(prev) ++ first(prev) — the trailing byte
          // sits at the stack BOTTOM (emitted last)
          stack(0) = firstByte(prev)
          sp = pushExpansion(prev, 1)
        } else sp = pushExpansion(code, 0)
        val firstOfCur = stack(sp - 1) // top of stack = first emitted
        // dictionary entry pairs the previous code with this phrase's
        // first byte; width grows with the stb/giflib schedule (decoder
        // lags the encoder by exactly one assignment)
        if (prev >= 0 && nextCode < maxCodes) {
          prefix(nextCode) = prev
          append(nextCode) = firstOfCur
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        require(outLen + sp <= expected, "LZW produced too many pixels")
        while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
        if (outLen == expected) finished = true
      }
    }
    require(outLen == expected,
      s"LZW stream ended after $outLen of $expected pixels")
    // skip to the end of the sub-block chain (data terminator)
    var p = pos
    if (blockLeft > 0) p += blockLeft
    p = skipSubBlocks(bytes, p)
    (out, p)
  }

  private def deinterlace(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](src.length)
    var srcRow = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(src, srcRow * w, out, y * w, w)
        srcRow += 1
        y += step
      }
    }
    out
  }

  /** Encode one RGB/gray frame as GIF89a. Requires ≤ 256 distinct
    * colors (GIF is palette-bound; lossless encode is defined exactly
    * there — quantization is out of scope).
    */
  def encode(img: Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"GIF encode needs 1 or 3 channels, got ${img.channels}")
    val n = img.width * img.height
    val rgb = new Array[Int](n)
    var i = 0
    while (i < n) {
      rgb(i) =
        if (img.channels == 1) {
          val v = img.pixels(i) & 0xff
          (v << 16) | (v << 8) | v
        } else
          ((img.pixels(i * 3) & 0xff) << 16) |
            ((img.pixels(i * 3 + 1) & 0xff) << 8) |
            (img.pixels(i * 3 + 2) & 0xff)
      i += 1
    }
    val palette = rgb.distinct
    require(palette.length <= 256,
      s"${palette.length} distinct colors — GIF needs <= 256")
    val palIdx = palette.zipWithIndex.toMap
    val indices = rgb.map(c => palIdx(c).toByte)
    // palette size rounds up to a power of two >= 2
    var palBits = 1
    while ((1 << palBits) < palette.length) palBits += 1
    val palSize = 1 << palBits

    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(img.width); u16(img.height)
    out.write(0x80 | (palBits - 1)) // global table present
    out.write(0); out.write(0)
    (0 until palSize).foreach { p =>
      val c = if (p < palette.length) palette(p) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(img.width); u16(img.height)
    out.write(0) // no local table, not interlaced
    val minCodeSize = math.max(2, palBits)
    out.write(minCodeSize)
    lzwEncode(out, indices, minCodeSize)
    out.write(0) // data terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF LZW encoder: emits a clear code, literal/phrase codes with
    * growing width, clears at dictionary overflow, EOI at the end —
    * packed LSB-first into 255-byte sub-blocks.
    */
  private def lzwEncode(out: ByteArrayOutputStream, indices: Array[Byte],
      minCodeSize: Int): Unit = {
    val clearCode = 1 << minCodeSize
    val eoiCode = clearCode + 1
    var codeSize = minCodeSize + 1
    var nextCode = eoiCode + 1
    val dict = new java.util.HashMap[Long, Integer]()
    val block = new Array[Byte](255)
    var blockLen = 0
    var acc = 0L
    var accBits = 0
    def flushByte(): Unit = {
      block(blockLen) = (acc & 0xff).toByte
      blockLen += 1
      acc >>>= 8
      accBits -= 8
      if (blockLen == 255) {
        out.write(255); out.write(block, 0, 255); blockLen = 0
      }
    }
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) flushByte()
    }
    def key(prefix: Int, b: Int): Long = (prefix.toLong << 8) | b

    emit(clearCode)
    var prev: Int = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      val k = key(prev, b)
      val hit = dict.get(k)
      if (hit != null) prev = hit
      else {
        emit(prev)
        if (nextCode < 4096) {
          dict.put(k, nextCode)
          // width grows when nextCode EXCEEDS the current range
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          nextCode += 1
        } else {
          emit(clearCode)
          dict.clear()
          nextCode = eoiCode + 1
          codeSize = minCodeSize + 1
        }
        prev = b
      }
      i += 1
    }
    emit(prev)
    emit(eoiCode)
    while (accBits > 0) flushByte()
    if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
  }
}
