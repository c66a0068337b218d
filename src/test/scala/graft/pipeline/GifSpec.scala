package graft.pipeline

import graft.SparkSpec

class GifSpec extends SparkSpec {

  /** Deterministic RGB content with ≤ `colors` distinct values. */
  private def palImage(w: Int, h: Int, colors: Int,
      seed: Int = 1): PixelCodec.Image = {
    val pal = Array.tabulate(colors)(i =>
      (i * 37 + seed, i * 91 + seed * 3, i * 53 + seed * 7))
    PixelCodec.Image(w, h, 3, Array.tabulate(w * h * 3) { j =>
      val p = j / 3
      val (r, g, b) = pal((p * 7 + p / w + seed) % colors)
      (j % 3 match { case 0 => r; case 1 => g; case 2 => b }) .toByte
    })
  }

  test("round-trip is lossless for palette-bound images") {
    for ((w, h, colors) <- Seq((16, 12, 7), (33, 9, 256), (1, 1, 1), (8, 8, 2))) {
      val img = palImage(w, h, colors)
      val gif = Gif.encode(img)
      assert(Gif.isGif(gif))
      val anim = Gif.decode(gif)
      assert(anim.width === w && anim.height === h && anim.frames.length === 1)
      assert(anim.firstImage.pixels.toSeq === img.pixels.toSeq,
        s"$w x $h with $colors colors")
    }
  }

  test("long streams exercise width growth and dictionary resets") {
    // 200x160 with 256 colors forces the LZW width to climb and the
    // 4096-entry dictionary to overflow (clear + rebuild mid-stream)
    val img = palImage(200, 160, 256, seed = 4)
    val dec = Gif.decode(Gif.encode(img))
    assert(dec.firstImage.pixels.toSeq === img.pixels.toSeq)
    // noise-ish content (worst case for phrase reuse)
    val rnd = new scala.util.Random(11)
    val noisy = PixelCodec.Image(64, 64, 1,
      Array.fill(64 * 64)((rnd.nextInt(200)).toByte))
    val decN = Gif.decode(Gif.encode(noisy))
    // gray expands to identical RGB channels
    (0 until 64 * 64).foreach { i =>
      assert(decN.firstImage.pixels(i * 3) === noisy.pixels(i))
    }
  }

  test("decodeImage and imageColumns accept GIFs; >256 colors reject on encode") {
    import spark.implicits._
    val img = palImage(20, 10, 12)
    val gif = Gif.encode(img)
    val viaDispatch = PixelCodec.decodeImage(gif)
    assert(viaDispatch.width === 20 && viaDispatch.channels === 3)
    val rows = Seq((1L, gif)).toDF("id", "img")
    val feats = Multimodal.imageColumns(rows, "img")
      .select("img_width", "img_height", "img_channels").head()
    assert((feats.getInt(0), feats.getInt(1), feats.getInt(2)) === ((20, 10, 3)))
    // 1024 genuinely distinct colors (pixel index split across channels)
    val tooMany = PixelCodec.Image(32, 32, 3, Array.tabulate(32 * 32 * 3) { j =>
      val p = j / 3
      (j % 3 match {
        case 0 => p & 0xff
        case 1 => (p >> 8) & 0xff
        case 2 => 0
      }).toByte
    })
    intercept[IllegalArgumentException](Gif.encode(tooMany))
  }

  test("interlaced frames deinterlace to the original row order") {
    // the encoder writes sequential rows; craft an interlaced file by
    // encoding the rows in interlace FILE order and setting the flag —
    // decode must then restore the display order
    val w = 11; val h = 10
    val img = palImage(w, h, 4) // palBits=2 → 4-entry table at offset 13
    val fileOrder = Seq(0, 8) ++ Seq(4) ++ Seq(2, 6) ++ Seq(1, 3, 5, 7, 9)
    val permuted = PixelCodec.Image(w, h, 3,
      fileOrder.toArray.flatMap(y =>
        img.pixels.slice(y * w * 3, (y + 1) * w * 3)))
    val gif = Gif.encode(permuted)
    val idPos = 13 + 3 * 4 // header + global table → image descriptor
    assert(gif(idPos) === 0x2c.toByte)
    gif(idPos + 9) = (gif(idPos + 9) | 0x40).toByte // interlace flag
    val dec = Gif.decode(gif)
    assert(dec.firstImage.pixels.toSeq === img.pixels.toSeq)
  }

  test("animations: multiple frames with graphic-control delays") {
    // splice two single-frame files into one animation: frame 2 rides a
    // graphic-control extension with a 12 cs delay
    val a = palImage(10, 8, 3, seed = 1)
    val b = palImage(10, 8, 3, seed = 2)
    val gifA = Gif.encode(a)
    val gifB = Gif.encode(b)
    val idB = 13 + 3 * 4 // palBits=2 → table of 4
    assert(gifB(idB) === 0x2c.toByte)
    val gce = Array(0x21, 0xf9, 0x04, 0x00, 12, 0x00, 0x00, 0x00).map(_.toByte)
    // frame 2 carries gifB's palette as a LOCAL color table (its global
    // table is dropped by the splice and gifA's differs)
    val desc = gifB.slice(idB, idB + 10)
    desc(9) = (desc(9) | 0x80 | 0x01).toByte // local table, 4 entries
    val anim = gifA.dropRight(1) ++ gce ++ desc ++
      gifB.slice(13, 13 + 12) ++ gifB.drop(idB + 10)
    val dec = Gif.decode(anim)
    assert(dec.frames.length === 2)
    assert(dec.frames(0).delayCs === 0 && dec.frames(1).delayCs === 12)
    assert(dec.firstImage.pixels.toSeq ===
      Gif.decode(gifA).firstImage.pixels.toSeq)
    assert(dec.frames(1).pixels.toSeq ===
      Gif.decode(gifB).firstImage.pixels.toSeq)
  }

  test("hostile headers and truncation throw before allocating") {
    intercept[IllegalArgumentException](Gif.decode("GIF89a".getBytes))
    val good = Gif.encode(palImage(16, 16, 5))
    intercept[Exception](Gif.decode(good.take(good.length / 2)))
    // frame declared outside the logical screen
    val bad = good.clone()
    // image descriptor follows the 13-byte header + 3*palSize table;
    // find the 0x2c introducer and corrupt the frame width
    val idPos = bad.indexOf(0x2c.toByte)
    assert(idPos > 0)
    bad(idPos + 5) = 0xff.toByte; bad(idPos + 6) = 0x7f.toByte
    intercept[IllegalArgumentException](Gif.decode(bad))
  }
}
