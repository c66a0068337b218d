package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Seeded bit-flip fuzz over every hand-written binary decoder in the
  * multimodal stack (the Hdf5HostileSpec posture applied to the codecs):
  * a corrupted blob must decode to SOMETHING or throw LOUDLY — never
  * StackOverflow, never OutOfMemory, never hang. Wrong pixels on wrong
  * bytes are fine (garbage-in-garbage-out is every codec's contract);
  * non-termination and resource blowups are not, because these decoders
  * run inside executor tasks over untrusted crawl data at scale.
  *
  * Each decode runs on a watchdog future with a hard timeout, so a spin
  * fails the test rather than wedging the suite.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })

  /** Run `body` with a hard timeout; SOE/OOM inside count as failures. */
  private def bounded(what: String)(body: => Any): Unit = {
    val fut = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit =
        try { body; () }
        catch {
          case _: StackOverflowError =>
            fail(s"$what: StackOverflowError on fuzzed input")
          case _: OutOfMemoryError =>
            fail(s"$what: OutOfMemoryError on fuzzed input")
          case _: Throwable => () // loud failure is fine
        }
    })
    try fut.get(20, java.util.concurrent.TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true)
        fail(s"$what: decode did not terminate within 20 s (spin?)")
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  private def gradient(w: Int, h: Int, ch: Int): PixelCodec.Image =
    PixelCodec.Image(w, h, ch, Array.tabulate(w * h * ch) { i =>
      val p = i / ch; val c = i % ch
      ((p % w) * 6 + (p / w) * 3 + c * 40).toByte
    })

  private def sineWav(n: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (0.5 * math.sin(2 * math.Pi * 440.0 * i / 8000) * 32767).toInt
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    out.put("data".getBytes).putInt(data.length).put(data)
    out.array()
  }

  test("bit-flip fuzz across all binary decoders: always terminates," +
      " never SOE/OOM") {
    val img = gradient(32, 24, 3)
    val corpora: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("jpeg_baseline", Jpeg.encode(img, quality = 85),
        (b: Array[Byte]) => Jpeg.decode(b)),
      ("jpeg_progressive", Jpeg.encodeProgressive(img),
        (b: Array[Byte]) => Jpeg.decode(b)),
      ("png", PixelCodec.encodePng(img),
        (b: Array[Byte]) => PixelCodec.decodePng(b)),
      ("gif", Gif.encode(PixelCodec.Image(16, 16, 3,
        Array.tabulate(16 * 16 * 3)(i => ((i / 48) * 16).toByte))),
        (b: Array[Byte]) => Gif.decode(b)),
      ("bmp", PixelCodec.encodeBmp(img),
        (b: Array[Byte]) => PixelCodec.decodeBmp(b)),
      ("wav", sineWav(2000),
        (b: Array[Byte]) => PixelCodec.decodeWav(b)),
    )
    val rnd = new scala.util.Random(20260816L)
    corpora.foreach { case (name, base, dec) =>
      (0 until 150).foreach { i =>
        val b = base.clone()
        val flips = 1 + rnd.nextInt(8)
        (0 until flips).foreach { _ =>
          val pos = rnd.nextInt(b.length)
          b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
        }
        bounded(s"$name case $i")(dec(b))
      }
      // truncation sweep: every 1/16 boundary
      (1 until 16).foreach { k =>
        bounded(s"$name truncated $k/16")(dec(base.take(base.length * k / 16)))
      }
    }
  }
}
