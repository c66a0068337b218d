package graft.export

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-header posture of the TIFF reader: a lying `images=` count or
  * strip offset must die with a NAMED bounds error before allocating a
  * pixel array the file cannot back (the lying-dims OOM class the
  * PixelCodec cap closed for PNG/GIF/JPEG).
  */
class TiffHostileSpec extends AnyFunSuite {

  private def dir = Files.createTempDirectory("tiff_hostile").toString

  private def patchedCopy(src: String, dst: String)(
      patch: Array[Byte] => Unit): String = {
    val b = Files.readAllBytes(Paths.get(src))
    patch(b)
    Files.write(Paths.get(dst), b)
    dst
  }

  test("lying images= count cannot out-allocate the file") {
    val d = dir
    Tiff.write(s"$d/ok.tif", Array.fill(12)(1f), 1, 3, 4)
    // rewrite the ImageJ description's slice count in place
    val big = patchedCopy(s"$d/ok.tif", s"$d/lying.tif") { b =>
      val s = new String(b, "ISO-8859-1")
      val at = s.indexOf("images=1")
      assert(at > 0)
      b(at + 7) = '9'.toByte // images=9 (> data present)
    }
    val e = intercept[IllegalArgumentException](Tiff.read(big))
    assert(e.getMessage.contains("data bytes exist"), e.getMessage)
  }

  test("strip offset past EOF is a named error") {
    val d = dir
    Tiff.write(s"$d/ok.tif", Array.fill(12)(1f), 1, 3, 4)
    val bad = patchedCopy(s"$d/ok.tif", s"$d/off.tif") { b =>
      // TagStripOffsets (273) value: find the tag entry and blow up the
      // offset (IFD entries are 12 bytes: id@0, type@2, count@4, value@8)
      var p = 10 // header(8) + tag count(2)
      var found = false
      while (!found && p + 12 <= b.length) {
        val id = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        if (id == 273) {
          b(p + 8) = 0xff.toByte; b(p + 9) = 0xff.toByte
          b(p + 10) = 0x7f.toByte; b(p + 11) = 0x00.toByte
          found = true
        }
        p += 12
      }
      assert(found)
    }
    val e = intercept[IllegalArgumentException](Tiff.read(bad))
    assert(e.getMessage.contains("data bytes exist"), e.getMessage)
  }

  test("write rejects shape/data mismatches with Long-safe arithmetic") {
    val d = dir
    // 46341^2 overflows Int (it is ~2^31.0007): the Int product would
    // wrap and 'accept' a wrong data length
    val e = intercept[IllegalArgumentException](
      Tiff.write(s"$d/x.tif", Array.emptyFloatArray, 1, 46341, 46341))
    assert(e.getMessage.contains("data length"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Tiff.write(s"$d/y.tif", Array.emptyFloatArray, 0, 1, 1))
    assert(e2.getMessage.contains("invalid stack shape"), e2.getMessage)
  }
}
