package graft.pipeline

import java.io.ByteArrayOutputStream

/** Minimal AVI (RIFF) container support for Motion-JPEG video — the
  * real-world sibling of [[Multimodal]]'s bespoke GVID container: an
  * MJPEG AVI is exactly "a list of JPEG frames with a seek table",
  * which the baseline [[Jpeg]] codec can now decode for real, so the
  * whole video feature path (header-only metadata, seek-to-frame,
  * sampled pixel features) runs on a format actual tools emit
  * (ffmpeg `-c:v mjpeg`, OpenCV, old cameras).
  *
  * Layout handled (all little-endian):
  * {{{
  * RIFF <sz> 'AVI '
  *   LIST <sz> 'hdrl'
  *     'avih' <56>  — µs/frame, total frames, width, height …
  *     LIST <sz> 'strl'  ('strh' 'vids'/'MJPG', 'strf' BITMAPINFOHEADER)
  *   LIST <sz> 'movi'
  *     '00dc' <len> <jpeg bytes> [pad to even]  × n
  *   'idx1' <16·n>  (optional — the parser walks movi directly)
  * }}}
  *
  * Every header-declared size is validated against the physical buffer
  * BEFORE any allocation (hostile-header rule — see
  * [[Multimodal.videoIndex]]): a corrupt frame count or chunk length
  * raises IllegalArgumentException, never an OutOfMemoryError the
  * drop-undecodable-rows catch can't contain.
  */
object Avi {

  final case class Info(
      nFrames: Int,
      usPerFrame: Int,
      width: Int,
      height: Int,
      offsets: Array[Int], // absolute offset of each frame's payload
      lengths: Array[Int],
  ) {
    def fps: Double = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
  }

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "ISO-8859-1")

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Parse the container: hdrl for the timing/geometry scalars, movi
    * walked chunk-by-chunk for the frame seek table ('00dc'/'01dc'/
    * '00db' entries; idx1 is ignored — the walk IS the index, and a
    * missing or lying idx1 then cannot corrupt seeks).
    */
  def index(bytes: Array[Byte]): Info = {
    require(isAvi(bytes), "not a RIFF/AVI container")
    val riffEnd = {
      val declared = u32(bytes, 4)
      require(declared >= 4 && 8 + declared <= bytes.length,
        s"RIFF declares $declared bytes in a ${bytes.length}-byte buffer")
      (8 + declared).toInt
    }
    var usPerFrame = 0
    var totalFrames = -1
    var width = 0
    var height = 0
    val offsets = new scala.collection.mutable.ArrayBuffer[Int]
    val lengths = new scala.collection.mutable.ArrayBuffer[Int]

    def walkMovi(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fourcc(bytes, p)
        val len = u32(bytes, p + 4)
        require(len <= Int.MaxValue && p + 8 + len <= to,
          s"movi chunk $id declares $len bytes past list end")
        if (id == "00dc" || id == "01dc" || id == "00db") {
          offsets += p + 8
          lengths += len.toInt
        } else if (id == "LIST" && len >= 4 && fourcc(bytes, p + 8) == "rec ") {
          // interleaved files group chunks into 'rec ' records
          walkMovi(p + 12, p + 8 + len.toInt)
        }
        p += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
    }

    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fourcc(bytes, p)
        val len = u32(bytes, p + 4)
        require(len <= Int.MaxValue && p + 8 + len <= to,
          s"chunk $id declares $len bytes past parent end")
        val end = p + 8 + len.toInt
        if (id == "LIST" && len >= 4) {
          val kind = fourcc(bytes, p + 8)
          if (kind == "movi") walkMovi(p + 12, end)
          else if (kind == "hdrl" || kind == "strl") walk(p + 12, end)
        } else if (id == "avih" && len >= 40) {
          usPerFrame = u32(bytes, p + 8).toInt
          totalFrames = u32(bytes, p + 8 + 16).toInt
          width = u32(bytes, p + 8 + 32).toInt
          height = u32(bytes, p + 8 + 36).toInt
        }
        p = end + (len.toInt & 1)
      }
    }
    walk(12, riffEnd)
    require(offsets.nonEmpty || totalFrames == 0,
      "no movi frame chunks found")
    Info(offsets.length, usPerFrame, width, height,
      offsets.toArray, lengths.toArray)
  }

  /** One frame's codec payload (JPEG bytes for MJPG) by index. */
  def frame(bytes: Array[Byte], info: Info, i: Int): Array[Byte] = {
    require(i >= 0 && i < info.nFrames, s"frame $i of ${info.nFrames}")
    java.util.Arrays.copyOfRange(bytes, info.offsets(i),
      info.offsets(i) + info.lengths(i))
  }

  /** Write an MJPEG AVI from per-frame JPEG payloads (test/sink path —
    * pairs with [[Jpeg.encode]]). `fps` sets avih/strh timing.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Double): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val usPerFrame = math.round(1e6 / fps).toInt

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(id.getBytes("ISO-8859-1"))
      writeU32(o, body.length.toLong)
      o.write(body)
      if ((body.length & 1) == 1) o.write(0) // word alignment
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write("LIST".getBytes("ISO-8859-1"))
      writeU32(o, body.length + 4L)
      o.write(kind.getBytes("ISO-8859-1"))
      o.write(body)
      o.toByteArray
    }

    val maxLen = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = {
      val o = new ByteArrayOutputStream()
      writeU32(o, usPerFrame.toLong)
      writeU32(o, if (usPerFrame > 0) maxLen * 1000000L / usPerFrame else 0L)
      writeU32(o, 0) // padding granularity
      writeU32(o, 0x10) // AVIF_HASINDEX
      writeU32(o, frames.length.toLong)
      writeU32(o, 0) // initial frames
      writeU32(o, 1) // streams
      writeU32(o, maxLen.toLong)
      writeU32(o, width.toLong)
      writeU32(o, height.toLong)
      (0 until 4).foreach(_ => writeU32(o, 0))
      o.toByteArray
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      o.write("vids".getBytes("ISO-8859-1"))
      o.write("MJPG".getBytes("ISO-8859-1"))
      writeU32(o, 0); writeU32(o, 0) // flags, prio/lang
      writeU32(o, 0) // initial frames
      writeU32(o, usPerFrame.toLong) // scale
      writeU32(o, 1000000L) // rate (rate/scale = fps)
      writeU32(o, 0) // start
      writeU32(o, frames.length.toLong)
      writeU32(o, maxLen.toLong)
      writeU32(o, 0xffffffffL) // quality
      writeU32(o, 0) // sample size
      writeU32(o, 0); writeU32(o, (height.toLong << 16) | width.toLong) // rcFrame
      o.toByteArray
    }
    val strf = {
      val o = new ByteArrayOutputStream()
      writeU32(o, 40)
      writeU32(o, width.toLong)
      writeU32(o, height.toLong)
      o.write(Array[Byte](1, 0)) // planes
      o.write(Array[Byte](24, 0)) // bit count
      o.write("MJPG".getBytes("ISO-8859-1"))
      writeU32(o, width.toLong * height * 3)
      writeU32(o, 0); writeU32(o, 0); writeU32(o, 0); writeU32(o, 0)
      o.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))

    val moviBody = new ByteArrayOutputStream()
    val frameOffsets = frames.map { f =>
      val off = moviBody.size() // offset of the chunk header within movi data
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx1 = {
      val o = new ByteArrayOutputStream()
      frames.zip(frameOffsets).foreach { case (f, off) =>
        o.write("00dc".getBytes("ISO-8859-1"))
        writeU32(o, 0x10) // AVIIF_KEYFRAME
        writeU32(o, off + 4L) // offset from 'movi' fourcc to chunk header
        writeU32(o, f.length.toLong)
      }
      chunk("idx1", o.toByteArray)
    }

    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("ISO-8859-1"))
    body.write(hdrl)
    body.write(movi)
    body.write(idx1)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"))
    writeU32(out, body.size().toLong)
    body.writeTo(out)
    out.toByteArray
  }

  private def writeU32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 24) & 0xff).toInt)
  }
}
