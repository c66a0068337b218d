package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VideoSpec extends SparkSpec {
  import spark.implicits._

  /** A w×h grayscale frame with a brightness ramp shifted by `phase` —
    * deterministic, distinct per frame, PNG-round-trippable.
    */
  private def frame(w: Int, h: Int, phase: Int): Array[Byte] =
    PixelCodec.encodePng(PixelCodec.Image(w, h, 1,
      Array.tabulate(w * h)(i => (((i % w) * 16 + phase * 7) % 256).toByte)))

  private def video(nFrames: Int, fpsMilli: Int): Array[Byte] =
    Multimodal.encodeVideo((0 until nFrames).map(frame(16, 12, _)), fpsMilli)

  test("videoIndex/videoFrame: header metadata and frame seek round-trip") {
    val frames = (0 until 5).map(frame(16, 12, _))
    val v = Multimodal.encodeVideo(frames, fpsMilli = 24000)
    val (n, fpsMilli, offsets) = Multimodal.videoIndex(v)
    assert(n === 5 && fpsMilli === 24000 && offsets.length === 5)
    (0 until 5).foreach { i =>
      assert(Multimodal.videoFrame(v, i).toSeq === frames(i).toSeq)
    }
    intercept[IllegalArgumentException](Multimodal.videoFrame(v, 5))
    intercept[IllegalArgumentException](
      Multimodal.videoIndex("nope".getBytes ++ new Array[Byte](20)))
  }

  test("hostile headers fail as Exception before allocating, never OOM") {
    // huge declared frame count: must be rejected by the buffer-size
    // bound BEFORE `new Array(n)` (an OutOfMemoryError would escape the
    // drop-on-Exception row handling in videoColumns)
    val huge = java.nio.ByteBuffer.allocate(16)
      .put("GVID".getBytes).putInt(Int.MaxValue).putInt(1000).putInt(0).array()
    val e = intercept[IllegalArgumentException](Multimodal.videoIndex(huge))
    assert(e.getMessage.contains("frames"))
    // negative / overlong frame length inside the seek walk
    val badLen = java.nio.ByteBuffer.allocate(20)
      .put("GVID".getBytes).putInt(1).putInt(1000).putInt(Int.MaxValue).array()
    intercept[IllegalArgumentException](Multimodal.videoIndex(badLen))
    // and videoColumns drops such rows instead of failing the job
    val df = Seq((1L, video(2, 10000)), (2L, huge)).toDF("id", "vid")
    val out = Multimodal.videoColumns(df, "vid").orderBy("id").collect()
    assert(out(0).getAs[Int]("n_frames") === 2)
    assert(out(1).getAs[Any]("n_frames") === null)
  }

  test("videoColumns: header-only metadata, nulls on undecodable") {
    val df = Seq(
      (1L, video(10, 25000)),
      (2L, video(3, 10000)),
      (3L, "garbage".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]),
    ).toDF("id", "vid")
    val out = Multimodal.videoColumns(df, "vid").orderBy("id").collect()
    assert(out(0).getAs[Int]("n_frames") === 10)
    assert(out(0).getAs[Double]("fps") === 25.0)
    assert(out(0).getAs[Double]("duration_ms") === 400.0)
    assert(out(1).getAs[Int]("n_frames") === 3)
    assert(out(1).getAs[Double]("duration_ms") === 300.0)
    assert(out(2).getAs[Any]("n_frames") === null)
    assert(out(3).getAs[Any]("n_frames") === null)
  }

  test("sampleVideoFrames: evenly-spaced fan-out with REAL decoded features") {
    val df = Seq((1L, video(12, 24000)), (2L, "bad".getBytes))
      .toDF("id", "vid")
    val out = Multimodal.sampleVideoFrames(df, "vid", nSamples = 4)
      .orderBy("id", "frame_idx").collect()
    // undecodable asset contributes zero rows
    assert(out.forall(_.getLong(0) == 1L) && out.length === 4)
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 3, 6, 9))
    // features match a direct decode of the same frame
    val v = video(12, 24000)
    out.foreach { r =>
      val img = PixelCodec.decodePng(
        Multimodal.videoFrame(v, r.getAs[Int]("frame_idx")))
      assert(r.getAs[Long]("frame_dhash") === PixelCodec.dHash(img))
    }
    // distinct frames -> the luma ramp phase differs
    assert(out.map(_.getAs[Double]("frame_luma")).distinct.length === 4)
  }

  test("sampling more frames than exist yields every frame once") {
    val df = Seq((1L, video(3, 24000))).toDF("id", "vid")
    val out = Multimodal.sampleVideoFrames(df, "vid", nSamples = 10)
    assert(out.select("frame_idx").as[Int].collect().sorted.toSeq === Seq(0, 1, 2))
  }
}
