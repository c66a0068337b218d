package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in executor-side batches.
  *
  * The *decode* step is a clearly-marked STUB (no image/audio codecs in
  * this environment — a deterministic fake derives metadata from the raw
  * bytes); everything Spark-side is real and tested: the schema contract,
  * the batched `mapPartitions` shape (the Scala analog of `mapInPandas`),
  * and the partition-size guidance for wide binary rows.
  */
object Multimodal {

  /** Metadata extracted by the (stubbed) decoder. */
  case class MediaMeta(width: Int, height: Int, format: String, byteLen: Long)

  /** Decoded-asset schema appended by [[decodeMeta]]. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
  ))

  /** STUB decoder: a real implementation would parse the container header
    * (PNG/JPEG/WAV/…). The fake is deterministic in the bytes so tests and
    * oracles are stable: dimensions derived from the byte length, format
    * from the first byte.
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    val fmt = if (bytes.isEmpty) "empty" else ((bytes(0) & 0xff) % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "wav"
    }
    MediaMeta((len % 640).toInt, ((len / 640) % 480).toInt, fmt, len)
  }

  /** Batched metadata extraction over a binary column: `mapPartitions`
    * with an iterator-to-iterator transform (constant memory per task, the
    * executor never materializes a partition). At 100 TB, pair with
    * `spark.sql.files.maxPartitionBytes` tuned down so that wide binary
    * rows keep tasks balanced.
    */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ MetaSchema.fields)
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = decodeStub(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(m.width, m.height, m.format, m.byteLen))
      }
    }(enc)
  }

  /** Fixed-count frame sampling positions for a (stubbed) video column:
    * byte offsets at which a real decoder would seek. Pure expressions —
    * demonstrates the plumbing of per-asset fan-out (one row per sampled
    * frame) without a codec.
    */
  def sampleFrameOffsets(df: DataFrame, binCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_offset",
        explode(transform(
          sequence(lit(0), lit(nFrames - 1)),
          i => floor((length(col(binCol)).cast("long") * i) / nFrames).cast("long"),
        )))
}
