package graft.loader

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-file ingestion for train-indexed instrument HDF5 (the flash /
  * sxp DAQ families): real `.h5` paths in, `(events, timed)` out — the
  * one-call `read_dataframe` surface of the reference's FlashLoader /
  * SXPLoader (`sed/loader/flash/loader.py`, `sed/loader/sxp/loader.py`)
  * on top of the F1-F7 building blocks in [[ChannelLoader]].
  *
  * A channel is a train-indexed dataset (`index` holds the train ids):
  *  - flash packs per-electron channels as slices of one (T × S × W)
  *    block (`DLD1/value`: slice 0 = dldPosY, 1 = dldPosX, 2 = pulseId,
  *    3 = dldTimeSteps) — `slice >= 0` selects the S coordinate;
  *  - sxp stores each channel as its own (T × W) dataset — `slice = -1`
  *    takes the whole per-train row;
  *  - per-train scalars are 1-D (T) datasets.
  *
  * Scale shape: one `binaryFile` task per file decodes ALL channels in
  * one pass (datasets memoized, so the flash block is decoded once for
  * its four slices) into a long-format channel table — pass `bufferDir`
  * to convert it ONCE into a channel-partitioned parquet buffer (the
  * reference's F6 design: later reads partition-prune per channel and
  * never touch the raw files again; without it the table is cached for
  * the session). Channel frames then pivot out of it, the per-electron frame
  * zip-explodes ONCE across all electron channels (one row amplification
  * instead of one explode + join per channel), and
  * [[ChannelLoader.assemble]] contributes the full-outer pulse/train
  * attach, forward fill, NaN drop, and the timed frame.
  */
object InstrumentH5Loader extends Loader {

  /** One train-indexed channel.
    *
    * @param format `per_electron`, `per_pulse`, or `per_train`
    * @param dataset value dataset path inside the file
    * @param index   train-id dataset path
    * @param slice   S coordinate into a (T, S, W) block; -1 = whole row
    */
  final case class Channel(
      name: String,
      format: String,
      dataset: String,
      index: String,
      slice: Int = -1,
  ) {
    require(Set("per_electron", "per_pulse", "per_train")(format),
      s"channel $name: unknown format $format")
  }

  private val longSchema = StructType(Seq(
    StructField("file_id", IntegerType, nullable = false),
    StructField("channel", StringType, nullable = false),
    StructField("trainId", LongType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** One `binaryFile` pass → long-format channel table
    * `(file_id, channel, trainId, values)`; executor-side HDF5 decode,
    * one task per file.
    */
  def readChannelTable(
      spark: SparkSession,
      paths: Seq[String],
      channels: Seq[Channel],
  ): DataFrame = {
    val ordered = GenericLoader.naturalSort(paths)
    val fileIds = ordered.map(StreamFixture.normPath).zipWithIndex.toMap
    val chB = spark.sparkContext.broadcast(channels)
    val fileIdsB = spark.sparkContext.broadcast(fileIds)
    val enc: Encoder[Row] = Encoders.row(longSchema)
    StreamFixture.fileBytesFrame(spark, ordered)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val fileId = fileIdsB.value.getOrElse(
            StreamFixture.normPath(r.getString(0)), -1)
          require(fileId >= 0, s"${r.getString(0)} matches none of the input paths")
          val root = Hdf5Minimal.parse(r.getAs[Array[Byte]](1))
          // memoize decoded datasets: flash reads 4 slices of one block
          val dsCache = collection.mutable.Map[String, (Seq[Long], Array[Double])]()
          def decoded(path: String) = dsCache.getOrElseUpdate(path, {
            val d = root.dataset(path)
            (d.dims, d.data.asDoubles)
          })
          chB.value.iterator.flatMap { c =>
            val trains = root.dataset(c.index).data.asLongs
            val (dims, flat) = decoded(c.dataset)
            require(dims.head == trains.length,
              s"channel ${c.name}: ${dims.head} rows vs ${trains.length} trains")
            val perTrain = (dims.tail.product
              / (if (c.slice >= 0) dims(1) else 1L)).toInt
            trains.indices.iterator.map { t =>
              val vals =
                if (dims.length == 1) Array(flat(t))
                else if (c.slice >= 0) { // (T, S, W...) block slice
                  val w = (dims.product / (dims.head * dims(1))).toInt
                  flat.slice((t * dims(1).toInt + c.slice) * w,
                    (t * dims(1).toInt + c.slice + 1) * w)
                } else flat.slice(t * perTrain, (t + 1) * perTrain)
              Row(fileId, c.name, trains(t), vals.toSeq)
            }
          }
        }
      }(enc)
  }

  /** Pivot one channel's frame out of the long table. `file_id` stays in
    * every key so trains that collide across files can never cross-join.
    */
  private def channelFrame(long: DataFrame, c: Channel): DataFrame = {
    val base = long.filter(col("channel") === c.name)
    if (c.format == "per_train")
      base.select(col("file_id"), col("trainId"), col("values")(0).as(c.name))
    else base.select(col("file_id"), col("trainId"), col("values").as(c.name))
  }

  /** Full read: events + timed frames from real instrument files.
    *
    * @param pulseChannel the per-electron channel holding pulse ids
    *                     (renamed to `pulseId` in the output)
    * @param tofChannel   the channel whose NaN rows are dropped from
    *                     events (the reference's dropna on the tof column)
    */
  def readDataframe(
      spark: SparkSession,
      paths: Seq[String],
      channels: Seq[Channel],
      pulseChannel: String,
      tofChannel: String,
      ubidOffset: Int,
      bufferDir: Option[String] = None,
  ): (DataFrame, DataFrame) = {
    val pe = channels.filter(_.format == "per_electron")
    require(pe.exists(_.name == pulseChannel),
      s"pulse channel $pulseChannel must be per_electron")
    // each channel frame filters the long table, so WITHOUT
    // materialization every frame would re-run the binaryFile decode —
    // buffer to parquet (the reference's own convert-once design, F6;
    // survives the session and partition-prunes on `channel`) or, when
    // no directory is given, cache for this session
    val raw = readChannelTable(spark, paths, channels)
    val long = bufferDir match {
      case Some(dir) =>
        // a stale buffer (different file list or channel set than this
        // call) would otherwise be reused SILENTLY — missing files/
        // channels simply produce fewer/empty frames, not errors, and a
        // same-length-but-reordered path list would permute the
        // sorted-index file_id assignment. The manifest pins the EXACT
        // (file_id -> normalized path) mapping + channel set the buffer
        // was written from; reuse requires byte equality. (The leading
        // underscore keeps Spark's parquet reader from listing it.)
        val manifest = (channels.map(_.name).sorted.mkString("channels:", ",", "") +:
          GenericLoader.naturalSort(paths).map(StreamFixture.normPath)
            .zipWithIndex.map { case (p, i) => s"$i:$p" }).mkString("\n")
        // all buffer IO through the Hadoop FS for the dir's scheme: a
        // java.io/java.nio check is local-only, so a cluster buffer on
        // hdfs://'/s3a:// would re-write on every call and then fail
        // the manifest write confusingly
        val dirPath = new org.apache.hadoop.fs.Path(dir)
        val bufFs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val mf = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.txt")
        if (!bufFs.exists(dirPath)) {
          raw.write.partitionBy("channel").parquet(dir)
          val out = bufFs.create(mf, true)
          try out.write(manifest.getBytes("UTF-8")) finally out.close()
        }
        require(bufFs.exists(mf),
          s"buffer $dir has no manifest (written by something else?) — " +
            "use a fresh bufferDir")
        val stored = {
          val in = bufFs.open(mf)
          try new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        }
        require(stored == manifest,
          s"buffer $dir was written from a different (file, channel) set " +
            "than this call requests — use a fresh bufferDir")
        val buffered = spark.read.parquet(dir)
        val missing = longSchema.fieldNames.toSet -- buffered.columns.toSet
        require(missing.isEmpty,
          s"existing buffer $dir does not match the channel-table schema: missing $missing")
        buffered
      case None => raw.cache()
    }

    // per-electron frame: join channel arrays on (file, train), ONE
    // zip-explode across all electron channels
    val keys = Seq("file_id", "trainId")
    val joined = ChannelLoader.concatenateChannels(
      pe.map(channelFrame(long, _)), keys)
    val elec = joined
      .select(col("file_id"), col("trainId"),
        posexplode(arrays_zip(pe.map(c => col(c.name)): _*)).as(Seq("_pos", "_z")))
      .select(col("file_id") +: col("trainId") +: col("_pos") +:
        pe.map(c => col(s"_z.${c.name}").as(c.name)): _*)
      .withColumn(pulseChannel, col(pulseChannel) - ubidOffset)
      // NaN pulse ids sort ABOVE every number in Spark, so a bare >= 0
      // would keep them and cast them to pulse 0 — drop them explicitly
      // (the reference dropna's the pulse column)
      .filter(!isnan(col(pulseChannel)) && col(pulseChannel) >= 0)
      .withColumn("electronId", row_number().over(
        Window.partitionBy(col("file_id"), col("trainId"), col(pulseChannel))
          .orderBy(col("_pos"))).cast("long") - 1)
      .withColumnRenamed(pulseChannel, "pulseId")
      .withColumn("pulseId", col("pulseId").cast("long"))
      .drop("_pos")

    val pulseFrames = channels.filter(_.format == "per_pulse").map { c =>
      channelFrame(long, c).select(col("file_id"), col("trainId"),
        posexplode(col(c.name)).as(Seq("pulseId", c.name)))
        .withColumn("pulseId", col("pulseId").cast("long"))
    }
    val trainFrames = channels.filter(_.format == "per_train")
      .map(channelFrame(long, _))
    // a SINGLE SMALL input file decodes on one task no matter what, so
    // the two-phase global fill's extra stages buy parallelism the
    // upstream can't feed — take the one-window form and its lower
    // latency there. Gated on file size as well as count: a multi-GB
    // single file has millions of events, and (especially through the
    // multi-partition bufferDir read) the two-phase fill's parallel
    // sort is the right plan for it. Multi-file loads always keep the
    // scale-safe two-phase fill (loader64).
    // fetch the single file's length ONCE for both size gates (a second
    // getFileStatus would be an extra metadata round trip to a possibly
    // slow source FS — the same pattern CopyTool.copy avoids)
    val singleLen: Option[Long] =
      if (paths.size != 1) None
      else try {
        val hp = new org.apache.hadoop.fs.Path(paths.head)
        Some(hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(hp).getLen)
      } catch { case _: Exception => None }
    val small = singleLen.exists(_ <= ChannelLoader.smallFrameMaxBytes)
    val (events, timed) = ChannelLoader.assemble(elec, pulseFrames,
      trainFrames, tofChannel, trainKeys = keys, smallFrame = small)
    // single SMALL file: run the events assemble once here and hand back
    // a parquet-spill-backed frame — later materializations are one
    // exchange-free scan job, not a re-run of the whole join/fill plan
    // (ChannelLoader.driverLocalMaxBytes scaladoc; parity spec-pinned).
    // The timed frame stays LAZY: most callers never materialize it, and
    // spilling it here would run the whole assemble a second time at
    // load for nothing; its (rare, small) consumers pay the lazy plan.
    if (ChannelLoader.eagerSmallLoad(spark, singleLen))
      (ChannelLoader.driverLocal(events), timed)
    else (events, timed)
  }

  /** FLASH `read_dataframe(runs=, collect_metadata=)`
    * (`sed/loader/flash/loader.py:896-929`): resolve each run's files
    * in `folder` through the DAQ naming glob, load the (events, timed)
    * frames, and — when `collectMetadata` — fetch the runs' SciCat
    * catalogue metadata ([[ScicatMetadata]], `loader.py:839-846`) into
    * the returned dict. Requiring a [[ScicatMetadata.Config]] only when
    * the flag is set mirrors the reference, where the retriever is
    * constructed (and its no-URL/token ValueError raised) only inside
    * `parse_metadata`. Catalogue fetch FAILURES warn per run and leave
    * that run's keys absent — a catalogue outage never fails the data
    * load. Metadata is a handful of driver-side HTTP round trips per
    * load; the data path is untouched.
    */
  def readRuns(
      spark: SparkSession,
      folder: String,
      runs: Seq[String],
      channels: Seq[Channel] = flashDefaultChannels,
      extension: String = "h5",
      pulseChannel: String = "pulseId",
      tofChannel: String = "dldTimeSteps",
      ubidOffset: Int = 5,
      bufferDir: Option[String] = None,
      collectMetadata: Boolean = false,
      scicat: Option[ScicatMetadata.Config] = None,
      beamtimeId: String = "",
      metadata: Map[String, Any] = Map.empty,
  ): (DataFrame, DataFrame, Map[String, Any]) = {
    val files = runs.flatMap(r =>
      GenericLoader.getFilesFromRunId(folder, r, extension))
    val (events, timed) = readDataframe(
      spark, files, channels, pulseChannel, tofChannel, ubidOffset, bufferDir)
    val meta =
      if (!collectMetadata) metadata
      else ScicatMetadata.getMetadata(
        scicat.getOrElse(throw new IllegalArgumentException(
          "scicat: no URL or token provided for fetching metadata")),
        beamtimeId, runs, metadata)
    (events, timed, meta)
  }

  /** [[Loader]] contract entry: flash HEXTOF channel geometry by default. */
  override def readDataframe(
      spark: SparkSession, paths: Seq[String]): (DataFrame, Option[DataFrame]) = {
    val (events, timed) = readDataframe(
      spark, paths, flashDefaultChannels,
      pulseChannel = "pulseId", tofChannel = "dldTimeSteps", ubidOffset = 5)
    (events, Some(timed))
  }

  /** The bundled flash test config's channel set
    * (`tests/data/loader/flash/config.yaml:80-128`).
    */
  val flashDefaultChannels: Seq[Channel] = {
    val dld = "uncategorised/FLASH.EXP/HEXTOF.DAQ/DLD1"
    Seq(
      Channel("dldPosY", "per_electron", s"$dld/value", s"$dld/index", slice = 0),
      Channel("dldPosX", "per_electron", s"$dld/value", s"$dld/index", slice = 1),
      Channel("pulseId", "per_electron", s"$dld/value", s"$dld/index", slice = 2),
      Channel("dldTimeSteps", "per_electron", s"$dld/value", s"$dld/index", slice = 3),
      Channel("timeStamp", "per_train",
        "uncategorised/FLASH.DIAG/TIMINGINFO/TIME1.BUNCH_FIRST_INDEX.1/time",
        "uncategorised/FLASH.DIAG/TIMINGINFO/TIME1.BUNCH_FIRST_INDEX.1/index"),
      Channel("gmdTunnel", "per_pulse",
        "FL1/Photon Diagnostic/GMD/Pulse resolved energy/energy tunnel/value",
        "FL1/Photon Diagnostic/GMD/Pulse resolved energy/energy tunnel/index"),
    )
  }

  /** The bundled sxp test config's channel set
    * (`tests/data/loader/sxp/config.yaml`).
    */
  val sxpDefaultChannels: Seq[Channel] = {
    val det = "INSTRUMENT/SXP_TR_XPES/DET/MCP_DETECTOR:output/data"
    Seq(
      Channel("pulseId", "per_electron", s"$det/starterCounter", s"$det/trainId"),
      Channel("dldPosX", "per_electron", s"$det/x", s"$det/trainId"),
      Channel("dldPosY", "per_electron", s"$det/y", s"$det/trainId"),
      Channel("dldTimeSteps", "per_electron", s"$det/t", s"$det/trainId"),
      Channel("timeStamp", "per_train", "INDEX/timestamp", "INDEX/trainId"),
    )
  }
}
