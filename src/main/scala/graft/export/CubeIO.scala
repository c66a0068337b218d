package graft.export

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning.{BinAxis, BinnedCube, Binning}

/** Cube exporters (SURVEY.md §2.2 K1-K4).
  *
  * The reference writes xarray cubes to HDF5 / ImageJ-TIFF / NeXus
  * (`sed/io`). None of those containers has a dependency-free JVM writer,
  * so the engine ships two faithful equivalents and documents the gap:
  *
  *  - sparse-parquet + JSON axes sidecar: lossless, scalable, readable by
  *    any engine (the 100 TB-native format — cubes stay distributed);
  *  - raw little-endian binary + JSON header: the driver-side dense dump
  *    (the role of `to_h5`'s `binned/BinnedData` dataset,
  *    `sed/io/hdf5.py:84-190`), trivially ingestible by numpy
  *    (`np.fromfile(...).reshape(shape)`).
  */
object CubeIO {

  /** K4-style distributed export: the sparse histogram DataFrame plus an
    * `_axes.json` sidecar carrying names/centers/attrs.
    */
  def writeSparse(
      hist: DataFrame,
      axes: Seq[BinAxis],
      path: String,
      attrs: Map[String, String] = Map.empty,
  ): Unit = {
    hist.write.mode("overwrite").parquet(path)
    Files.writeString(Paths.get(path, "_axes.json"), axesJson(axes, attrs))
  }

  /** Reload a sparse cube export as (DataFrame, axes-JSON). */
  def readSparse(spark: SparkSession, path: String): (DataFrame, String) =
    (spark.read.parquet(path), Files.readString(Paths.get(path, "_axes.json")))

  /** K1-equivalent dense dump: `<path>.bin` (row-major little-endian
    * int64) + `<path>.json` header with shape/axes/attrs; round-trips via
    * [[readDense]].
    */
  def writeDense(cube: BinnedCube, path: String): Unit = {
    val buf = ByteBuffer.allocate(cube.data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    cube.data.foreach(buf.putLong)
    Files.write(Paths.get(path + ".bin"), buf.array(),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    val axes = cube.axisNames.zip(cube.axes)
    val json =
      s"""{"shape": [${cube.shape.mkString(", ")}],
         | "dtype": "int64", "order": "C",
         | "axes": {${axes.map { case (n, c) =>
          s""""$n": [${c.mkString(", ")}]"""
        }.mkString(", ")}},
         | "attrs": {${cube.attrs.map { case (k, v) => s""""$k": "$v"""" }.mkString(", ")}}}""".stripMargin
    Files.writeString(Paths.get(path + ".json"), json)
  }

  /** Round-trip loader for [[writeDense]] (shape/axes parsed from the
    * header, data from the raw buffer).
    */
  def readDense(path: String): BinnedCube = {
    val header = Files.readString(Paths.get(path + ".json")).replaceAll("\\s+", " ")
    def arr(name: String): Array[Double] = {
      val m = (s""""$name": \\[([^\\]]*)\\]""").r.findFirstMatchIn(header)
      m.get.group(1).split(",").map(_.trim.toDouble)
    }
    val shape = arr("shape").map(_.toInt).toSeq
    val axisNames = """"axes": \{(.*)\}, "attrs"""".r
      .findFirstMatchIn(header).get.group(1)
      .split("\\]").flatMap(s => """"(\w+)": \[""".r.findFirstMatchIn(s).map(_.group(1)))
      .toSeq
    val axes = axisNames.map(arr)
    val bytes = Files.readAllBytes(Paths.get(path + ".bin"))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val data = Array.fill(bytes.length / 8)(buf.getLong)
    BinnedCube(axisNames, axes, data, shape)
  }

  private def axesJson(axes: Seq[BinAxis], attrs: Map[String, String]): String = {
    val ax = axes.map { a =>
      s""""${a.column}": {"idx_column": "${Binning.idxName(a)}", "centers": [${a.centers.mkString(", ")}]}"""
    }.mkString(", ")
    val at = attrs.map { case (k, v) => s""""$k": "$v"""" }.mkString(", ")
    s"""{"axes": {$ax}, "attrs": {$at}}"""
  }
}
