package graft.export

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning.{BinAxis, BinnedCube, Binning}

/** Cube exporters (SURVEY.md §2.2 K1-K4).
  *
  * The reference writes xarray cubes to HDF5 / ImageJ-TIFF / NeXus
  * (`sed/io`). The engine ships:
  *
  *  - sparse-parquet + JSON axes sidecar: lossless, scalable, readable by
  *    any engine (the 100 TB-native format — cubes stay distributed);
  *  - REAL HDF5 in the reference's own container layout
  *    (`binned/BinnedData` + `axes/ax{i}`, `sed/io/hdf5.py:84-190`) via
  *    the dependency-free [[graft.loader.Hdf5Minimal]] writer — h5py-
  *    compatible contiguous datasets, so `load_h5` can read our cubes
  *    ([[writeH5]]/[[readH5]]);
  *  - raw little-endian binary + JSON header: a numpy-trivial dense dump
  *    (`np.fromfile(...).reshape(shape)`), kept for zero-tooling
  *    interchange ([[writeDense]]).
  *
  * NeXus (K3) remains a JSON metadata sidecar: its writer toolchain is
  * Python-only (documented gap, SURVEY §2.2).
  */
object CubeIO {

  import graft.loader.Hdf5Minimal

  /** K1: write the dense cube as a real HDF5 file in the reference's
    * layout (`sed/io/hdf5.py:99-129` `to_h5`): `binned/BinnedData` holds
    * the row-major counts with `units`/`long_name` attributes, `axes/ax{i}`
    * hold the bin-center coordinates with a `name` attribute, and any
    * remaining cube attrs ride on a `metadata` group.
    */
  def writeH5(cube: BinnedCube, path: String): Unit = {
    val binned = Hdf5Minimal.Group(datasets = Seq(
      Hdf5Minimal.Dataset("BinnedData", Hdf5Minimal.I64(cube.data),
        attrs = cube.attrs.view.filterKeys(Set("units", "long_name")).toMap,
        shape = Some(cube.shape.map(_.toLong)))))
    val axes = Hdf5Minimal.Group(datasets =
      cube.axisNames.zip(cube.axes).zipWithIndex.map { case ((n, c), i) =>
        Hdf5Minimal.Dataset(s"ax$i", Hdf5Minimal.F64(c), Map("name" -> n))
      })
    val meta = cube.attrs -- Seq("units", "long_name")
    val subgroups = Seq("binned" -> binned, "axes" -> axes) ++
      (if (meta.nonEmpty) Seq("metadata" -> Hdf5Minimal.Group(attrs = meta)) else Nil)
    Hdf5Minimal.write(path, Hdf5Minimal.Group(subgroups = subgroups))
  }

  /** Round-trip loader for [[writeH5]] (mirrors `load_h5`,
    * `sed/io/hdf5.py:133-190`).
    */
  def readH5(path: String): BinnedCube = {
    val root = Hdf5Minimal.read(path)
    val bd = root.dataset("binned/BinnedData")
    val axDs = root.group("axes").datasets.sortBy(_.name)
    val meta =
      if (root.hasChild("metadata")) root.group("metadata").attrs
      else Map.empty[String, String]
    BinnedCube(
      axDs.map(_.attrs("name")),
      axDs.map(_.data.asDoubles),
      bd.data.asLongs,
      bd.dims.map(_.toInt),
      meta ++ bd.attrs.view.filterKeys(Set("units", "long_name")).toMap,
    )
  }

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
