package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.binning.{BinnedCube, Binning, UniformAxis}
import graft.export.CubeIO

class ProcessorSpec extends SparkSpec {

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("full workflow: jitter → corrections → calibrations → compute") {
    val base = events
      .withColumn("X", col("value"))
      .withColumn("Y", col("value") * 0.5)
      .withColumn("t", col("value") + 1000.0)
    val p = new Processor(spark, base, Some(base))
    p.addJitter(Seq("X", "Y"), Seq(0.1))
      .applyEnergyCorrection(
        calibrate.Energy.Correction.spherical(_, _, 250.0, 125.0, 0.1, 2000.0))
      .appendEnergyAxis("tm", Left((1.0e5, -10.0, 0.0)), binwidth = 2.0, binning = 0)
      .calibrateDelayAxis("value", (0.0, 500.0), delayRangeMm = Some((25.0, 25.6)),
        time0Mm = 25.3)
      .filterColumn("energy", -1e9, 1e9)
    assert(Seq("tm", "energy", "delay").forall(p.dataframe.columns.contains))
    // timed table mirrored the shared-column transforms
    assert(p.timed.get.columns.contains("energy"))
    val cube = p.compute(Seq(UniformAxis("energy", 50,
      0.0, 0.06)))
    assert(cube.total > 0)
    assert(cube.attrs("units") === "counts")
    // metadata provenance recorded along the chain
    assert(p.metadata.get.keySet.intersect(
      Set("jitter", "energy_correction", "energy_calibration", "delay_calibration")).size === 4)
  }

  test("SparkEntry.entry produces a non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("compute applies transient filters and normalization") {
    val base = events
    val p = new Processor(spark, base, Some(base))
    val ax = UniformAxis("value", 20, 0.0, 500.0)
    val full = p.compute(Seq(ax))
    val filtered = p.compute(Seq(ax), filters = Seq(("value", 100.0, 400.0)))
    assert(filtered.total < full.total)
    val err = intercept[IllegalArgumentException] {
      p.compute(Seq(ax), filters = Seq(("nope", 0.0, 1.0)))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("compute-time jitter de-quantizes an integer column across bins") {
    import spark.implicits._
    // all mass on the integer value 5 → without jitter one bin, with ±0.5
    // uniform jitter the two bins straddling it both receive counts
    val quantized = Seq.fill(500)(5.0).toDF("q")
    val p = new Processor(spark, quantized, None)
    val ax = UniformAxis("q", 10, 0.5, 10.5) // width-1 bins, edges at integers
    val plain = p.compute(Seq(ax))
    assert(plain.data.count(_ > 0) === 1)
    val jittered = p.compute(Seq(ax), jitter = Seq("q"))
    assert(jittered.data.count(_ > 0) === 2)
    assert(jittered.total === plain.total)
  }

  test("metadata duplicate policies: raise, overwrite, merge") {
    val m = new MetadataTree
    m.add(Map("a" -> 1), "k")
    intercept[IllegalArgumentException] { m.add(Map("b" -> 2), "k") }
    m.add(Map("b" -> 2), "k", "merge")
    assert(m.get("k") === Map("a" -> 1, "b" -> 2))
    m.add(Map("c" -> 3), "k", "overwrite")
    assert(m.get("k") === Map("c" -> 3))
  }

  test("CubeIO dense round trip preserves data, axes, shape") {
    val cube = BinnedCube(
      Seq("x", "y"),
      Seq(Array(0.5, 1.5), Array(0.0, 1.0, 2.0)),
      Array(1L, 2L, 3L, 4L, 5L, 6L),
      Seq(2, 3),
      Map("units" -> "counts"))
    val path = Files.createTempDirectory("cube").toFile.getPath + "/c"
    CubeIO.writeDense(cube, path)
    val back = CubeIO.readDense(path)
    assert(back.data.toSeq === cube.data.toSeq)
    assert(back.shape === cube.shape)
    assert(back.axisNames === cube.axisNames)
    assert(back.axes.head.toSeq === Seq(0.5, 1.5))
  }

  test("CubeIO HDF5 cube container round-trips in the reference layout") {
    val cube = BinnedCube(
      Seq("kx", "energy"),
      Seq(Array(0.5, 1.5), Array(0.0, 1.0, 2.0)),
      Array(1L, 2L, 3L, 4L, 5L, 6L),
      Seq(2, 3),
      Map("units" -> "counts", "long_name" -> "intensity", "run" -> "30"))
    val path = Files.createTempDirectory("cubeh5").toFile.getPath + "/binned.h5"
    CubeIO.writeH5(cube, path)
    // the file IS HDF5 with the reference's group layout
    val root = graft.loader.Hdf5Minimal.read(path)
    assert(root.dataset("binned/BinnedData").dims === Seq(2L, 3L))
    assert(root.dataset("axes/ax0").attrs("name") === "kx")
    val back = CubeIO.readH5(path)
    assert(back.data.toSeq === cube.data.toSeq)
    assert(back.shape === cube.shape)
    assert(back.axisNames === cube.axisNames)
    assert(back.axes(1).toSeq === Seq(0.0, 1.0, 2.0))
    assert(back.attrs === cube.attrs)
  }

  test("CubeIO NeXus export writes an NXmpes tree that round-trips") {
    val cube = BinnedCube(
      Seq("kx", "energy"),
      Seq(Array(0.5, 1.5), Array(0.0, 1.0, 2.0)),
      Array(1L, 2L, 3L, 4L, 5L, 6L),
      Seq(2, 3),
      Map("title" -> "scan 30", "units.energy" -> "eV", "run" -> "30"))
    val path = Files.createTempDirectory("nexus").toFile.getPath + "/scan.nxs"
    CubeIO.writeNexus(cube, path)
    // the file IS HDF5 with the NXmpes plottable-data skeleton
    val root = graft.loader.Hdf5Minimal.read(path)
    val entry = root.group("entry")
    assert(entry.attrs("NX_class") === "NXentry")
    assert(entry.dataset("definition").data ===
      graft.loader.Hdf5Minimal.Str("NXmpes"))
    assert(entry.dataset("title").data === graft.loader.Hdf5Minimal.Str("scan 30"))
    val data = entry.group("data")
    assert(data.attrs("NX_class") === "NXdata")
    assert(data.attrs("signal") === "data")
    assert(data.attrs("axes") === "kx:energy")
    assert(data.attrs("energy_indices") === "1")
    assert(data.dataset("data").dims === Seq(2L, 3L))
    assert(data.dataset("energy").attrs("units") === "eV")
    val back = CubeIO.readNexus(path)
    assert(back.data.toSeq === cube.data.toSeq)
    assert(back.shape === cube.shape)
    assert(back.axisNames === cube.axisNames)
    assert(back.axes(1).toSeq === Seq(0.0, 1.0, 2.0))
    assert(back.attrs === cube.attrs)
  }

  test("CubeIO NXmpes validator: clean export passes, corruptions are named") {
    import graft.loader.Hdf5Minimal
    val cube = BinnedCube(
      Seq("kx", "energy"),
      Seq(Array(0.5, 1.5), Array(0.0, 1.0, 2.0)),
      Array(1L, 2L, 3L, 4L, 5L, 6L),
      Seq(2, 3),
      Map("title" -> "scan 30", "units.kx" -> "1/A", "units.energy" -> "eV"))
    val dir = Files.createTempDirectory("nxval").toFile.getPath
    CubeIO.writeNexus(cube, s"$dir/good.nxs")
    assert(CubeIO.validateNexus(s"$dir/good.nxs") === Seq.empty)

    // hand-build violations and check each is reported by name
    def dataGroup(attrs: Map[String, String], axLen: Int = 2) = Hdf5Minimal.Group(
      datasets = Seq(
        Hdf5Minimal.Dataset("data", Hdf5Minimal.I64(Array(1L, 2L, 3L, 4L, 5L, 6L)),
          shape = Some(Seq(2L, 3L))),
        Hdf5Minimal.Dataset("kx", Hdf5Minimal.F64(
          Array.tabulate(axLen)(_.toDouble)), Map("units" -> "1/A")),
        Hdf5Minimal.Dataset("energy", Hdf5Minimal.F64(
          Array(0.0, 1.0, 2.0)), Map("units" -> "eV"))),
      attrs = attrs)
    def write(name: String, entryAttrs: Map[String, String],
        dAttrs: Map[String, String], axLen: Int = 2, definition: String = "NXmpes") = {
      Hdf5Minimal.write(s"$dir/$name", Hdf5Minimal.Group(
        subgroups = Seq("entry" -> Hdf5Minimal.Group(
          datasets = Seq(Hdf5Minimal.Dataset("definition", Hdf5Minimal.Str(definition))),
          subgroups = Seq("data" -> dataGroup(dAttrs, axLen)),
          attrs = entryAttrs)),
        attrs = Map("default" -> "entry")))
      CubeIO.validateNexus(s"$dir/$name")
    }
    val full = Map("NX_class" -> "NXdata", "signal" -> "data",
      "axes" -> "kx:energy", "kx_indices" -> "0", "energy_indices" -> "1")
    val entryOk = Map("NX_class" -> "NXentry", "default" -> "data")

    assert(write("v0.nxs", entryOk, full) === Seq.empty)
    assert(write("v1.nxs", entryOk, full - "signal")
      .exists(_.contains("@signal attribute missing")))
    assert(write("v2.nxs", entryOk, full - "axes")
      .exists(_.contains("@axes attribute missing")))
    assert(write("v3.nxs", entryOk, full - "energy_indices")
      .exists(_.contains("energy_indices attribute missing")))
    assert(write("v4.nxs", entryOk, full + ("kx_indices" -> "7"))
      .exists(_.contains("out of range")))
    assert(write("v5.nxs", entryOk, full, axLen = 5)
      .exists(_.contains("kx has 5 points but signal dim 0 is 2")))
    assert(write("v6.nxs", entryOk, full, definition = "NXarpes")
      .exists(_.contains("must be the string NXmpes")))
    assert(write("v7.nxs", entryOk - "NX_class", full)
      .exists(_.contains("@NX_class must be NXentry")))
    assert(write("v8.nxs", entryOk, full + ("NX_class" -> "NXlog"))
      .exists(_.contains("@NX_class must be NXdata")))
  }

  test("CubeIO sparse round trip via parquet + sidecar") {
    val ax = UniformAxis("value", 10, 0.0, 500.0)
    val hist = Binning.histogram(events, Seq(ax))
    val path = Files.createTempDirectory("sparse").toFile.getPath + "/h"
    CubeIO.writeSparse(hist, Seq(ax), path, Map("units" -> "counts"))
    val (back, meta) = CubeIO.readSparse(spark, path)
    assert(back.agg(sum("cnt")).first().getLong(0) ===
      hist.agg(sum("cnt")).first().getLong(0))
    assert(meta.contains("bin_value") && meta.contains("counts"))
  }
}
