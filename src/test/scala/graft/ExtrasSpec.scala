package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.binning.{BinnedCube, UniformAxis}
import graft.config.SedConfig
import graft.export.Tiff

class ExtrasSpec extends SparkSpec {

  test("Tiff round trip: 2-D image and 3-D stack") {
    val dir = Files.createTempDirectory("tiff").toFile.getPath
    val img = Array.tabulate(6 * 4)(_.toFloat)
    Tiff.write(s"$dir/a.tif", img, 1, 6, 4)
    val (d1, s1, r1, c1) = Tiff.read(s"$dir/a.tif")
    assert((s1, r1, c1) === ((1, 6, 4)))
    assert(d1.toSeq === img.toSeq)
    val stack = Array.tabulate(3 * 5 * 2)(i => i * 0.5f)
    Tiff.write(s"$dir/b.tif", stack, 3, 5, 2)
    val (d2, s2, r2, c2) = Tiff.read(s"$dir/b.tif")
    assert((s2, r2, c2) === ((3, 5, 2)))
    assert(d2.toSeq === stack.toSeq)
  }

  test("Tiff.writeCube flattens leading dims into the stack") {
    val cube = BinnedCube(
      Seq("z", "y", "x"),
      Seq(Array(0.0, 1.0), Array(0.0, 1.0, 2.0), Array(0.0, 1.0)),
      Array.tabulate(12)(_.toLong),
      Seq(2, 3, 2))
    val path = Files.createTempDirectory("tiffc").toFile.getPath + "/c.tif"
    Tiff.writeCube(cube, path)
    val (d, s, r, c) = Tiff.read(path)
    assert((s, r, c) === ((2, 3, 2)))
    assert(d.toSeq === cube.data.map(_.toFloat).toSeq)
  }

  test("SedConfig layered deep merge with higher layers winning") {
    val dir = Files.createTempDirectory("cfg")
    val default = dir.resolve("default.json")
    val user = dir.resolve("user.json")
    Files.writeString(default,
      """{"dataframe": {"x_column": "X", "tof_column": "t"},
        | "binning": {"num_cores": 4}}""".stripMargin)
    Files.writeString(user,
      """{"dataframe": {"x_column": "Xm"}, "energy": {"scale": "kinetic"}}""")
    val cfg = SedConfig.load(Seq(default.toString, user.toString,
      dir.resolve("missing.json").toString))
    assert(SedConfig.getString(cfg, "dataframe.x_column") === "Xm") // overridden
    assert(SedConfig.getString(cfg, "dataframe.tof_column") === "t") // preserved
    assert(SedConfig.getInt(cfg, "binning.num_cores") === 4)
    assert(SedConfig.getString(cfg, "energy.scale") === "kinetic")
    assert(SedConfig.getString(cfg, "nope.deep", "dflt") === "dflt")
    intercept[NoSuchElementException] { SedConfig.getString(cfg, "nope.deep") }
  }

  test("@alias axis indirection resolves through the dataframe section") {
    val cfg = SedConfig.parseString(
      """{"dataframe": {"energy_column": "energy"}}""")
    assert(SedConfig.resolveAxis(cfg, "@energy") === "energy")
    assert(SedConfig.resolveAxis(cfg, "kx") === "kx")
  }

  test("selectSlice sums over the sliced axis and drops the dimension") {
    val cube = BinnedCube(
      Seq("a", "b"),
      Seq(Array(0.0, 1.0, 2.0), Array(0.0, 1.0)),
      Array(1, 2, 3, 4, 5, 6), // a0:(1,2) a1:(3,4) a2:(5,6)
      Seq(3, 2))
    val s = cube.selectSlice("a", 1, 3)
    assert(s.shape === Seq(2))
    assert(s.data.toSeq === Seq(8L, 10L))
    val sb = cube.selectSlice("b", 0, 1)
    assert(sb.data.toSeq === Seq(1L, 3L, 5L))
  }

  test("binData pivots per-category histograms into a traces matrix") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ax = UniformAxis("value", 25, 0.0, 500.0)
    val (cats, traces) = Diagnostics.binData(df, col("event_type"), ax)
    assert(cats.length === 5)
    assert(traces.forall(_.length === 25))
    // total mass equals the plain histogram's
    val total = binning.Binning.histogram(df, Seq(ax))
      .agg(sum("cnt")).first().getLong(0)
    assert(traces.map(_.sum).sum === total.toDouble)
  }

  test("viewEventHistogram returns per-column centers and counts") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = Diagnostics.viewEventHistogram(df,
      Seq(UniformAxis("value", 10, 0.0, 500.0),
        UniformAxis("user_id", 10, 0.0, 150.0)))
    assert(out.keySet === Set("value", "user_id"))
    assert(out("value")._1.length === 10)
    assert(out("value")._2.sum > 0)
  }
}
