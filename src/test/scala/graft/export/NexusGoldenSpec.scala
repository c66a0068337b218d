package graft.export

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.loader.Hdf5Minimal

/** Pins [[CubeIO.writeNexus]] to the committed golden NXmpes fixture
  * (see [[NexusGolden]]): byte layout, tree structure, validator
  * cleanliness, and round-trip — the repo-side half of the pynxtools
  * validation chain the reference runs in Python.
  */
class NexusGoldenSpec extends AnyFunSuite {

  private def goldenBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/golden_nxmpes.nxs")
    assert(in != null, "golden_nxmpes.nxs resource missing")
    try in.readAllBytes() finally in.close()
  }

  private def goldenTemp: String = {
    val p = Files.createTempFile("golden", ".nxs")
    Files.write(p, goldenBytes)
    p.toString
  }

  test("writeNexus output is byte-identical to the golden fixture") {
    val dir = Files.createTempDirectory("nxgold").toString
    CubeIO.writeNexus(NexusGolden.cube, s"$dir/out.nxs")
    val got = Files.readAllBytes(Paths.get(s"$dir/out.nxs"))
    assert(got.length === goldenBytes.length, "file length drifted")
    assert(java.util.Arrays.equals(got, goldenBytes),
      "writeNexus byte layout drifted from the golden NXmpes fixture — " +
        "if intentional, regenerate via Test/runMain graft.export.NexusGolden")
  }

  test("the hand-built golden tree reproduces the committed bytes") {
    val dir = Files.createTempDirectory("nxgold2").toString
    Hdf5Minimal.write(s"$dir/regen.nxs", NexusGolden.tree)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$dir/regen.nxs")), goldenBytes))
  }

  test("golden fixture passes the NXmpes structural validator") {
    assert(CubeIO.validateNexus(goldenTemp) === Seq.empty)
  }

  test("golden fixture passes STRICT application-definition validation;" +
      " semantic corruptions are named") {
    assert(CubeIO.validateNexus(goldenTemp, strict = true) === Seq.empty)
    // corrupt semantically (structure stays valid) and re-validate
    def corrupt(mutate: Hdf5Minimal.Group => Hdf5Minimal.Group): Seq[String] = {
      val entry = Hdf5Minimal.read(goldenTemp).group("entry")
      val out = Files.createTempFile("corrupt", ".nxs").toString
      Hdf5Minimal.write(out, Hdf5Minimal.Group(
        subgroups = Seq("entry" -> mutate(entry)),
        attrs = Map("default" -> "entry")))
      CubeIO.validateNexus(out, strict = true)
    }
    // missing title
    assert(corrupt(e => e.copy(datasets = e.datasets.filterNot(_.name == "title")))
      .exists(_.contains("/entry/title required")))
    // non-ISO start_time
    assert(corrupt(e => e.copy(datasets = e.datasets.map(d =>
      if (d.name == "start_time")
        d.copy(data = Hdf5Minimal.Str("yesterday at noon")) else d)))
      .exists(_.contains("not ISO-8601")))
    // missing sample group
    assert(corrupt(e => e.copy(subgroups = e.subgroups.filterNot(_._1 == "sample")))
      .exists(_.contains("/entry/sample (NXsample) group required")))
    // wrong instrument class
    assert(corrupt(e => e.copy(subgroups = e.subgroups.map { case (n, g) =>
      if (n == "instrument") n -> g.copy(attrs = g.attrs + ("NX_class" -> "NXcollection"))
      else n -> g }))
      .exists(_.contains("instrument@NX_class must be NXinstrument")))
    // energy axis with momentum units: unit-category violation
    assert(corrupt(e => e.copy(subgroups = e.subgroups.map { case (n, g) =>
      if (n == "data") n -> g.copy(datasets = g.datasets.map(d =>
        if (d.name == "energy") d.copy(attrs = d.attrs + ("units" -> "1/A"))
        else d))
      else n -> g }))
      .exists(_.contains("not a valid unit for the energy axis")))
  }

  test("golden fixture carries the NXmpes template group set") {
    val root = Hdf5Minimal.read(goldenTemp)
    val entry = root.group("entry")
    // the group/class pairs pynxtools' NXmpes template creates
    // (reference sed/config/NXmpes_config.json)
    Seq("user" -> "NXuser", "instrument" -> "NXinstrument",
      "sample" -> "NXsample", "process" -> "NXprocess",
      "data" -> "NXdata").foreach { case (name, cls) =>
      assert(entry.hasChild(name), s"missing /entry/$name")
      assert(entry.group(name).attrs.get("NX_class").contains(cls),
        s"/entry/$name NX_class")
    }
    assert(entry.dataset("start_time").data ===
      Hdf5Minimal.Str("2024-01-01T00:00:00Z"))
  }

  test("readNexus round-trips the golden fixture to the fixture cube") {
    val back = CubeIO.readNexus(goldenTemp)
    assert(back.data.toSeq === NexusGolden.cube.data.toSeq)
    assert(back.shape === NexusGolden.cube.shape)
    assert(back.axisNames === NexusGolden.cube.axisNames)
    assert(back.axes.map(_.toSeq) === NexusGolden.cube.axes.map(_.toSeq))
    assert(back.attrs === NexusGolden.cube.attrs)
  }
}
