package graft.export

import graft.binning.BinnedCube
import graft.loader.Hdf5Minimal

/** The golden NXmpes fixture: an INDEPENDENT, hand-built statement of
  * the NXmpes tree contract (groups / classes / attrs / datasets per the
  * public NXmpes application definition and the reference's pynxtools
  * template `sed/config/NXmpes_config.json`; conversion entry point
  * `sed/io/nexus.py:13-47`), used double-entry-bookkeeping style:
  * [[CubeIO.writeNexus]] must produce BYTE-IDENTICAL output from
  * [[cube]], and the committed resource `golden_nxmpes.nxs` pins the
  * byte layout across rounds — any writer or HDF5-layout change fails
  * the spec loudly and forces an intentional regeneration.
  *
  * Regenerate (after an INTENTIONAL layout change only):
  * `sbt "Test/runMain graft.export.NexusGolden"`.
  */
object NexusGolden {

  /** The fixture cube: 2×3 (kx, energy) with units, title, start time. */
  val cube: BinnedCube = BinnedCube(
    Seq("kx", "energy"),
    Seq(Array(0.5, 1.5), Array(0.0, 1.0, 2.0)),
    Array(1L, 2L, 3L, 4L, 5L, 6L),
    Seq(2, 3),
    Map("title" -> "golden scan", "start_time" -> "2024-01-01T00:00:00Z",
      "units.kx" -> "1/angstrom", "units.energy" -> "eV", "run" -> "30"))

  /** The expected tree, built by hand — NOT via writeNexus. */
  val tree: Hdf5Minimal.Group = Hdf5Minimal.Group(
    attrs = Map("default" -> "entry"),
    subgroups = Seq("entry" -> Hdf5Minimal.Group(
      attrs = Map("NX_class" -> "NXentry", "default" -> "data"),
      datasets = Seq(
        Hdf5Minimal.Dataset("definition", Hdf5Minimal.Str("NXmpes")),
        Hdf5Minimal.Dataset("title", Hdf5Minimal.Str("golden scan")),
        Hdf5Minimal.Dataset("start_time",
          Hdf5Minimal.Str("2024-01-01T00:00:00Z"))),
      subgroups = Seq(
        "data" -> Hdf5Minimal.Group(
          attrs = Map(
            "NX_class" -> "NXdata",
            "signal" -> "data",
            "axes" -> "kx:energy",
            "kx_indices" -> "0",
            "energy_indices" -> "1",
            "run" -> "30"),
          datasets = Seq(
            Hdf5Minimal.Dataset("data",
              Hdf5Minimal.I64(Array(1L, 2L, 3L, 4L, 5L, 6L)),
              shape = Some(Seq(2L, 3L))),
            Hdf5Minimal.Dataset("kx", Hdf5Minimal.F64(Array(0.5, 1.5)),
              attrs = Map("units" -> "1/angstrom")),
            Hdf5Minimal.Dataset("energy",
              Hdf5Minimal.F64(Array(0.0, 1.0, 2.0)),
              attrs = Map("units" -> "eV")))),
        "user" -> Hdf5Minimal.Group(attrs = Map("NX_class" -> "NXuser")),
        "instrument" -> Hdf5Minimal.Group(
          attrs = Map("NX_class" -> "NXinstrument")),
        "sample" -> Hdf5Minimal.Group(attrs = Map("NX_class" -> "NXsample")),
        "process" -> Hdf5Minimal.Group(
          attrs = Map("NX_class" -> "NXprocess"))))))

  /** Writes the committed resource from the hand-built tree. */
  def main(args: Array[String]): Unit = {
    val out = "src/test/resources/golden_nxmpes.nxs"
    new java.io.File(out).getParentFile.mkdirs()
    Hdf5Minimal.write(out, tree)
    println(s"wrote $out (${new java.io.File(out).length()} bytes)")
  }
}
