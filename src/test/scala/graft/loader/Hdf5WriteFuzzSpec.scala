package graft.loader

import org.scalatest.funsuite.AnyFunSuite

import Hdf5Minimal._

/** Property-random fuzz of the HDF5 WRITE path (the reader has the
  * 8-attack hostile table + bit-flip fuzz; this closes the other half):
  * random cube-ish shapes, chunk grids, deflate levels, attribute sets
  * and group nestings must round-trip bit-exactly through the hardened
  * reader — including the edge-chunk, 1-element, chunk-larger-than-dim
  * and empty-attribute corners a hand-written layout engine gets wrong
  * first.
  */
class Hdf5WriteFuzzSpec extends AnyFunSuite {

  private val dir = java.nio.file.Files.createTempDirectory("h5fuzz").toString

  private def randAttrs(rnd: scala.util.Random): Map[String, String] =
    (0 until rnd.nextInt(4)).map { i =>
      s"a${i}_${rnd.nextInt(100)}" ->
        rnd.alphanumeric.take(rnd.nextInt(40)).mkString
    }.toMap

  test("300 random chunked/contiguous datasets round-trip bit-exactly") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 300).foreach { case i =>
      val rank = 1 + rnd.nextInt(4)
      val dims = Seq.fill(rank)(1L + rnd.nextInt(17))
      val n = dims.product.toInt
      val chunked = rnd.nextBoolean()
      // chunk dims deliberately allowed LARGER than the dataset dims and
      // deliberately non-dividing (edge chunks must clip)
      val chunk =
        if (chunked) Some(dims.map(d => 1L + rnd.nextInt(d.toInt + 3)))
        else None
      val deflate =
        if (chunked && rnd.nextBoolean()) Some(rnd.nextInt(10)) else None
      val isF64 = rnd.nextBoolean()
      val data: Hdf5Data =
        if (isF64) F64(Array.fill(n)(rnd.nextDouble() * 1e6 - 5e5))
        else I64(Array.fill(n)(rnd.nextLong()))
      val ds = Dataset(s"d$i", data, attrs = randAttrs(rnd),
        shape = Some(dims), chunkDims = chunk, deflateLevel = deflate)
      val extraStr =
        if (rnd.nextBoolean())
          Seq(Dataset(s"s$i", Str(rnd.alphanumeric.take(rnd.nextInt(64)).mkString)))
        else Nil
      val root = Group(
        datasets = ds +: extraStr,
        subgroups =
          if (rnd.nextBoolean())
            Seq(s"g$i" -> Group(attrs = randAttrs(rnd)))
          else Nil,
        attrs = randAttrs(rnd))
      val p = s"$dir/f$i.h5"
      Hdf5Minimal.write(p, root)
      val back = Hdf5Minimal.read(p)
      val d = back.dataset(s"d$i")
      assert(d.dims === dims, s"case $i dims")
      assert(d.attrs === ds.attrs, s"case $i attrs")
      data match {
        case F64(v) => assert(d.data.asDoubles.toSeq === v.toSeq, s"case $i")
        case I64(v) => assert(d.data.asLongs.toSeq === v.toSeq, s"case $i")
        case _ => fail("unreachable")
      }
      extraStr.foreach { s0 =>
        assert(back.dataset(s0.name).data === s0.data, s"case $i str")
      }
      assert(back.attrs === root.attrs, s"case $i root attrs")
      root.subgroups.foreach { case (name, g) =>
        assert(back.group(name).attrs === g.attrs, s"case $i subgroup")
      }
    }
  }

  test("fuzzed writes survive the hostile READER checks (no watchdog" +
      " trips on own output)") {
    // our own output must obviously never trip the reader's hostile-
    // input requires — a quick cross-check that hardening did not
    // reject legitimate layouts (deflate level 0 stores an empty-ish
    // stream; 1-element chunks maximize B-tree depth)
    val edge = Seq(
      Dataset("one", I64(Array(42L))),
      Dataset("oneChunk", I64(Array(7L)), shape = Some(Seq(1L)),
        chunkDims = Some(Seq(1L)), deflateLevel = Some(0)),
      Dataset("tiny2d", F64(Array.tabulate(6)(_.toDouble)),
        shape = Some(Seq(2L, 3L)), chunkDims = Some(Seq(1L, 1L)),
        deflateLevel = Some(9)),
      Dataset("empty_attrs", I64(Array(1L, 2L)), attrs = Map.empty),
    )
    val p = s"$dir/edge.h5"
    Hdf5Minimal.write(p, Group(datasets = edge))
    val back = Hdf5Minimal.read(p)
    assert(back.dataset("one").data.asLongs.toSeq === Seq(42L))
    assert(back.dataset("oneChunk").data.asLongs.toSeq === Seq(7L))
    assert(back.dataset("tiny2d").data.asDoubles.toSeq ===
      (0 until 6).map(_.toDouble))
    assert(back.dataset("empty_attrs").data.asLongs.toSeq === Seq(1L, 2L))
  }
}
