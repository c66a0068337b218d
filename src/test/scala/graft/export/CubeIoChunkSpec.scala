package graft.export

import org.scalatest.funsuite.AnyFunSuite

/** Pins the compressed-export chunk sizing — the overflow cases need
  * multi-GB cubes to exercise end-to-end, so the math is tested pure
  * (the round-trips incl. edge chunks live in Hdf5Spec).
  */
class CubeIoChunkSpec extends AnyFunSuite {

  private def nChunks(head: Long, sliceElems: Long): Long = {
    val rows = CubeIO.chunkRows(head, sliceElems)
    (head + rows - 1) / rows
  }

  test("~1 MiB slabs in the common shapes") {
    assert(CubeIO.chunkRows(100, 400) === 100) // whole cube in one chunk
    assert(CubeIO.chunkRows(10000, 4096) === 32) // 2^17 / 4096
    assert(CubeIO.chunkRows(10000, 1) === 10000)
  }

  test("long first axes clamp to the 4096-chunk B-tree cap") {
    // the review case: 8200×256×256 → target 2 rows = 4100 chunks > cap
    assert(nChunks(8200, 65536L) <= 4096)
    // sliceElems past 2^17 → target 1 row = head chunks without the clamp
    assert(nChunks(50000, 200000L) <= 4096)
    assert(nChunks(1L << 22, 1L) <= 4096)
    // clamp never produces zero-row chunks and covers the full axis
    Seq((1L, 1L), (4096L, 131072L), (4097L, 131072L), (123457L, 999L))
      .foreach { case (h, se) =>
        val r = CubeIO.chunkRows(h, se)
        assert(r >= 1 && nChunks(h, se) <= 4096, s"head=$h slice=$se")
      }
  }
}
