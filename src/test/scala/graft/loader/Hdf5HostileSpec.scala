package graft.loader

import org.scalatest.funsuite.AnyFunSuite

import Hdf5Minimal._

/** Hostile-input posture of the hand-written HDF5 binary parser (the
  * AviSpec/GifSpec pattern applied to the 960-line reader): lying
  * addresses, cyclic B-trees, overflowing dataspace dims, truncated
  * structures — each attack must fail with a NAMED error, and random
  * corruption must never hang, StackOverflow, or mis-parse silently
  * into a different dataset.
  *
  * No SparkSession needed: the reader is pure byte-array code.
  */
class Hdf5HostileSpec extends AnyFunSuite {

  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })

  /** Watchdog (CodecFuzzSpec's `bounded`): a fuzzed parse must FAIL on a
    * spin, not wedge the suite; SOE/OOM inside count as failures too.
    */
  private def bounded(what: String)(body: => Any): Boolean = {
    val fut = pool.submit(new java.util.concurrent.Callable[Boolean] {
      def call(): Boolean =
        try { body; true }
        catch {
          case _: StackOverflowError =>
            fail(s"$what: StackOverflowError on fuzzed input")
          case _: OutOfMemoryError =>
            fail(s"$what: OutOfMemoryError on fuzzed input")
          case _: Throwable => false // loud failure is fine
        }
    })
    try fut.get(20, java.util.concurrent.TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true)
        fail(s"$what: parse did not terminate within 20 s (spin?)")
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  private def patchLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** All offsets of an ASCII tag in the file. */
  private def tagOffsets(b: Array[Byte], tag: String): Seq[Int] = {
    val t = tag.getBytes("US-ASCII")
    (0 to b.length - t.length).filter(i => t.indices.forall(j => b(i + j) == t(j)))
  }

  private def flatFile: Array[Byte] = writeBytes(Group(datasets = Seq(
    Dataset("d", F64(Array.tabulate(7)(_ * 1.5)), Map("Name" -> "d")))))

  private def chunkedFile: Array[Byte] = writeBytes(Group(
    datasets = Seq(Dataset("c", I64(Array.tabulate(10)(_.toLong)),
      chunkDims = Some(Seq(4L)), deflateLevel = Some(6))),
    subgroups = Seq("g" -> Group(datasets = Seq(
      Dataset("inner", I32(Array(1, 2, 3)))))),
  ))

  test("truncated superblock names the failure") {
    val e = intercept[IllegalArgumentException](parse(flatFile.take(50)))
    assert(e.getMessage.contains("truncated superblock"))
  }

  test("lying root header address fails bounds-checked, not wrapped") {
    val b = flatFile
    // v0 superblock: root symbol-table entry at 56, header address at +8
    patchLong(b, 64, Long.MaxValue - 5)
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("outside file"))
    val b2 = flatFile
    patchLong(b2, 64, -3L)
    val e2 = intercept[IllegalArgumentException](parse(b2))
    assert(e2.getMessage.contains("outside file"))
  }

  test("cyclic group B-tree fails with a named depth error, not" +
      " StackOverflow") {
    val b = flatFile
    // the flat file has exactly one group TREE node (type byte 0)
    val tree = tagOffsets(b, "TREE").find(o => b(o + 4) == 0).get
    b(tree + 5) = 1 // claim an internal level → children parsed as nodes
    patchLong(b, tree + 24 + 8, tree.toLong) // first child → itself
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("cyclic"), e.getMessage)
  }

  test("cyclic chunk B-tree fails with a named depth error") {
    val b = chunkedFile
    val tree = tagOffsets(b, "TREE").find(o => b(o + 4) == 1).get
    b(tree + 5) = 1
    // chunk keySize = 8 + 8*ndims (ndims = rank+1 = 2) = 24; first child
    // pointer sits at node+24 (entries) + keySize
    patchLong(b, tree + 24 + 24, tree.toLong)
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("cyclic"), e.getMessage)
  }

  test("negative chunk-key offset is rejected before the copy") {
    val b = chunkedFile
    val tree = tagOffsets(b, "TREE").find(o => b(o + 4) == 1).get
    // second entry's first element offset: node header 24 + one entry
    // (keySize 24 + child 8) + key header 8
    patchLong(b, tree + 24 + 32 + 8, -1L)
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("negative chunk offset"), e.getMessage)
  }

  test("overflowing dataspace dims fail the 2 GiB bound, not wrap") {
    val b = flatFile
    // the 7-element dataspace dim is the only LE long 7 in the file
    val off = (0 to b.length - 8).find { i =>
      b(i) == 7 && (1 until 8).forall(j => b(i + j) == 0)
    }.get
    patchLong(b, off, 0x2000000000000000L) // product * 8 wraps Long
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("2 GiB"), e.getMessage)
  }

  test("chunk stored-size past EOF fails bounds-checked") {
    val b = chunkedFile
    val tree = tagOffsets(b, "TREE").find(o => b(o + 4) == 1).get
    // first key's stored size (u32 at entry start)
    b(tree + 24) = 0xff.toByte; b(tree + 25) = 0xff.toByte
    b(tree + 26) = 0xff.toByte; b(tree + 27) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("outside file"), e.getMessage)
  }

  test("corrupt deflate chunk names the dataset, never spins") {
    val b = chunkedFile
    // find a chunk payload: first TREE of type 1, first entry's child addr
    val tree = tagOffsets(b, "TREE").find(o => b(o + 4) == 1).get
    var child = 0L
    var i = 0
    while (i < 8) { child |= (b(tree + 24 + 24 + i).toLong & 0xff) << (8 * i); i += 1 }
    // zlib header + first data bytes → garbage
    (0 until 8).foreach(j => b(child.toInt + j) = 0x55.toByte)
    val e = intercept[IllegalArgumentException](parse(b))
    assert(e.getMessage.contains("dataset c"), e.getMessage)
  }

  test("truncations at every 32-byte boundary fail loudly, never hang") {
    val full = chunkedFile
    (8 until full.length by 32).foreach { cut =>
      intercept[Exception](parse(full.take(cut)))
    }
  }

  test("random bit-flip fuzz: parse always terminates — success or a loud" +
      " exception, never StackOverflow or a hang") {
    val rnd = new scala.util.Random(20260816L)
    val corpus = Seq(flatFile, chunkedFile)
    var parsed = 0
    var failedLoud = 0
    (0 until 600).foreach { _ =>
      val base = corpus(rnd.nextInt(corpus.length))
      val b = base.clone()
      val flips = 1 + rnd.nextInt(8)
      (0 until flips).foreach { _ =>
        // keep the signature intact so the parser gets past the gate
        val pos = 8 + rnd.nextInt(b.length - 8)
        b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      }
      if (bounded(s"fuzz case")(parse(b))) parsed += 1 else failedLoud += 1
    }
    // the split is corruption-dependent; both outcomes must occur (a
    // fuzzer whose every run still parses isn't reaching the parser)
    assert(failedLoud > 0)
    assert(parsed + failedLoud === 600)
  }

  test("fletcher32 matches the H5checksum.c algorithm on pinned vectors") {
    // expected values computed with an independent (Python) mirror of
    // H5_checksum_fletcher32: 16-bit big-endian words, 360-word blocks,
    // odd byte high-padded
    def f(s: Array[Byte]): Int = Hdf5Minimal.fletcher32(s, s.length)
    assert(f("abcde".getBytes("UTF-8")) === 0x4ff029c7)
    assert(f("abcdef".getBytes("UTF-8")) === 0x50562a2d)
    assert(f("abcdefgh".getBytes("UTF-8")) === 0xe1eb9195)
    // >360-word input exercises the block-reduction path
    val big = Array.tabulate(2560)(i => (i % 256).toByte)
    assert(f(big) === 0xf0fa827d)
    assert(f(Array.emptyByteArray) === 0)
  }

  test("defilter verifies fletcher32: valid passes, corrupt chunk is a" +
      " named error, pre-1.6.3 byte-reversed checksum accepted") {
    val data = Array.tabulate(100)(i => (i * 7).toByte)
    val sum = Hdf5Minimal.fletcher32(data, data.length)
    def withChecksum(cksum: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOf(data, data.length + 4)
      out(data.length) = (cksum & 0xff).toByte
      out(data.length + 1) = ((cksum >> 8) & 0xff).toByte
      out(data.length + 2) = ((cksum >> 16) & 0xff).toByte
      out(data.length + 3) = ((cksum >>> 24) & 0xff).toByte
      out
    }
    val filters = Seq(Hdf5Minimal.Filter(3, Nil))
    assert(Hdf5Minimal.defilter(withChecksum(sum), filters, 0,
      data.length, "d").toSeq === data.toSeq)
    // hdf5 ≤1.6.2 stored the checksum byte-reversed
    assert(Hdf5Minimal.defilter(withChecksum(Integer.reverseBytes(sum)),
      filters, 0, data.length, "d").toSeq === data.toSeq)
    val corrupt = withChecksum(sum)
    corrupt(13) = (corrupt(13) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException] {
      Hdf5Minimal.defilter(corrupt, filters, 0, data.length, "d")
    }
    assert(e.getMessage.contains("fletcher32 checksum mismatch"))
    // filter-mask bit set = filter skipped at write time: no verify
    assert(Hdf5Minimal.defilter(corrupt, filters, 1,
      corrupt.length, "d").toSeq === corrupt.toSeq)
  }
}
