package graft.loader

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** S10 CopyTool (`sed/loader/mirrorutil.py`): tree mirroring with
  * size-skip semantics, distributed through Spark tasks over the Hadoop
  * FS layer.
  */
class CopyToolSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def write(dir: String, rel: String, content: String): String = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p.toString
  }

  test("mirrors a directory tree and maps the relative path") {
    val src = tmp("ct_src"); val dst = tmp("ct_dst")
    write(src, "scan1/a.txt", "alpha")
    write(src, "scan1/sub/b.txt", "beta")
    write(src, "scan2/c.txt", "gamma")
    val ct = new CopyTool(spark, src, dst)
    val mapped = ct.copy(s"$src/scan1")
    assert(Paths.get(mapped).toString === Paths.get(dst, "scan1").toString ||
      mapped.endsWith("/scan1"))
    assert(Files.readString(Paths.get(dst, "scan1/a.txt")) === "alpha")
    assert(Files.readString(Paths.get(dst, "scan1/sub/b.txt")) === "beta")
    assert(!Files.exists(Paths.get(dst, "scan2/c.txt"))) // only scan1 asked
  }

  test("skips same-size files, recopies on size change or forceCopy") {
    val src = tmp("ct_src2"); val dst = tmp("ct_dst2")
    write(src, "scan/a.txt", "12345")
    val ct = new CopyTool(spark, src, dst)
    ct.copy(s"$src/scan")
    val destFile = Paths.get(dst, "scan/a.txt")
    // plant a marker: a skipped copy must leave the dest bytes alone
    Files.writeString(destFile, "54321") // same size, different content
    ct.copy(s"$src/scan")
    assert(Files.readString(destFile) === "54321", "same-size file recopied")
    // size change → recopy
    write(src, "scan/a.txt", "1234567")
    ct.copy(s"$src/scan")
    assert(Files.readString(destFile) === "1234567")
    // forceCopy → recopy even at same size
    Files.writeString(destFile, "7654321")
    ct.copy(s"$src/scan", forceCopy = true)
    assert(Files.readString(destFile) === "1234567")
  }

  test("commit posture: copies land via attempt temp + rename, no" +
      " ._tmp. litter survives, and stale litter is swept") {
    val src = tmp("ct_src_tmp"); val dst = tmp("ct_dst_tmp")
    write(src, "scan/a.txt", "alpha")
    write(src, "scan/sub/b.txt", "beta")
    // plant stale litter from a hypothetical killed attempt — the
    // driver epilogue must sweep it after a copy touching that dir
    Files.createDirectories(Paths.get(dst, "scan"))
    Files.writeString(Paths.get(dst, "scan/._tmp.a.txt.99"), "junk")
    val ct = new CopyTool(spark, src, dst)
    ct.copy(s"$src/scan")
    assert(Files.readString(Paths.get(dst, "scan/a.txt")) === "alpha")
    assert(Files.readString(Paths.get(dst, "scan/sub/b.txt")) === "beta")
    val leftovers = Files.walk(Paths.get(dst)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("._tmp.")).toSeq
    assert(leftovers.isEmpty, leftovers.mkString(", "))
  }

  test("a non-empty DIRECTORY at a destination file path is a named" +
      " driver-side error, not a silent no-copy success") {
    val src = tmp("ct_srcdir"); val dst = tmp("ct_dstdir")
    write(src, "scan/a.txt", "alpha-longer") // size differs from any dir len
    // plant a non-empty directory exactly where the FILE must land
    write(dst, "scan/a.txt/nested.txt", "squatter")
    val ct = new CopyTool(spark, src, dst)
    val e = intercept[java.io.IOException](ct.copy(s"$src/scan"))
    assert(e.getMessage.contains("is a directory"), e.getMessage)
    // the squatter survives untouched — refusal, not partial demolition
    assert(Files.readString(Paths.get(dst, "scan/a.txt/nested.txt"))
      === "squatter")
  }

  test("single-file copy returns the mapped file path") {
    val src = tmp("ct_src3"); val dst = tmp("ct_dst3")
    val f = write(src, "run/only.dat", "payload")
    val ct = new CopyTool(spark, src, dst)
    val mapped = ct.copy(f)
    assert(mapped.endsWith("run/only.dat"))
    assert(Files.readString(Paths.get(dst, "run/only.dat")) === "payload")
  }

  test("source outside the source root and missing source fail loudly") {
    val src = tmp("ct_src4"); val dst = tmp("ct_dst4")
    val other = tmp("ct_other")
    write(other, "x.txt", "x")
    val ct = new CopyTool(spark, src, dst)
    intercept[IllegalArgumentException](ct.copy(other))
    intercept[IllegalArgumentException](ct.copy(s"$src/nope"))
  }

  test("size, scanReport ordering, and oldest-scan cleanup") {
    val src = tmp("ct_src5"); val dst = tmp("ct_dst5")
    write(src, "old/a.bin", "aa")
    write(src, "new/b.bin", "bbbb")
    val ct = new CopyTool(spark, src, dst)
    ct.copy(s"$src/old")
    ct.copy(s"$src/new")
    assert(ct.size(dst) === 6L)
    // age the 'old' scan so modification-time ordering is deterministic
    val oldDir = Paths.get(dst, "old")
    Files.setLastModifiedTime(oldDir,
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    val report = ct.scanReport()
    assert(report.size === 2)
    assert(report.head.path.endsWith("/old"))
    assert(report.head.bytes === 2L)
    // force = false: only reports the candidate
    val candidate = ct.cleanupOldestScan()
    assert(candidate.path.endsWith("/old"))
    assert(Files.exists(oldDir))
    // force = true: removes it
    ct.cleanupOldestScan(force = true)
    assert(!Files.exists(oldDir))
    assert(Files.exists(Paths.get(dst, "new/b.bin")))
    // with only empty scans left after deletion, a missing-data cleanup
    // raises like the reference
    ct.cleanupOldestScan(force = true) // removes 'new'
    intercept[java.io.FileNotFoundException](ct.cleanupOldestScan())
  }

  test("a flat destination (files straight under destRoot) is never a " +
      "deletion candidate") {
    val src = tmp("ct_src7"); val dst = tmp("ct_dst7")
    // file directly under the source root maps straight into destRoot
    val f = write(src, "only.dat", "data")
    val ct = new CopyTool(spark, src, dst)
    ct.copy(f)
    assert(Files.exists(Paths.get(dst, "only.dat")))
    // no scan subdirectories → nothing to report, nothing to delete
    assert(ct.scanReport().isEmpty)
    intercept[java.io.FileNotFoundException](ct.cleanupOldestScan(force = true))
    assert(Files.exists(Paths.get(dst, "only.dat")), "staging root deleted!")
  }

  test("safety margin: an impossible margin fails before copying") {
    val src = tmp("ct_src6"); val dst = tmp("ct_dst6")
    write(src, "scan/a.txt", "data")
    val ct = new CopyTool(spark, src, dst, safetyMarginBytes = Long.MaxValue)
    intercept[java.io.IOException](ct.copy(s"$src/scan"))
  }
}
