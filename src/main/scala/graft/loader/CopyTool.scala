package graft.loader

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession

/** S10 — the reference's `CopyTool` (`sed/loader/mirrorutil.py:18-238`):
  * mirror a file tree from a (slow, networked) source root into a fast
  * staging root before loading, skipping files whose destination copy
  * already exists with the same size.
  *
  * Spark-first re-expression: the reference fans 25 dask thread tasks
  * out on one machine; here the copy task list distributes over the
  * cluster (one Spark task per `ntasks` slice), and every path goes
  * through the Hadoop `FileSystem` layer, so the same tool stages
  * `file://` ↔ `hdfs://` ↔ `s3a://` trees — at 100 TB the mirror IS a
  * distributed ingest job, not a driver loop. The session's
  * `spark.hadoop.*` configuration ships to the tasks (credentials,
  * endpoints) exactly like the loaders' file reads.
  *
  * Reference semantics kept: destination tree mirrors the source path
  * RELATIVE to `sourceRoot` (a source outside `sourceRoot` is an
  * error); size-equality skip unless `forceCopy`; free-space check with
  * a safety margin before copying (best-effort — object stores don't
  * report capacity); 0775 directories / 0664 files with an optional
  * group, applied best-effort (`sed/loader/mirrorutil.py:320-361`).
  * Divergence: `cleanupOldestScan` never blocks on stdin — with
  * `force = false` it only REPORTS the deletion candidate (the
  * reference interactively prompts, `mirrorutil.py:194-238`); age is
  * modification time (ctime is not portable across Hadoop filesystems).
  */
class CopyTool(
    spark: SparkSession,
    sourceRoot: String,
    destRoot: String,
    safetyMarginBytes: Long = 1L << 30,
    ntasks: Int = 25,
    group: Option[String] = None,
) {
  import CopyTool._

  private def conf: Configuration = spark.sparkContext.hadoopConfiguration

  /** Mirror `source` (a file or directory under `sourceRoot`) into the
    * destination tree. Returns the mapped destination path (directory
    * for a directory source, file for a file source).
    *
    * Failure window: stale destinations (wrong size / `forceCopy`) are
    * deleted driver-side BEFORE the distributed copy (required for
    * speculative-execution safety — see the in-body comment), so a job
    * that dies mid-copy leaves those files missing rather than stale.
    * A RERUN HEALS the tree: the size-equality skip re-copies exactly
    * the missing/mismatched files. Treat a failed `copy()` as "staging
    * incomplete — rerun", never as "previous staging still intact".
    */
  def copy(source: String, forceCopy: Boolean = false): String = {
    val srcFs = new Path(source).getFileSystem(conf)
    val src = srcFs.makeQualified(new Path(source))
    // one metadata round trip for the source (the source root is the
    // SLOW filesystem this tool exists for — every extra status call is
    // a remote HEAD)
    val srcStatus = try srcFs.getFileStatus(src) catch {
      case _: java.io.FileNotFoundException =>
        throw new IllegalArgumentException(s"Source not found: $source")
    }
    val rootQ = srcFs.makeQualified(new Path(sourceRoot))
    val rel = relativize(rootQ, if (srcStatus.isFile) src.getParent else src)
    val destFs = new Path(destRoot).getFileSystem(conf)
    val ddir = destFs.makeQualified(
      if (rel.isEmpty) new Path(destRoot) else new Path(destRoot, rel))

    val files: Seq[(Path, Long)] =
      if (srcStatus.isFile) Seq(src -> srcStatus.getLen)
      else {
        val it = srcFs.listFiles(src, true)
        val b = Seq.newBuilder[(Path, Long)]
        while (it.hasNext) { val s = it.next(); b += (s.getPath -> s.getLen) }
        b.result()
      }
    require(files.nonEmpty, s"No files found at path: $source")

    val srcBase = if (srcStatus.isFile) src.getParent else src
    val tasks = files.map { case (p, len) =>
      val destFile = new Path(ddir, relativize(srcBase, p))
      (p.toString, destFile.toString, len)
    }
    val toCopy = tasks.filter { case (_, d, len) =>
      val dp = new Path(d)
      forceCopy || !destFs.exists(dp) || destFs.getFileStatus(dp).getLen != len
    }

    if (toCopy.nonEmpty) {
      // free-space check (mirrorutil.py:102-120): create the dest root
      // FIRST so the probe sees a real directory (a local-FS probe of a
      // nonexistent path reports 0 free — which must mean "disk full",
      // not "skip the check"); filesystems that don't report capacity
      // (object stores: the default getStatus says Long.MaxValue) skip
      val needed = toCopy.map(_._3).sum -
        toCopy.map { case (_, d, _) =>
          val dp = new Path(d)
          if (destFs.exists(dp)) destFs.getFileStatus(dp).getLen else 0L
        }.sum
      destFs.mkdirs(new Path(destRoot), new FsPermission("775"))
      val remaining = try destFs.getStatus(new Path(destRoot)).getRemaining
        catch { case _: Exception => Long.MaxValue }
      if (remaining < Long.MaxValue && needed > remaining - safetyMarginBytes)
        throw new java.io.IOException(
          f"Target disk full, only ${remaining / gb}%.2f GB free, but " +
            f"${needed / gb}%.2f GB needed!")

      // create the directory skeleton driver-side (cheap metadata ops),
      // then distribute the byte copies
      val dirPerm = new FsPermission("775")
      toCopy.map(t => new Path(t._2).getParent).distinct.foreach { d =>
        destFs.mkdirs(d, dirPerm)
        applyMeta(destFs, d, dirPerm, group)
      }
      // stale destinations (wrong size, or forceCopy) are deleted ONCE,
      // driver-side, before the distributed copy. A per-attempt "take
      // ownership" delete is unsafe under speculative execution: a
      // losing attempt could delete the winner's just-committed file
      // and then be killed before its own rename, leaving NO
      // destination file after a run that reports success.
      toCopy.foreach { case (_, d, _) =>
        val dp = new Path(d)
        if (destFs.exists(dp)) {
          // a DIRECTORY at a destination file path (foreign content, or
          // a mis-mapped tree) must be a named driver-side error: a
          // non-recursive delete of a non-empty dir returns false (or
          // throws) — and if it were left standing, the executors'
          // rename would fail with exists(dp)=true and the task would
          // report success WITHOUT having copied anything
          val st = destFs.getFileStatus(dp)
          if (st.isDirectory) throw new java.io.IOException(
            s"Destination $dp is a directory; refusing to replace it " +
              "with a file — remove it first")
          if (!destFs.delete(dp, false)) throw new java.io.IOException(
            s"Could not delete stale destination $dp")
        }
      }
      val confBox = spark.sparkContext.broadcast(
        org.apache.spark.GraftSparkBridge.hadoopConfBox(spark.sparkContext))
      val grp = group
      val slices = math.max(1, math.min(ntasks, toCopy.size))
      spark.sparkContext.parallelize(toCopy, slices).foreach {
        case (s, d, _) =>
          val c = confBox.value.value
          val sp = new Path(s); val dp = new Path(d)
          val sfs = sp.getFileSystem(c); val dfs = dp.getFileSystem(c)
          // bytes land on an ATTEMPT-keyed temp name, never the final
          // one (the TfRecord commit posture): two speculative attempts
          // never interleave writes into one file, and a crashed task
          // leaves only `._tmp.` litter — not a partial file under the
          // final name that the size-equality skip could later keep
          val tc = org.apache.spark.TaskContext.get()
          val attempt = if (tc == null) 0L else tc.taskAttemptId()
          val tmp = new Path(dp.getParent, s"._tmp.${dp.getName}.$attempt")
          val in = sfs.open(sp)
          val out = dfs.create(tmp, true)
          try {
            val buf = new Array[Byte](1 << 20)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally { in.close(); out.close() }
          // rename-first commit: never delete the final name here — a
          // rename that fails because the destination exists means a
          // sibling attempt committed the identical copy first
          if (!dfs.rename(tmp, dp)) {
            if (dfs.exists(dp)) dfs.delete(tmp, false)
            else throw new java.io.IOException(s"could not commit $dp")
          }
          applyMeta(dfs, dp, new FsPermission("664"), grp)
      }
      // driver-side epilogue: sweep attempt litter from killed tasks
      toCopy.map(t => new Path(t._2).getParent).distinct.foreach { d =>
        destFs.listStatus(d).foreach { st =>
          if (st.isFile && st.getPath.getName.startsWith("._tmp."))
            destFs.delete(st.getPath, false)
        }
      }
    }
    // cached status: no second metadata round trip to the (slow) source
    // FS, and no spurious FileNotFound if the source vanished mid-copy
    if (srcStatus.isFile) new Path(ddir, src.getName).toString
    else ddir.toString
  }

  /** Total byte size under a directory (`mirrorutil.py:173-192`). */
  def size(dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var s = 0L
    while (it.hasNext) s += it.next().getLen
    s
  }

  /** Leaf directories of the destination tree, oldest (by modification
    * time) first, with their sizes — the `report = true` listing of
    * `cleanup_oldest_scan` (`mirrorutil.py:194-238`).
    */
  def scanReport(): Seq[ScanEntry] = {
    val root = new Path(destRoot)
    val fs = root.getFileSystem(conf)
    def leaves(p: Path): Seq[Path] = {
      val subdirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      if (subdirs.isEmpty) Seq(p) else subdirs.toIndexedSeq.flatMap(leaves)
    }
    if (!fs.exists(root)) return Seq.empty
    // the root itself is NEVER a scan candidate — a flat destination
    // (files straight under destRoot, no subdirs) must not offer the
    // whole staging tree for deletion (the reference's leaf-walk would;
    // deliberate divergence)
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .toIndexedSeq.flatMap(leaves)
      .map(p => ScanEntry(p.toString,
        fs.getFileStatus(p).getModificationTime, size(p.toString)))
      .sortBy(_.modifiedMs)
  }

  /** Remove the oldest non-empty scan directory when `force = true`;
    * with `force = false` only return the candidate (the reference
    * prompts interactively — a library cannot). Raises if no non-empty
    * scan exists, like the reference.
    */
  def cleanupOldestScan(force: Boolean = false): ScanEntry = {
    val oldest = scanReport().find(_.bytes > 0).getOrElse(
      throw new java.io.FileNotFoundException(
        "No scan with data found to remove!"))
    if (force) {
      val p = new Path(oldest.path)
      p.getFileSystem(conf).delete(p, true)
    }
    oldest
  }
}

object CopyTool {
  private val gb = (1L << 30).toDouble

  /** One destination leaf directory in [[CopyTool.scanReport]]. */
  final case class ScanEntry(path: String, modifiedMs: Long, bytes: Long)

  /** `p` relative to `base` (both qualified); empty for `p == base`.
    * A path outside `base` is an error (`mirrorutil.py:271-304`).
    */
  private def relativize(base: Path, p: Path): String = {
    require(base.toUri.getScheme == p.toUri.getScheme &&
      base.toUri.getAuthority == p.toUri.getAuthority,
      s"$p and $base live on different filesystems")
    val b = base.toUri.getPath.stripSuffix("/")
    val s = p.toUri.getPath.stripSuffix("/")
    require(s == b || s.startsWith(b + "/"),
      s"$p needs to be inside of $base!")
    s.stripPrefix(b).stripPrefix("/")
  }

  /** Best-effort permission + group application: staging targets range
    * from POSIX scratch (where this matters, `mirrorutil.py:320-361`) to
    * object stores (where it is meaningless and may throw).
    */
  private def applyMeta(fs: FileSystem, p: Path, perm: FsPermission,
      group: Option[String]): Unit = {
    try fs.setPermission(p, perm) catch { case _: Exception => }
    group.foreach(g => try fs.setOwner(p, null, g) catch {
      case _: Exception =>
    })
  }
}
