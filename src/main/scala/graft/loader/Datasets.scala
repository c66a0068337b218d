package graft.loader

import java.io.{File, FileOutputStream}
import java.net.{HttpURLConnection, URL}
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.config.SedConfig

/** S11 — the reference's `dataset` module (`sed/dataset/dataset.py`):
  * named-dataset fetch / extract / cache, driven by a layered JSON
  * registry (module defaults ≺ user ≺ working-folder — the same
  * precedence `DatasetsManager.load_datasets_dict` builds,
  * `dataset.py:36-56`).
  *
  * Semantics kept from the reference:
  *  - registry entries `{url, subdirs?, rearrange_files?, files?,
  *    data_path?}`; `available` hides the `Test` entry
  *    (`dataset.py:109-118`);
  *  - `get` reuses an existing instance unless `useExisting = false`,
  *    skips the download when every recorded file is already present,
  *    resumes partial downloads with an HTTP `Range` header (416 ⇒
  *    already complete, 206 ⇒ append — `dataset.py:222-267`), extracts
  *    only missing/size-mismatched zip entries preserving entry
  *    timestamps (`dataset.py:269-309`), optionally flattens declared
  *    subdirs into the root (`dataset.py:311-337`), and writes the file
  *    list + data path back to the USER registry (`dataset.py:366-377`);
  *  - `remove` deletes one or all instances and updates the registry
  *    (`dataset.py:384-414`); `add`/`removeEntry` manage registry rows
  *    (`dataset.py:58-95`).
  *
  * This is a driver-side utility by design (one zip per dataset); the
  * fetched files then enter the DISTRIBUTED path through the loaders.
  * No progress bars — callers get the returned state instead.
  */
class Datasets(
    moduleRegistry: String,
    userRegistry: String,
    folderRegistry: String = "./datasets.json",
) {
  import Datasets._

  private def registry(): ObjectNode = {
    // first touch copies the module defaults to the user file
    // (dataset.py:47-49), so later write-backs have a base to merge into
    if (!Files.exists(Paths.get(userRegistry)) &&
        Files.exists(Paths.get(moduleRegistry))) {
      Files.createDirectories(Paths.get(userRegistry).toAbsolutePath.getParent)
      Files.copy(Paths.get(moduleRegistry), Paths.get(userRegistry))
    }
    SedConfig.load(Seq(moduleRegistry, userRegistry, folderRegistry))
      .asInstanceOf[ObjectNode]
  }

  /** Names offered for fetching; the `Test` fixture row is hidden like
    * the reference's (`dataset.py:109-118`). */
  def available: Seq[String] =
    registry().fieldNames.asScala.toSeq.filterNot(_ == "Test")

  /** Fetch `name` into `rootDir/datasets/<name>` (or an existing
    * instance), returning the resolved state. */
  def get(
      name: String,
      rootDir: Option[String] = None,
      useExisting: Boolean = true,
      removeZip: Boolean = true,
  ): Fetched = {
    val reg = registry()
    require(reg.has(name),
      s"Data '$name' is not available for fetching.\n" +
        s"Available datasets are: ${available.mkString(", ")}")
    val state = reg.get(name).deepCopy[ObjectNode]()
    val existing = strings(state, "data_path")
    val dir =
      if (useExisting && existing.nonEmpty) existing.head
      else Paths.get(rootDir.getOrElse("."), "datasets", name)
        .toAbsolutePath.toString
    Files.createDirectories(Paths.get(dir))

    val wanted = strings(state, "files")
    val present = fileList(dir)
    if (wanted.isEmpty || !wanted.forall(present.contains)) {
      val url = Option(state.get("url")).map(_.asText()).getOrElse(
        throw new IllegalArgumentException(s"registry row $name has no url"))
      val zip = new File(dir, s"$name.zip")
      download(url, zip)
      // a stale partial that is >= the remote size answers 416 ("already
      // complete") yet is not a readable zip — delete it and fetch fresh
      // once instead of wedging every retry on the same corrupt file
      if (!zipReadable(zip)) {
        zip.delete()
        download(url, zip)
      }
      extract(zip, dir)
      if (state.path("rearrange_files").asBoolean(false))
        rearrange(dir, strings(state, "subdirs"))
      if (removeZip) zip.delete()
      // write-back (dataset.py:366-377): recorded files + instance path
      val mapper = SedConfig.parseString("{}").asInstanceOf[ObjectNode]
      val row = mapper.putObject(name)
      state.properties().asScala.foreach(e => row.set[JsonNode](e.getKey, e.getValue))
      setStrings(row, "files", fileList(dir))
      setStrings(row, "data_path", (existing :+ dir).distinct)
      SedConfig.save(mapper, userRegistry)
    }
    val subdirs = strings(state, "subdirs")
      .filterNot(_ => state.path("rearrange_files").asBoolean(false))
      .map(s => new File(dir, s).getPath)
    Fetched(dir, subdirs)
  }

  /** Delete one instance directory (or all) and update the registry
    * (`dataset.py:384-414`). */
  def remove(name: String, instance: String = "all"): Unit = {
    val reg = registry()
    require(reg.has(name), s"unknown dataset $name")
    val state = reg.get(name).deepCopy[ObjectNode]()
    val existing = strings(state, "data_path")
    if (existing.isEmpty) return
    val victims = if (instance == "all") existing
      else existing.filter(_ == instance)
    victims.foreach { p =>
      val f = Paths.get(p)
      if (Files.exists(f)) deleteRecursively(f.toFile)
    }
    val mapper = SedConfig.parseString("{}").asInstanceOf[ObjectNode]
    val row = mapper.putObject(name)
    state.properties().asScala.foreach(e => row.set[JsonNode](e.getKey, e.getValue))
    setStrings(row, "data_path", existing.diff(victims))
    SedConfig.save(mapper, userRegistry)
  }

  /** Register a new dataset row in the user registry; rejects existing
    * names like the reference (`dataset.py:58-80`). */
  def add(name: String, info: JsonNode): Unit = {
    require(!registry().has(name),
      s"Dataset $name already exists in datasets.json.")
    val root = SedConfig.parseString("{}").asInstanceOf[ObjectNode]
    root.set[JsonNode](name, info)
    SedConfig.save(root, userRegistry)
  }

  /** Drop a dataset row from the user registry (`dataset.py:82-95`). */
  def removeEntry(name: String): Unit = {
    val p = Paths.get(userRegistry)
    if (!Files.exists(p)) return
    val node = SedConfig.parse(p).asInstanceOf[ObjectNode]
    node.remove(name)
    SedConfig.save(node, userRegistry, overwrite = true)
  }
}

object Datasets {

  /** Resolved fetch result: the instance directory and any declared
    * (un-flattened) subdirectories. */
  final case class Fetched(dir: String, subdirs: Seq[String])

  /** The reference's bundled registry (`sed/dataset/datasets.json`):
    * the named public datasets its tutorials fetch. The `Test` row is
    * the fixture entry `available` hides, kept for parity.
    */
  val builtinRegistryJson: String =
    """{
      |  "WSe2": {
      |    "url": "https://zenodo.org/record/6369728/files/WSe2.zip",
      |    "subdirs": ["Scan049_1", "energycal_2019_01_08"]
      |  },
      |  "Gd_W110": {
      |    "url": "https://zenodo.org/records/10658470/files/single_event_data.zip",
      |    "subdirs": ["analysis_data", "calibration_data"],
      |    "rearrange_files": true
      |  },
      |  "W110": {
      |    "url": "https://zenodo.org/records/12609441/files/single_event_data.zip",
      |    "subdirs": ["analysis_data", "calibration_data"],
      |    "rearrange_files": true
      |  },
      |  "TaS2": {
      |    "url": "https://zenodo.org/records/10160182/files/TaS2.zip",
      |    "subdirs": ["Scan0121_1", "energycal_2020_07_20"]
      |  },
      |  "Au_Mica": {
      |    "url": "https://zenodo.org/records/13952965/files/Au_Mica_SXP.zip"
      |  },
      |  "Test": {
      |    "url": "http://test.com/files/file.zip",
      |    "subdirs": ["subdir"],
      |    "rearrange_files": true
      |  }
      |}""".stripMargin

  /** A [[Datasets]] backed by the bundled registry: the builtin JSON is
    * materialized once under the user registry's directory (as the
    * module layer), so `datasets.get("WSe2")`-style calls work out of
    * the box like the reference's `from sed.dataset import datasets`.
    */
  def withBuiltinRegistry(
      userRegistry: String,
      folderRegistry: String = "./datasets.json",
  ): Datasets = {
    val dir = Paths.get(userRegistry).toAbsolutePath.getParent
    Files.createDirectories(dir)
    val module = dir.resolve("datasets.builtin.json")
    if (!Files.exists(module))
      Files.writeString(module, builtinRegistryJson)
    new Datasets(module.toString, userRegistry, folderRegistry)
  }

  private def strings(n: ObjectNode, field: String): Seq[String] =
    Option(n.get(field)).toSeq.flatMap(_.elements().asScala.map(_.asText()))

  private def setStrings(n: ObjectNode, field: String, v: Seq[String]): Unit = {
    val arr = n.putArray(field)
    v.foreach(arr.add)
  }

  /** Relative paths of the non-hidden, non-zip files under `dir`
    * (`dataset.py:199-220`). */
  def fileList(dir: String): Seq[String] = {
    val base = Paths.get(dir)
    if (!Files.exists(base)) return Seq.empty
    val out = Seq.newBuilder[String]
    Files.walk(base).iterator().asScala.foreach { p =>
      val f = p.toFile
      if (f.isFile && !f.getName.startsWith(".") &&
          !f.getName.endsWith(".zip"))
        out += base.relativize(p).toString
    }
    out.result().sorted
  }

  /** Whether the file parses as a zip archive (central directory reads). */
  private[loader] def zipReadable(f: File): Boolean =
    f.exists() && (try { new ZipFile(f).close(); true } catch {
      case _: Exception => false
    })

  /** Resumable download: an existing partial file continues via an HTTP
    * `Range` header — 416 means already complete, 206 appends, 200
    * restarts (`dataset.py:222-267`). Redirects are followed manually
    * (up to 5, cross-protocol included — `HttpURLConnection` refuses
    * http→https hops that dataset hosts commonly serve).
    */
  private[loader] def download(url: String, target: File): Unit = {
    val have = if (target.exists()) target.length() else 0L
    var current = url
    var hops = 0
    while (hops <= 5) {
      val conn = new URL(current).openConnection().asInstanceOf[HttpURLConnection]
      conn.setInstanceFollowRedirects(false)
      try {
        if (have > 0) conn.setRequestProperty("Range", s"bytes=$have-")
        conn.connect()
        val code = conn.getResponseCode
        if (code == 301 || code == 302 || code == 303 || code == 307 ||
            code == 308) {
          val loc = Option(conn.getHeaderField("Location")).getOrElse(
            throw new java.io.IOException(s"redirect without Location: $current"))
          current = new URL(new URL(current), loc).toString
          hops += 1
        } else if (code == 416) {
          return // fully downloaded
        } else {
          require(code == 200 || code == 206, s"GET $current failed: HTTP $code")
          val append = code == 206 && have > 0
          val in = conn.getInputStream
          val out = new FileOutputStream(target, append)
          try {
            val buf = new Array[Byte](1 << 15)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally { out.close(); in.close() }
          return
        }
      } finally conn.disconnect()
    }
    throw new java.io.IOException(s"too many redirects fetching $url")
  }

  /** Extract missing / size-mismatched entries, preserving each entry's
    * recorded timestamp (`dataset.py:269-309`). */
  private[loader] def extract(zip: File, dir: String): Unit = {
    val zf = new ZipFile(zip)
    try {
      zf.entries().asScala.foreach { e =>
        val target = new File(dir, e.getName)
        // zip-slip guard: entry must stay inside dir
        require(target.getCanonicalPath.startsWith(
          new File(dir).getCanonicalPath + File.separator) ||
          target.getCanonicalPath == new File(dir).getCanonicalPath,
          s"zip entry escapes target dir: ${e.getName}")
        if (e.isDirectory) target.mkdirs()
        else if (!target.exists() || target.length() != e.getSize) {
          Option(target.getParentFile).foreach(_.mkdirs())
          val in = zf.getInputStream(e)
          val out = new FileOutputStream(target)
          try {
            val buf = new Array[Byte](1 << 15)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally { out.close(); in.close() }
          if (e.getTime > 0) target.setLastModified(e.getTime)
        }
      }
    } finally zf.close()
  }

  /** Flatten declared subdirs into the root (`dataset.py:311-337`);
    * a missing subdir is an error like the reference's. */
  private[loader] def rearrange(dir: String, subdirs: Seq[String]): Unit =
    subdirs.foreach { sub =>
      val src = new File(dir, sub)
      if (!src.isDirectory)
        throw new java.io.FileNotFoundException(s"Subdirectory $sub not found.")
      Files.walk(src.toPath).iterator().asScala
        .filter(_.toFile.isFile)
        .foreach { p =>
          Files.move(p, Paths.get(dir, p.getFileName.toString),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      deleteRecursively(src)
    }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
