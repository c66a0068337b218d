package graft.loader

import java.io.{ByteArrayOutputStream, File}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.{ZipEntry, ZipOutputStream}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** S11 dataset fetcher (`sed/dataset/dataset.py`): layered registry,
  * resumable download (Range/206/416), incremental zip extraction,
  * subdir flattening, registry write-back — end-to-end against a local
  * HTTP server, the same posture as the EPICS client's live test.
  */
class DatasetsSpec extends AnyFunSuite {

  private def mkZip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(1600000000000L)
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Serve `bytes` with HTTP Range support (206 partial / 416 done). */
  private def serve(bytes: Array[Byte], hits: AtomicInteger): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.zip", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val range = Option(ex.getRequestHeaders.getFirst("Range"))
      range match {
        case Some(r) =>
          val from = r.stripPrefix("bytes=").stripSuffix("-").toLong
          if (from >= bytes.length) {
            ex.sendResponseHeaders(416, -1)
          } else {
            val part = bytes.drop(from.toInt)
            ex.sendResponseHeaders(206, part.length)
            ex.getResponseBody.write(part)
          }
        case None =>
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    server
  }

  private def writeRegistry(path: String, url: String,
      extra: String = ""): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path),
      s"""{"Demo": {"url": "$url"$extra},
         |"Test": {"url": "$url"}}""".stripMargin)
  }

  private def fixture(): (String, String, String) = {
    val root = Files.createTempDirectory("ds").toString
    (s"$root/module/datasets.json", s"$root/user/datasets.json", root)
  }

  test("get: download, extract, write-back; second get skips the server") {
    val zip = mkZip("a.txt" -> "alpha", "sub/b.txt" -> "beta")
    val hits = new AtomicInteger(0)
    val server = serve(zip, hits)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.zip"
      val (module, user, root) = fixture()
      writeRegistry(module, url)
      val ds = new Datasets(module, user, s"$root/none.json")
      assert(ds.available === Seq("Demo")) // Test row hidden
      val got = ds.get("Demo", rootDir = Some(root))
      assert(got.dir === Paths.get(root, "datasets", "Demo").toString)
      assert(Files.readString(Paths.get(got.dir, "a.txt")) === "alpha")
      assert(Files.readString(Paths.get(got.dir, "sub/b.txt")) === "beta")
      assert(!Files.exists(Paths.get(got.dir, "Demo.zip"))) // removeZip
      // registry write-back recorded files + instance path
      val saved = graft.config.SedConfig.parse(Paths.get(user))
      val row = saved.get("Demo")
      assert(row.get("data_path").get(0).asText() === got.dir)
      val files = (0 until row.get("files").size())
        .map(row.get("files").get(_).asText())
      assert(files.toSet === Set("a.txt", s"sub${File.separator}b.txt"))
      // all files present → second get never contacts the server
      val before = hits.get()
      val again = ds.get("Demo", rootDir = Some(root))
      assert(again.dir === got.dir)
      assert(hits.get() === before)
    } finally server.stop(0)
  }

  test("download resumes a partial file with Range (206 append)") {
    val zip = mkZip("big.txt" -> ("x" * 5000))
    val hits = new AtomicInteger(0)
    val server = serve(zip, hits)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.zip"
      val dir = Files.createTempDirectory("dl").toString
      val target = new File(dir, "part.zip")
      // simulate an interrupted first download: first half on disk
      Files.write(target.toPath, zip.take(zip.length / 2))
      Datasets.download(url, target)
      assert(Files.readAllBytes(target.toPath).toSeq === zip.toSeq)
      // fully downloaded → 416, file untouched
      Datasets.download(url, target)
      assert(Files.readAllBytes(target.toPath).toSeq === zip.toSeq)
      assert(hits.get() === 2)
    } finally server.stop(0)
  }

  test("extract skips complete entries, rejects zip-slip") {
    val dir = Files.createTempDirectory("ex").toString
    val zipBytes = mkZip("keep.txt" -> "12345", "fresh.txt" -> "abc")
    val zf = new File(dir, "t.zip")
    Files.write(zf.toPath, zipBytes)
    // pre-extract keep.txt with matching size but different content: a
    // complete entry must NOT be overwritten (dataset.py:279-291)
    Files.writeString(Paths.get(dir, "keep.txt"), "54321")
    Datasets.extract(zf, dir)
    assert(Files.readString(Paths.get(dir, "keep.txt")) === "54321")
    assert(Files.readString(Paths.get(dir, "fresh.txt")) === "abc")
    // entry timestamp preserved on the freshly extracted file
    assert(Paths.get(dir, "fresh.txt").toFile.lastModified() === 1600000000000L)
    // zip-slip: ../escape rejected
    val evil = new File(dir, "evil.zip")
    Files.write(evil.toPath, mkZip("../escape.txt" -> "boom"))
    intercept[IllegalArgumentException](Datasets.extract(evil, dir))
  }

  test("a stale over-long partial zip recovers via delete-and-refetch " +
      "(the 416 wedge)") {
    val zip = mkZip("a.txt" -> "alpha")
    val hits = new AtomicInteger(0)
    val server = serve(zip, hits)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.zip"
      val (module, user, root) = fixture()
      writeRegistry(module, url)
      val ds = new Datasets(module, user, s"$root/none.json")
      // plant a corrupt partial LONGER than the remote: resume sends
      // Range past EOF, server answers 416 ("complete"), but the file
      // is not a zip — get() must delete it and fetch fresh
      val dir = Paths.get(root, "datasets", "Demo")
      Files.createDirectories(dir)
      Files.write(dir.resolve("Demo.zip"),
        Array.fill[Byte](zip.length + 100)(0x42))
      val got = ds.get("Demo", rootDir = Some(root))
      assert(Files.readString(Paths.get(got.dir, "a.txt")) === "alpha")
    } finally server.stop(0)
  }

  test("download follows redirects (302 hop to the payload)") {
    val zip = mkZip("r.txt" -> "via-redirect")
    val hits = new AtomicInteger(0)
    val server = serve(zip, hits)
    server.createContext("/moved.zip", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Location", "/data.zip")
      ex.sendResponseHeaders(302, -1)
      ex.close()
    })
    try {
      val dir = Files.createTempDirectory("rd").toString
      val target = new File(dir, "r.zip")
      Datasets.download(
        s"http://127.0.0.1:${server.getAddress.getPort}/moved.zip", target)
      assert(Files.readAllBytes(target.toPath).toSeq === zip.toSeq)
    } finally server.stop(0)
  }

  test("rearrange flattens declared subdirs; missing subdir raises") {
    val zip = mkZip("inner/deep/c.txt" -> "c", "inner/d.txt" -> "d")
    val hits = new AtomicInteger(0)
    val server = serve(zip, hits)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.zip"
      val (module, user, root) = fixture()
      writeRegistry(module, url,
        """, "subdirs": ["inner"], "rearrange_files": true""")
      val ds = new Datasets(module, user, s"$root/none.json")
      val got = ds.get("Demo", rootDir = Some(root))
      assert(Files.readString(Paths.get(got.dir, "c.txt")) === "c")
      assert(Files.readString(Paths.get(got.dir, "d.txt")) === "d")
      assert(!Files.exists(Paths.get(got.dir, "inner")))
      assert(got.subdirs.isEmpty) // flattened → no subdir paths returned
      intercept[java.io.FileNotFoundException](
        Datasets.rearrange(got.dir, Seq("nope")))
    } finally server.stop(0)
  }

  test("remove deletes instances and updates the registry; add/removeEntry") {
    val zip = mkZip("a.txt" -> "a")
    val hits = new AtomicInteger(0)
    val server = serve(zip, hits)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.zip"
      val (module, user, root) = fixture()
      writeRegistry(module, url)
      val ds = new Datasets(module, user, s"$root/none.json")
      val got = ds.get("Demo", rootDir = Some(root))
      assert(Files.exists(Paths.get(got.dir)))
      ds.remove("Demo")
      assert(!Files.exists(Paths.get(got.dir)))
      val saved = graft.config.SedConfig.parse(Paths.get(user))
      assert(saved.get("Demo").get("data_path").size() === 0)
      // add a new row; duplicate add rejected; removeEntry drops it
      val info = graft.config.SedConfig.parseString("""{"url": "http://x/y.zip"}""")
      ds.add("Fresh", info)
      assert(ds.available.contains("Fresh"))
      intercept[IllegalArgumentException](ds.add("Fresh", info))
      ds.removeEntry("Fresh")
      assert(!ds.available.contains("Fresh"))
    } finally server.stop(0)
  }

  test("builtin registry lists the reference's named datasets") {
    val root = Files.createTempDirectory("dsb").toString
    val ds = Datasets.withBuiltinRegistry(
      s"$root/user/datasets.json", s"$root/none.json")
    assert(ds.available.toSet ===
      Set("WSe2", "Gd_W110", "W110", "TaS2", "Au_Mica")) // Test hidden
  }

  test("unknown dataset name raises with the available list") {
    val (module, user, root) = fixture()
    writeRegistry(module, "http://unused/")
    val ds = new Datasets(module, user, s"$root/none.json")
    val e = intercept[IllegalArgumentException](ds.get("Nope"))
    assert(e.getMessage.contains("Available datasets are: Demo"))
  }
}
