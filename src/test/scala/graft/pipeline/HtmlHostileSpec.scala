package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input posture of the HTML tokenizer (the CodecFuzzSpec /
  * Hdf5HostileSpec pattern applied to the crawl pipeline's other
  * untrusted-bytes parser): the extractors run per document on executor
  * JVMs, so an adversarial page must never hang, StackOverflow, blow
  * memory super-linearly, or throw — `computeText`/`computeTitle`/
  * `computeLinks`/`computeMarkdown`/`computeTagTexts` are TOTAL
  * functions of arbitrary strings.
  *
  * No SparkSession needed: the kernels are pure string code.
  */
class HtmlHostileSpec extends AnyFunSuite {

  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })

  /** A hostile parse must terminate quickly and must NOT throw — the
    * extractors are total (unlike the binary codecs, there is no
    * "invalid HTML"). SOE/OOM fail loudly.
    */
  private def total(what: String, timeoutSec: Int = 20)(body: => Any): Unit = {
    val fut = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit =
        try { body; () }
        catch {
          case e: StackOverflowError =>
            fail(s"$what: StackOverflowError", e)
          case e: OutOfMemoryError => fail(s"$what: OutOfMemoryError", e)
          case e: Throwable => fail(s"$what: threw ${e.getClass.getName}", e)
        }
    })
    try fut.get(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true)
        fail(s"$what: did not terminate within $timeoutSec s (spin?)")
    }
  }

  private def allExtractors(s: String): Unit = {
    Html.computeText(s)
    Html.computeTitle(s)
    Html.computeLinks(s)
    Html.computeMarkdown(s)
    Html.computeTagTexts(s, "loc")
  }

  // ---------------- attack table ----------------

  test("attack: unterminated constructs swallow cleanly") {
    for (
      s <- Seq(
        "<!--", "<!-- never closed", "<script>", "<script>var x = '",
        "<title>half", "<a href=\"", "<div", "<", "</", "<!", "<?",
        "&", "&#", "&#x", "&amp", "<p style=\"a>b", "x < y & z",
      )
    ) total(s"unterminated: $s")(allExtractors(s))
    // semantics spot-pins
    assert(Html.computeText("<!-- x") === "")
    assert(Html.computeText("<script>alert(1)") === "")
    assert(Html.computeText("a <b") === "a")
    assert(Html.computeText("x < y & z") === "x < y & z")
  }

  test("attack: almost-matching close tags keep rawTextEnd linear") {
    // 2 MB of "</scrip" prefixes: every position almost-matches the
    // probe — worst case for the scan, must stay O(n · |probe|)
    val s = "<script>" + "</scrip" * 300000 + "x"
    val t0 = System.nanoTime()
    total("rawTextEnd near-miss")(allExtractors(s))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 10.0, f"near-miss scan took $sec%.1f s")
  }

  test("attack: deep nesting does not recurse") {
    // 200k nested tags: the tokenizer is an iterative scan, and
    // markdown's only stack is the <a> href stack (linear memory)
    total("deep div nesting")(allExtractors("<div>" * 200000))
    total("deep a nesting")(allExtractors("<a href=x>" * 200000))
    total("deep close-only")(allExtractors("</b>" * 200000))
  }

  test("attack: entity bombs decode in linear time") {
    val s1 = "&amp;" * 400000
    total("amp run")(assert(Html.computeText(s1) === "&" * 400000))
    val s2 = "&" * 2000000
    total("bare amp run")(assert(Html.computeText(s2) === "&" * 2000000))
    val s3 = "&#x10FFFF;" * 100000
    total("astral run")(Html.computeText(s3))
    // malformed references stay literal; surrogate/oversize refs refuse
    assert(Html.computeText("&#xD800;") === "&#xD800;")
    assert(Html.computeText("&#x110000;") === "&#x110000;")
    assert(Html.computeText("&#99999999999;") === "&#99999999999;")
    assert(Html.computeText("&bogus;") === "&bogus;")
  }

  test("attack: megabyte-scale plain text is near-pass-through") {
    val s = ("lorem ipsum dolor " * 60000) + "<p>tail"
    val t0 = System.nanoTime()
    total("1MB text")(assert(Html.computeText(s).nonEmpty))
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
  }

  test("attack: quoted '>' cannot spoof tag ends, quotes never unclose") {
    assert(Html.computeText("""<p title="a>b">x""") === "x")
    // an unclosed quote swallows the rest of the doc into the tag —
    // browser-adjacent, and must terminate
    total("unclosed quote")(Html.computeText("<p title=\"" + "y" * 500000))
  }

  test("attack: binary garbage and NUL bytes") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val s = new String(Array.fill(4096)(rnd.nextInt(256).toChar))
      total("binary garbage")(allExtractors(s))
    }
    total("NUL-riddled")(allExtractors("a\u0000<b\u0000>c\u0000&d"))
  }

  test("fuzz: 600 random mutations of real-ish markup never throw/hang") {
    val seedDoc = """<!doctype html><html><head><title>T &amp; t</title>
      <script>if (a<b && c>d) {"</s"}</script></head><body>
      <div class="x" data-y='1>2'><h1>Head</h1><p>one &lt;two&gt; three</p>
      <ul><li><a href="/a?b=c&amp;d=e">link</a></li><li>two</li></ul>
      <img src="i.png" alt="alt text"/><table><tr><td>cell</td></tr></table>
      <!-- comment --><loc>https://ex.com/1</loc></div></body></html>"""
    val rnd = new scala.util.Random(42)
    val chars = "<>&;\"'/=!-#x \u0000abcdefgh0123456789".toCharArray
    (0 until 600).foreach { i =>
      val b = seedDoc.toCharArray
      val edits = 1 + rnd.nextInt(12)
      (0 until edits).foreach { _ =>
        b(rnd.nextInt(b.length)) = chars(rnd.nextInt(chars.length))
      }
      total(s"fuzz case $i", 30)(allExtractors(new String(b)))
    }
  }

  test("fuzz: extracted text never contains markup the input escaped") {
    // invariant: computeText of a document whose only '<' are tag-opens
    // yields no '<' at all (tags either parse or swallow; a literal '<'
    // only survives when NOT followed by a tag-ish char, pinned above)
    val docs = Seq(
      "<p>a</p><div>b</div>", "<b>x</b>y<i>z</i>",
      "<script>a<b</script>ok", "<a href='u'>t</a>")
    docs.foreach(d => assert(!Html.computeText(d).contains("<"), d))
  }
}
