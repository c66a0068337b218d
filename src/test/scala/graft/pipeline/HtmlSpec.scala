package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML → text extraction kernel: exact-semantics unit coverage plus the
  * column-level surfaces ([[Html.htmlColumns]], [[Html.links]]).
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String = Html.computeText(html)

  test("block tags become line breaks, inline tags vanish") {
    assert(x("<p>one</p><p>two</p>") === "one\ntwo")
    assert(x("ab<b>cd</b>ef") === "abcdef")
    assert(x("ab <b>cd</b> ef") === "ab cd ef")
    assert(x("<div>a<span>b</span>c</div>") === "abc")
    assert(x("a<br>b<br/>c") === "a\nb\nc")
    assert(x("<ul><li>alpha</li><li>beta</li></ul>") === "alpha\nbeta")
    assert(x("<h1>Title</h1>Body") === "Title\nBody")
  }

  test("whitespace collapses within lines; empty lines drop") {
    assert(x("  a \t\n b  ") === "a b")
    assert(x("<p>  </p><p>x</p>") === "x")
    assert(x("<p>a</p>\n\n  <p>b</p>") === "a\nb")
    assert(x("") === "")
    assert(x("   \n\t ") === "")
  }

  test("script/style/title/noscript content drops entirely") {
    assert(x("<title>T</title>text") === "text")
    assert(x("""<script>var s = "<p>not text</p>";</script>after""") === "after")
    assert(x("<style>p { color: red; }</style>after") === "after")
    assert(x("<SCRIPT>x</SCRIPT>ok") === "ok")
    // close tag requires a real terminator — "</scripts>" is not "</script>"
    assert(x("<script>a</scripts>b</script>c") === "c")
    // unterminated raw-text element swallows the rest (browser behavior)
    assert(x("before<script>var x = 1;") === "before")
    // self-closing raw-text tag has no content
    assert(x("<script/>ok") === "ok")
  }

  test("comments and directives drop") {
    assert(x("a<!-- <p>hidden</p> -->b") === "ab")
    assert(x("<!-- unterminated comment") === "")
    assert(x("<!DOCTYPE html><p>x</p>") === "x")
    assert(x("<?xml version=\"1.0\"?>x") === "x")
  }

  test("quote-aware attribute scanning: '>' inside quotes does not close the tag") {
    assert(x("""<a href="x>y">link</a>""") === "link")
    assert(x("""<img alt='a > b'>text""") === "text")
  }

  test("entities decode; malformed references stay literal") {
    assert(x("a&amp;b") === "a&b")
    assert(x("&lt;p&gt; is not a tag") === "<p> is not a tag")
    assert(x("&quot;q&quot; &apos;a&apos;") === "\"q\" 'a'")
    assert(x("a&nbsp;&nbsp;b") === "a b") // nbsp → space → collapses
    assert(x("&#65;&#x42;") === "AB")
    assert(x("&#x1F600;") === new String(Character.toChars(0x1F600)))
    assert(x("AT&T and R&D") === "AT&T and R&D") // no semicolon → literal
    assert(x("&bogus;") === "&bogus;") // unknown name → literal
    assert(x("&#xZZ;") === "&#xZZ;") // bad number → literal
    assert(x("5 &lt 6") === "5 &lt 6") // unterminated → literal
  }

  test("stray '<' that is not a tag stays literal") {
    assert(x("5 < 6") === "5 < 6")
    assert(x("a < b < c") === "a < b < c")
  }

  test("title extraction") {
    assert(Html.computeTitle("<html><head><title> My   Page </title></head></html>")
      === "My Page")
    assert(Html.computeTitle("<title>A &amp; B</title>") === "A & B")
    assert(Html.computeTitle("<p>no title</p>") === null)
    // first title wins
    assert(Html.computeTitle("<title>one</title><title>two</title>") === "one")
  }

  test("link extraction: quoted, unquoted, entity-decoded, empties dropped") {
    val html =
      """<a href="https://a.com/x">A</a>
        |<a class=c href='https://b.com/y'>B</a>
        |<a href=https://c.com/z>C</a>
        |<a href="">empty</a>
        |<a name="anchor">no href</a>
        |<a href="https://d.com/?a=1&amp;b=2">D</a>""".stripMargin
    assert(Html.computeLinks(html).toSeq === Seq(
      "https://a.com/x", "https://b.com/y", "https://c.com/z",
      "https://d.com/?a=1&b=2"))
  }

  test("a realistic page end-to-end") {
    val html =
      """<!DOCTYPE html>
        |<html><head><title>Widgets — Home</title>
        |<style>body { margin: 0; }</style>
        |<script src="app.js"></script></head>
        |<body>
        |<header><nav><a href="/home">Home</a> <a href="/about">About</a></nav></header>
        |<h1>Widget   Catalog</h1>
        |<!-- TODO: pagination -->
        |<p>We sell <b>many</b> widgets &amp; gadgets.</p>
        |<ul><li>small</li><li>large &#8212; XL</li></ul>
        |<script>analytics.track("<div>");</script>
        |<footer>&copy; 2026</footer>
        |</body></html>""".stripMargin
    assert(x(html) ===
      "Home About\nWidget Catalog\nWe sell many widgets & gadgets.\n" +
        "small\nlarge " + "—" + " XL\n&copy; 2026")
    assert(Html.computeTitle(html) === "Widgets — Home")
    assert(Html.computeLinks(html).toSeq === Seq("/home", "/about"))
  }

  test("htmlColumns: map-only projection over a frame; nulls propagate") {
    val df = Seq(
      (1L, "<html><head><title>T1</title></head><body><p>hello <b>world</b></p>" +
        "<a href='u1'>l</a><a href='u2'>l</a></body></html>"),
      (2L, "plain text, no markup"),
      (3L, null.asInstanceOf[String]),
    ).toDF("doc_id", "html")
    val out = Html.htmlColumns(df, "html")
      .select("doc_id", "plain_text", "html_title", "n_links")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1)
    // the two anchors contribute their own (inline) text after the <p> break
    assert(out(0) === ((1L, "hello world\nll", "T1", 2L)))
    assert(out(1) === ((2L, "plain text, no markup", null, 0L)))
    assert(out(2) === ((3L, null, null, -1L)))
  }

  test("kernel agrees between interpreted eval and codegen paths") {
    val fixtures = Seq(
      "<p>a</p><script>x</script>b &amp; c",
      "<ul><li>1</li><li>2</li></ul>",
      "plain",
      "<a href=\"u?x=1&amp;y=2\">t</a><title> T </title>",
      "5 < 6 &bogus; &#65;",
    )
    val df = fixtures.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    // codegen path (projection) vs driver-side compute
    val viaPlan = df.select(col("id"), Html.extractText(col("html")).as("t"),
      Html.title(col("html")).as("ti"), Html.links(col("html")).as("l"))
      .collect().sortBy(_.getLong(0))
    fixtures.zipWithIndex.foreach { case (h, i) =>
      val r = viaPlan(i)
      assert(r.getString(1) === Html.computeText(h), s"text mismatch on $h")
      val expectTitle = Html.computeTitle(h)
      assert((if (r.isNullAt(2)) null else r.getString(2)) === expectTitle)
      assert(r.getSeq[String](3).toSeq === Html.computeLinks(h).toSeq)
    }
  }

  test("links compose with UrlOps parsing/canonicalization") {
    val df = Seq((1L,
      "<a href='https://ex.com/a/b?utm_source=x&amp;q=1'>z</a>"))
      .toDF("doc_id", "html")
    val row = df.select(explode(Html.links(col("html"))).as("url"))
      .select(UrlOps.hostOf(col("url")).as("h"),
        UrlOps.stripTrackingParams(col("url")).as("c"))
      .head()
    assert(row.getString(0) === "ex.com")
    assert(row.getString(1) === "https://ex.com/a/b?q=1")
  }

  private def md(html: String): String = Html.computeMarkdown(html)

  test("markdown: headings, emphasis, links, lists, images") {
    assert(md("<h1>Top</h1><h3>Sub</h3>") === "# Top\n### Sub")
    assert(md("<p>a <b>bold</b> word</p>") === "a **bold** word")
    assert(md("<p><i>it</i> and <code>x=1</code></p>") === "*it* and `x=1`")
    assert(md("""<a href="https://e.com/p">text</a>""") === "[text](https://e.com/p)")
    assert(md("<ul><li>one</li><li>two</li></ul>") === "- one\n- two")
    assert(md("""<img alt="pic" src="i.png">after""") === "![pic](i.png)after")
    assert(md("<h2>T</h2><p>see <a href='u'>ref</a>.</p><ul><li>x</li></ul>") ===
      "## T\nsee [ref](u).\n- x")
  }

  test("markdown: stray/unbalanced tags never crash or emit orphan markers") {
    assert(md("plain </b> close") === "plain close")
    assert(md("</a>x") === "x")
    assert(md("<b>unclosed") === "**unclosed")
    assert(md("<li></li><li>y</li>") === "-\n- y")
    assert(md("<a>no href</a>") === "[no href]()")
    // nested emphasis + link
    assert(md("<b><a href='u'>both</a></b>") === "**[both](u)**")
  }

  test("markdown shares text semantics: raw-text drop, entities, whitespace") {
    assert(md("<script>x</script><p>a &amp; b</p>") === "a & b")
    assert(md("<title>t</title><h1>  spaced   out </h1>") === "# spaced out")
  }

  test("tagTexts: sitemap <loc> and RSS fields extract in document order") {
    val sitemap =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://e.com/a</loc><lastmod>2026-01-01</lastmod></url>
        |  <url><loc> https://e.com/b?x=1&amp;y=2 </loc></url>
        |  <url><loc></loc></url>
        |</urlset>""".stripMargin
    assert(Html.computeTagTexts(sitemap, "loc").toSeq ===
      Seq("https://e.com/a", "https://e.com/b?x=1&y=2", ""))
    assert(Html.computeTagTexts(sitemap, "lastmod").toSeq === Seq("2026-01-01"))
    val rss = "<rss><channel><title>Feed</title><item><title>Post &amp; 1" +
      "</title><link>https://e.com/p1</link></item></channel></rss>"
    // title is a raw-text element — captured via the raw-text path
    assert(Html.computeTagTexts(rss, "title").toSeq === Seq("Feed", "Post & 1"))
    assert(Html.computeTagTexts(rss, "link").toSeq === Seq("https://e.com/p1"))
    assert(Html.computeTagTexts(rss, "missing").toSeq === Seq())
    // column surface round-trips through codegen
    val viaPlan = Seq(Tuple1(sitemap)).toDF("xml")
      .select(explode(Html.tagTexts(col("xml"), "loc")).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(viaPlan === Seq("https://e.com/a", "https://e.com/b?x=1&y=2", ""))
  }

  test("extraction survives hostile input without blowup") {
    val hostile = Seq(
      "<", "<<<<", "<a", "<a href=\"unterminated", "&", "&amp", "&#;",
      "<script>", "<!---->", "<!--", "<>" * 1000,
      ("<div>" * 500) + "x" + ("</div>" * 500),
    )
    hostile.foreach { h =>
      val t = Html.computeText(h) // must terminate, not throw
      assert(t != null)
      Html.computeTitle(h)
      Html.computeLinks(h)
    }
    assert(x(("<div>" * 500) + "x" + ("</div>" * 500)) === "x")
  }
}
