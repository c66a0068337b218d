package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("urlColumns parses host/domain/path/params on varied shapes") {
    val df = Seq(
      (1L, "https://www.news.example.co.uk/a/b/c?id=1&utm_source=x&q=2"),
      (2L, "http://blog.site.com/post"),
      (3L, "https://bare.org"),
      (4L, "https://host.net/?utm_campaign=only"),
    ).toDF("id", "url")
    val out = UrlOps.urlColumns(df, "url").orderBy("id").collect()

    assert(out(0).getAs[String]("url_host") === "www.news.example.co.uk")
    assert(out(0).getAs[String]("url_domain") === "example.co.uk")
    assert(out(0).getAs[String]("url_path") === "/a/b/c")
    assert(out(0).getAs[Int]("path_depth") === 3)
    assert(out(0).getAs[Int]("n_params") === 3)
    assert(out(0).getAs[String]("url_clean") ===
      "https://www.news.example.co.uk/a/b/c?id=1&q=2")

    assert(out(1).getAs[String]("url_domain") === "site.com")
    assert(out(1).getAs[Int]("path_depth") === 1)
    assert(out(1).getAs[Int]("n_params") === 0)

    assert(out(2).getAs[String]("url_domain") === "bare.org")
    assert(out(2).getAs[String]("url_path") === "")
    assert(out(2).getAs[Int]("path_depth") === 0)

    // every param is tracking -> query dropped entirely, '/' path kept
    assert(out(3).getAs[String]("url_clean") === "https://host.net/")
  }

  test("single-label host falls through to itself as domain") {
    val df = Seq((1L, "http://localhost/x")).toDF("id", "url")
    val r = UrlOps.urlColumns(df, "url").head()
    assert(r.getAs[String]("url_domain") === "localhost")
  }

  test("scheme and host are case-insensitive (RFC 3986): an uppercase" +
      " URL cannot slip past a lowercase blocklist") {
    val df = Seq(
      (1L, "HTTPS://WWW.EVIL.Com/Path?id=1"),
      (2L, "hTtP://Mixed.Spam.CO.UK/x"),
      (3L, "https://fine.org/ok"),
    ).toDF("id", "url")
    val out = UrlOps.urlColumns(df, "url").orderBy("id").collect()
    assert(out(0).getAs[String]("url_host") === "www.evil.com")
    assert(out(0).getAs[String]("url_domain") === "evil.com")
    // the PATH keeps its case — only scheme/host are case-insensitive
    assert(out(0).getAs[String]("url_path") === "/Path")
    assert(out(1).getAs[String]("url_domain") === "spam.co.uk")
    val kept = UrlOps.dropBlockedDomains(df, "url",
      Seq("evil.com", "spam.co.uk")).select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L), "uppercase URLs bypassed the blocklist")
  }

  test("dropBlockedDomains: literal and table variants agree") {
    val df = Seq(
      (1L, "https://a.spam.com/x"),
      (2L, "https://b.ok.org/y"),
      (3L, "https://c.bad.co.uk/z"),
    ).toDF("id", "url")
    val blocked = Seq("spam.com", "bad.co.uk")
    val lit = UrlOps.dropBlockedDomains(df, "url", blocked)
      .select("id").as[Long].collect().sorted
    val tab = UrlOps.dropBlockedDomainsTable(df, "url",
      blocked.toDF("domain"), "domain")
      .select("id").as[Long].collect().sorted
    assert(lit.toSeq === Seq(2L))
    assert(tab.toSeq === lit.toSeq)
  }
}
