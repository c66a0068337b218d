package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing + curation — the provenance side of web-corpus pipelines
  * (RefinedWeb/C4-style): host/domain extraction, path shape, query-param
  * hygiene, and domain blocklists, all as pure codegen'd expressions.
  *
  * Scale design: every extraction is a regexp/split projection inline in
  * the scan (no UDF, no shuffle); the blocklist filter broadcasts the
  * (always small) blocked-domain set, or anti-joins when the list itself
  * is a table. Portable regex subset only (no lookbehind — RE2 engines
  * can't run it), so oracle SQL mirrors term-for-term.
  */
object UrlOps {

  /** Hosts' registered domain, by heuristic: last two labels, or last
    * three when the penultimate label is a common second-level registry
    * label (`co.uk`, `ac.jp`, ... — the bounded public-suffix subset a
    * dependency-free engine can carry; a full PSL swap-in is a literal
    * array away).
    */
  private val secondLevelLabels = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Scheme and host are case-INsensitive (RFC 3986 §3.1/§3.2.2): the
    * scheme match accepts both cases and the host is lowercased, so
    * `HTTP://EVIL.Com` cannot slip past a lowercase blocklist. Paths
    * and query strings keep their case (they are case-sensitive).
    */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1))

  def registeredDomainOf(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    when(n >= 3 && element_at(labels, -2).isin(secondLevelLabels: _*),
      concat_ws(".", element_at(labels, -3), element_at(labels, -2),
        element_at(labels, -1)))
      .otherwise(when(n >= 2,
        concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
        .otherwise(host))
  }

  def pathOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  def queryOf(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Non-empty path segment count (`/a/b/` -> 2, no path -> 0). */
  def pathDepthOf(url: Column): Column =
    size(filter(split(pathOf(url), "/"), s => s =!= lit("")))

  /** Query-parameter count (`?a=1&b=2` -> 2, none -> 0). */
  def paramCountOf(url: Column): Column = {
    val q = queryOf(url)
    when(q === lit(""), lit(0)).otherwise(size(split(q, "&")))
  }

  /** Tracking parameters (utm_*, gclid, fbclid) are stripped; the query
    * string is rebuilt from the surviving params (no `?` when none
    * survive) — URL canonicalization ahead of exact/URL dedup.
    */
  def stripTrackingParams(url: Column): Column = {
    val base = regexp_extract(url, "^([^?#]*)", 1)
    val kept = filter(split(queryOf(url), "&"),
      p => p =!= lit("") && !p.rlike("^(utm_[a-z]+|gclid|fbclid)="))
    when(size(kept) === 0, base)
      .otherwise(concat(base, lit("?"), array_join(kept, "&")))
  }

  /** Append the full parse family: `url_host`, `url_domain`, `url_path`,
    * `path_depth`, `n_params`, `url_clean`. Map-only.
    */
  def urlColumns(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_host", hostOf(u))
      .withColumn("url_domain", registeredDomainOf(col("url_host")))
      .withColumn("url_path", pathOf(u))
      .withColumn("path_depth", pathDepthOf(u))
      .withColumn("n_params", paramCountOf(u))
      .withColumn("url_clean", stripTrackingParams(u))
  }

  /** Drop rows whose registered domain is in `blocked` (a bounded
    * literal set — the common case; broadcast by construction).
    */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    df.filter(!registeredDomainOf(hostOf(col(urlCol))).isin(blocked: _*))

  /** Blocklist as a table: anti-join on registered domain (AQE
    * broadcasts the list side when small; scales to a list too large
    * for a literal).
    */
  def dropBlockedDomainsTable(df: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    require(!df.columns.contains("__dom"),
      "input already has reserved column __dom — rename it first")
    df.withColumn("__dom", registeredDomainOf(hostOf(col(urlCol))))
      .join(blocklist.select(col(domainCol).as("__dom")), Seq("__dom"), "left_anti")
      .drop("__dom")
  }
}
