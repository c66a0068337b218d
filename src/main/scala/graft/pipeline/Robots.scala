package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt (RFC 9309 Robots Exclusion Protocol) — crawl-politeness
  * filtering for the ingestion pipeline: parse per-domain robots files
  * into rule rows, then filter a URL corpus to the allowed subset.
  *
  * Scope: the RFC core — user-agent groups, `Allow`/`Disallow` rules,
  * comments, longest-match precedence with Allow winning ties, group
  * selection (a specific agent's groups when any exist, else the `*`
  * groups), and the §2.2.3 special characters: `*` matches any character
  * sequence and a trailing `$` anchors the rule at the URL-path end
  * (rules of the shape "Disallow: slash-star-question" or
  * "slash-star.php$"). Plain prefix rules (the vast majority) still
  * match via codegen'd `startsWith`; only rules that actually use
  * `*`/`$` pay a regex.
  *
  * Scale shape: rule tables are domain-bounded and tiny next to the URL
  * corpus → Spark broadcasts them; the decision is one URL-keyed
  * aggregation over the prefix-matched candidates (the corpus never
  * shuffles more than its own matched rule pairs).
  */
object Robots {

  /** One parsed rule line. `allow=false` is a Disallow. */
  case class Rule(agent: String, allow: Boolean, path: String)

  /** Parse one robots.txt body. Group state per RFC 9309: consecutive
    * `User-agent` lines open a group serving all named agents; rule
    * lines bind to the open group; a `User-agent` after rules starts a
    * fresh group. An empty `Disallow:` value means "no restriction" and
    * produces no rule. Unknown directives (Crawl-delay, Sitemap, …) are
    * ignored. Agent names compare case-insensitively (lowercased here).
    */
  def parse(txt: String): Seq[Rule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var agents = List.empty[String]
    var groupOpen = false // true while collecting User-agent lines
    txt.linesIterator.foreach { raw =>
      val line = {
        val hash = raw.indexOf('#')
        (if (hash >= 0) raw.substring(0, hash) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (groupOpen) agents ::= value.toLowerCase(java.util.Locale.ROOT)
            else { agents = List(value.toLowerCase(java.util.Locale.ROOT)); groupOpen = true }
          case "allow" | "disallow" =>
            groupOpen = false
            if (value.nonEmpty && agents.nonEmpty)
              agents.foreach(a => out += Rule(a, key == "allow", value))
          case _ => groupOpen = false
        }
      }
    }
    out.toSeq
  }

  /** Linear-time RFC 9309 wildcard match: does `rule` (literals + `*`
    * any-sequence + optional TRAILING `$` end-anchor) match a PREFIX of
    * `path` (the whole path when anchored)? The classic greedy
    * two-pointer matcher — O(|path|·|rule|) worst case — replaces the
    * Java-regex route in [[filterAllowed]]: a hostile robots.txt rule
    * like `/a*a*a*…a$` compiles to a catastrophic-backtracking
    * `^/a.*a.*…a$` whose evaluation against every URL of the domain is
    * an executor DoS (regex `.*` chains backtrack super-polynomially;
    * robots.txt is UNTRUSTED crawl input). Semantics are identical to
    * the regex form on every well-behaved pattern (spec-pinned).
    */
  def wildcardMatch(path: String, rule: String): Boolean = {
    val anchored = rule.nonEmpty && rule.charAt(rule.length - 1) == '$'
    val pat = if (anchored) rule.substring(0, rule.length - 1) else rule
    val n = path.length
    val m = pat.length
    var ti = 0
    var pi = 0
    var starPi = -1
    var starTi = -1
    while (ti < n) {
      if (!anchored && pi == m) return true // pattern consumed → prefix hit
      if (pi < m && pat.charAt(pi) == '*') { starPi = pi; starTi = ti; pi += 1 }
      else if (pi < m && pat.charAt(pi) == path.charAt(ti)) { pi += 1; ti += 1 }
      else if (starPi >= 0) { starTi += 1; ti = starTi; pi = starPi + 1 }
      else return false
    }
    // path exhausted: remaining pattern must be all-stars (match empty)
    while (pi < m && pat.charAt(pi) == '*') pi += 1
    pi == m
  }

  /** RFC 9309 §2.2.3: `*` in a rule matches any character sequence and a
    * TRAILING `$` anchors the match at the path end (a mid-rule `$` is
    * literal). None for plain prefix rules — the common case, matched
    * with codegen'd `startsWith`; Some(anchored Java regex) otherwise.
    * The regex is emitted for SQL-oracle mirroring; the Spark-side match
    * runs [[wildcardMatch]] (see its DoS note).
    */
  def wildcardRegex(path: String): Option[String] =
    if (!path.contains('*') && !path.endsWith("$")) None
    else {
      val (body, anchored) =
        if (path.endsWith("$")) (path.dropRight(1), true) else (path, false)
      val sb = new StringBuilder("^")
      body.foreach {
        case '*' => sb.append(".*")
        case c =>
          if ("\\.[]{}()<>*+-=!?^$|".indexOf(c.toInt) >= 0) sb.append('\\')
          sb.append(c)
      }
      if (anchored) sb.append('$')
      Some(sb.toString)
    }

  /** Explode a (domain, robotsTxt) frame into rule rows
    * `(…, agent, allow, path, path_len, path_regex)` — `path_regex` is
    * null for plain prefix rules, the compiled-down RFC wildcard pattern
    * otherwise (see [[wildcardRegex]]).
    */
  def rules(df: DataFrame, txtCol: String): DataFrame = {
    val carried = df.schema.fields.filterNot(_.name == txtCol)
    val outSchema = StructType(carried ++ Seq(
      StructField("agent", StringType),
      StructField("allow", IntegerType),
      StructField("path", StringType),
      StructField("path_len", IntegerType),
      StructField("path_regex", StringType),
    ))
    val enc: Encoder[Row] = Encoders.row(outSchema)
    val txtIdx = df.schema.fieldIndex(txtCol)
    val carryIdx = carried.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val carry = carryIdx.map(r.get).toSeq
        val txt = Option(r.getString(txtIdx)).getOrElse("")
        parse(txt).map(rule => Row.fromSeq(carry ++ Seq(rule.agent,
          if (rule.allow) 1 else 0, rule.path, rule.path.length,
          wildcardRegex(rule.path).orNull)))
      }
    }(enc)
  }

  /** Per-URL allow decision for `agent`. `urls` must carry `domainCol`
    * and `pathCol` (see [[UrlOps.urlColumns]]); `ruleTable` is the
    * [[rules]] output with a matching domain column.
    *
    * Selection + precedence in ONE aggregation pass, mirrorable by any
    * SQL engine: per domain the effective group is the specific agent's
    * rules when any exist, else `*`'s; among effective rules whose path
    * prefixes the URL path, the longest wins with Allow beating Disallow
    * at equal length — encoded as `max(path_len * 2 + allow)` so the
    * single integer max carries both keys; no matching rule (or no
    * robots at all) means allowed.
    *
    * The rule table broadcasts (domain-bounded); the only exchange is
    * the URL-keyed aggregate. The aggregate keys on ALL of `urls`'
    * columns, so fully-duplicate input rows collapse to one output row —
    * include a distinct id column when duplicates must survive (or
    * filter distinct `(domain, path)` pairs and semi-join back, as
    * [[Curation.ingestCrawl]] does).
    */
  def filterAllowed(
      urls: DataFrame,
      domainCol: String,
      pathCol: String,
      ruleTable: DataFrame,
      agent: String = "*",
      keepCol: String = "allowed",
  ): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // does the domain define a group for the specific agent?
    val hasSpecific = ruleTable.groupBy(col(domainCol))
      .agg(max(when(col("agent") === a, 1).otherwise(0)).as("_has_spec"))
    val eff = ruleTable.join(hasSpecific, Seq(domainCol))
      .filter(when(col("_has_spec") === 1, col("agent") === a)
        .otherwise(col("agent") === "*"))
      .select(col(domainCol).as("_rdom"), col("allow").as("_ralw"),
        col("path").as("_rpath"), col("path_len").as("_rlen"),
        col("path_regex").as("_rregex"))
    // prefix rules stay on the codegen'd startsWith fast path; wildcard
    // rules run the LINEAR greedy matcher ([[wildcardMatch]]) — never a
    // regex, whose backtracking a hostile robots.txt controls
    val wildcard = org.apache.spark.sql.GraftBridge.column(
      WildcardPathMatch(
        org.apache.spark.sql.GraftBridge.expression(col(pathCol)),
        org.apache.spark.sql.GraftBridge.expression(col("_rpath"))))
    val matches =
      when(col("_rregex").isNotNull, wildcard)
        .otherwise(col(pathCol).startsWith(col("_rpath")))
    val keyed = urls.join(broadcast(eff),
        urls(domainCol) === col("_rdom"), "left")
      .withColumn("_rule_key",
        when(col("_rpath").isNotNull && matches,
          col("_rlen") * 2 + col("_ralw")))
    keyed.groupBy(urls.columns.map(urls(_)): _*)
      .agg(max(col("_rule_key")).as("_best"))
      .withColumn(keepCol,
        (col("_best").isNull || col("_best") % 2 === 1).cast("int"))
      .drop("_best")
  }
}

/** [[Robots.wildcardMatch]] as a codegen predicate `(path, rulePath)` —
  * the guaranteed-linear replacement for regex matching of UNTRUSTED
  * robots.txt wildcard rules (see the matcher's DoS note). Stays inside
  * whole-stage codegen via a static helper call, like
  * [[CachedRegexpLike]].
  */
case class WildcardPathMatch(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs two string inputs, got $other")
    }

  override def nullSafeEval(s: Any, p: Any): Any =
    Robots.wildcardMatch(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val helper = Robots.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (s, p) =>
      s"${ev.value} = $helper.wildcardMatch($s.toString(), $p.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WildcardPathMatch =
    copy(left = newLeft, right = newRight)
}
