package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** robots.txt parsing + longest-match URL filtering. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: groups, comments, multi-agent groups, unknown directives") {
    val txt =
      """# global rules
        |User-agent: *
        |Disallow: /private
        |Allow: /private/ok   # inline comment
        |Crawl-delay: 10
        |
        |User-agent: botA
        |User-agent: botB
        |Disallow: /
        |
        |Sitemap: https://e.com/sitemap.xml
        |User-agent: BotC
        |Disallow:
        |""".stripMargin
    val rules = Robots.parse(txt)
    assert(rules === Seq(
      Robots.Rule("*", allow = false, "/private"),
      Robots.Rule("*", allow = true, "/private/ok"),
      Robots.Rule("botb", allow = false, "/"),
      Robots.Rule("bota", allow = false, "/"),
    )) // empty Disallow for BotC yields no rule; agents lowercased
  }

  test("parse: a User-agent line after rules starts a NEW group") {
    val txt = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert(Robots.parse(txt) === Seq(
      Robots.Rule("a", allow = false, "/x"),
      Robots.Rule("b", allow = false, "/y")))
  }

  test("filterAllowed: longest match wins, Allow beats Disallow on ties") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\nDisallow: /p/ok"),
      ("b.com", "User-agent: *\nDisallow: /"),
    ).toDF("domain", "robots")
    val rules = Robots.rules(robots, "robots")
    val urls = Seq(
      (1L, "a.com", "/p/ok/page"), // Allow /p/ok (7·2+1) ties Disallow /p/ok (7·2+0) → allow
      (2L, "a.com", "/p/no"),      // Disallow /p → blocked
      (3L, "a.com", "/other"),     // no rule matches → allowed
      (4L, "b.com", "/anything"),  // Disallow / → blocked
      (5L, "c.com", "/x"),         // no robots at all → allowed
    ).toDF("doc_id", "domain", "path")
    val out = Robots.filterAllowed(urls, "domain", "path", rules)
      .select("doc_id", "allowed").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1))
  }

  test("filterAllowed: specific-agent groups shadow the * group entirely") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /\nUser-agent: niceBot\nDisallow: /secret"),
    ).toDF("domain", "robots")
    val rules = Robots.rules(robots, "robots")
    val urls = Seq((1L, "a.com", "/page"), (2L, "a.com", "/secret/x"))
      .toDF("doc_id", "domain", "path")
    // as nicebot: only the specific group applies — /page allowed
    val asBot = Robots.filterAllowed(urls, "domain", "path", rules, "NiceBot")
      .select("doc_id", "allowed").as[(Long, Int)].collect().toMap
    assert(asBot === Map(1L -> 1, 2L -> 0))
    // as anyone else: the * group blocks everything
    val asStar = Robots.filterAllowed(urls, "domain", "path", rules)
      .select("doc_id", "allowed").as[(Long, Int)].collect().toMap
    assert(asStar === Map(1L -> 0, 2L -> 0))
  }

  test("RFC 9309 §2.2.3 wildcards: '*' spans segments, trailing '$' anchors") {
    assert(Robots.wildcardRegex("/plain/prefix") === None)
    assert(Robots.wildcardRegex("/*?") === Some("^/.*\\?"))
    assert(Robots.wildcardRegex("/*.php$") === Some("^/.*\\.php$"))
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /*?\nDisallow: /*.php$\n" +
        "Allow: /shop/*.php$\nDisallow: /tmp$"),
    ).toDF("domain", "robots")
    val rules = Robots.rules(robots, "robots")
    val urls = Seq(
      (1L, "a.com", "/page?id=3"),      // /*? → blocked
      (2L, "a.com", "/page"),           // nothing matches → allowed
      (3L, "a.com", "/x/run.php"),      // /*.php$ → blocked
      (4L, "a.com", "/x/run.php5"),     // $ anchor: .php5 NOT blocked
      (5L, "a.com", "/shop/buy.php"),   // longer Allow beats /*.php$
      (6L, "a.com", "/tmp"),            // /tmp$ exact → blocked
      (7L, "a.com", "/tmp/file"),       // anchored rule ≠ prefix → allowed
    ).toDF("doc_id", "domain", "path")
    val out = Robots.filterAllowed(urls, "domain", "path", rules)
      .select("doc_id", "allowed").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 0, 7L -> 1))
  }

  test("wildcardMatch: agrees with the regex form on well-behaved rules," +
      " survives the catastrophic-backtracking rule in milliseconds") {
    import org.apache.spark.unsafe.types.UTF8String
    // property parity: random rules over a tiny alphabet (stars common,
    // optional anchor) vs the regex route on random paths
    val rnd = new scala.util.Random(14L)
    def randRule(): String = {
      val body = (0 until 1 + rnd.nextInt(8)).map(_ =>
        "ab/*".charAt(rnd.nextInt(4))).mkString
      "/" + body + (if (rnd.nextBoolean()) "$" else "")
    }
    def randPath(): String =
      "/" + (0 until rnd.nextInt(12)).map(_ =>
        "ab/".charAt(rnd.nextInt(3))).mkString
    (0 until 2000).foreach { _ =>
      val rule = randRule()
      val path = randPath()
      val viaRegex = Robots.wildcardRegex(rule) match {
        case Some(re) => CachedRegexpLike.matches(
          UTF8String.fromString(path), UTF8String.fromString(re))
        case None => path.startsWith(rule)
      }
      assert(Robots.wildcardMatch(path, rule) === viaRegex,
        s"rule '$rule' path '$path'")
    }
    // the DoS shape: 25 stars, non-matching long path — the regex form
    // backtracks super-polynomially here; the linear matcher must
    // answer (false) in bounded time
    val evil = "/" + "a*" * 25 + "a$"
    val victim = "/" + "a" * 2000 + "b"
    val t0 = System.nanoTime()
    assert(!Robots.wildcardMatch(victim, evil))
    assert(Robots.wildcardMatch("/" + "a" * 26, evil)) // and can match
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000.0, s"linear matcher took $ms ms on the DoS rule")
  }

  test("CachedRegexpLike: >1024 live patterns match correctly under " +
      "eviction churn and the cache never empties") {
    import org.apache.spark.unsafe.types.UTF8String
    // 3000 distinct anchored patterns — ~3× the 1024 cap, so every
    // round of the sweep churns evictions. Each pattern matches exactly
    // its own subject and rejects its neighbor: an eviction that broke
    // matching (or a clear-all that emptied the cache) flips a result.
    val n = 3000
    def pat(i: Int) = s"^/seg$i(/.*)?$$"
    def subj(i: Int) = s"/seg$i/deep"
    // parallel churn across threads, two full sweeps (second sweep hits
    // a cache that is already at the cap for most entries)
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        for (_ <- 0 until 2; i <- t until n by 8) {
          val ok = CachedRegexpLike.matches(
            UTF8String.fromString(subj(i)), UTF8String.fromString(pat(i))) &&
            !CachedRegexpLike.matches(
              UTF8String.fromString(subj(i + n)), UTF8String.fromString(pat(i)))
          if (!ok) bad.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(bad.get() === 0)
    // evict-one keeps the cache populated at ~the cap (the pre-round-11
    // clear-all left it near-empty after every 1024th distinct pattern)
    val size = CachedRegexpLike.cacheSize
    assert(size > 512 && size <= 1024 + 8,
      s"cache should sit near the 1024 cap after churn, got $size")
    // the Column path agrees with the built-in RLIKE on a mixed frame
    val df = spark.range(500).select(
      concat(lit("/seg"), col("id"), lit("/deep")).as("s"),
      concat(lit("^/seg"), (col("id") + col("id") % 2), lit("(/.*)?$")).as("p"))
    val cached = org.apache.spark.sql.GraftBridge.column(CachedRegexpLike(
      org.apache.spark.sql.GraftBridge.expression(col("s")),
      org.apache.spark.sql.GraftBridge.expression(col("p"))))
    val rows = df.select(col("s"), cached.as("a"), expr("s RLIKE p").as("b"))
      .collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(r.getBoolean(1) === r.getBoolean(2), r.getString(0)))
  }

  test("filterAllowed plan: rule side broadcasts, one URL-keyed exchange") {
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /p"))
      .toDF("domain", "robots")
    val urls = Seq.tabulate(100)(i => (i.toLong, "a.com", s"/p$i"))
      .toDF("doc_id", "domain", "path")
    val out = Robots.filterAllowed(urls, "domain", "path",
      Robots.rules(robots, "robots"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
