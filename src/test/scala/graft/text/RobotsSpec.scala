package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots.txt parsing, pattern matching, group selection,
  * and the corpus-side filter ([[Robots]]). */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- matcher ----------------------------------------------------

  test("matches: prefix, wildcard, anchor semantics") {
    assert(Robots.matches("/private/", "/private/doc"))
    assert(!Robots.matches("/private/", "/privateer"))
    assert(Robots.matches("", "/anything")) // empty pattern: matches
    assert(Robots.matches("/", "/"))
    // '*' spans any run, including empty
    assert(Robots.matches("/*/hidden", "/a/hidden"))
    assert(Robots.matches("/*/hidden", "/a/b/hidden")) // greedy span
    assert(!Robots.matches("/*/hidden", "/hidden"))
    assert(Robots.matches("/docs/*.pdf", "/docs/a.pdf"))
    assert(Robots.matches("/docs/*.pdf", "/docs/deep/a.pdfx")) // prefix
    // '$' anchors to the END of the path
    assert(Robots.matches("/docs/*.pdf$", "/docs/a.pdf"))
    assert(!Robots.matches("/docs/*.pdf$", "/docs/a.pdfx"))
    assert(Robots.matches("/private/ok$", "/private/ok"))
    assert(!Robots.matches("/private/ok$", "/private/ok2"))
    // multiple wildcards with backtracking
    assert(Robots.matches("/a*b*c", "/axxbyybzc"))
    assert(!Robots.matches("/a*b*c$", "/axxbyybz"))
  }

  // ---- parser -----------------------------------------------------

  private val body =
    """# site robots
      |User-agent: bigbot
      |User-Agent: graftbot
      |Disallow: /private/
      |allow: /private/ok$
      |Crawl-delay: 10
      |Disallow: /tmp*
      |
      |User-agent: *
      |Disallow: /
      |
      |User-agent: graftbot-images
      |Disallow: /img/
      |""".stripMargin

  test("parseRules: group selection by longest agent-token prefix") {
    // product token 'graftbot/2.1' matches the graftbot group (8)
    // over '*' (0); directive names are case-insensitive
    val r = Robots.parseRules(body, "graftbot/2.1")
    assert(r == Seq(Robots.Rule("/private/", false),
                    Robots.Rule("/private/ok$", true),
                    Robots.Rule("/tmp*", false)))
    // a longer token wins: graftbot-images beats graftbot
    val ri = Robots.parseRules(body, "graftbot-images/1.0")
    assert(ri == Seq(Robots.Rule("/img/", false)))
    // unknown crawler falls to the '*' group
    assert(Robots.parseRules(body, "otherbot")
      == Seq(Robots.Rule("/", false)))
    // no matching group at all -> allow all (no rules)
    assert(Robots.parseRules("User-agent: x\nDisallow: /", "y").isEmpty)
    // empty rule values are ignored; rules before any group too
    assert(Robots.parseRules(
      "Disallow: /lost\nUser-agent: *\nDisallow:", "y").isEmpty)
    assert(Robots.parseRules(null, "y").isEmpty)
  }

  test("crawlDelay: selected group's value; merge takes the max") {
    // the graftbot group declares Crawl-delay: 10
    assert(Robots.crawlDelay(body, "graftbot/2.1").contains(10.0))
    // the '*' group declares none
    assert(Robots.crawlDelay(body, "otherbot").isEmpty)
    // fractional values parse; tie-merged groups take the max
    val b = "User-agent: *\nCrawl-delay: 0.5\n\n" +
            "User-agent: *\nCrawl-delay: 2\n"
    assert(Robots.crawlDelay(b, "any").contains(2.0))
    // unparseable value is ignored
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: soon", "any").isEmpty)
    assert(Robots.crawlDelay(null, "any").isEmpty)
  }

  test("parseRules: groups tying on specificity merge") {
    val b = "User-agent: *\nDisallow: /a/\n\n" +
            "User-agent: *\nDisallow: /b/\n"
    assert(Robots.parseRules(b, "anybot")
      == Seq(Robots.Rule("/a/", false), Robots.Rule("/b/", false)))
  }

  // ---- corpus filter ----------------------------------------------

  test("verdicts: longest match wins, allow wins ties, defaults allow") {
    val robots = Seq(
      ("ex.org", "User-agent: *\nDisallow: /private/\nAllow: /private/ok$"),
      ("deny.org", "User-agent: *\nDisallow: /\nAllow: /public"),
      ("empty.org", "User-agent: *\nDisallow:")
    ).toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "https://ex.org/open/a"),
      (2L, "https://ex.org/private/doc"),
      (3L, "https://ex.org/private/ok"),      // anchored allow, longer
      (4L, "https://ex.org/private/ok2"),     // anchor misses -> deny
      (5L, "https://EX.ORG/private/x"),       // host match case-blind
      (6L, "https://deny.org/anything"),
      (7L, "https://deny.org/public/a"),
      (8L, "https://empty.org/x"),            // empty Disallow
      (9L, "https://norobots.org/x"),         // no robots row
      (10L, "https://ex.org"),                // empty path -> "/"
      (11L, null)
    ).toDF("doc_id", "url")
    val got = Robots.verdicts(docs, robots, "graftbot")
      .select(col("doc_id"), col("robots_allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
                   5L -> false, 6L -> false, 7L -> true, 8L -> true,
                   9L -> true, 10L -> true, 11L -> true)
    assert(got == want)
    // the filter form drops exactly the disallowed rows
    val kept = Robots.filterAllowed(docs, robots, "graftbot")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == want.filter(_._2).keySet)
  }

  test("robots_match agrees between interpreted and codegen eval") {
    val cases = Seq(
      ("/private/", "/private/doc"), ("/docs/*.pdf$", "/docs/a.pdf"),
      ("/docs/*.pdf$", "/docs/a.pdfx"), ("/*/h", "/a/h"), ("", "/x"))
    val df = cases.toDF("p", "s")
      .select(col("p"), col("s"), Robots.robotsMatch(col("p"), col("s")).as("m"))
    val got = df.collect().map(_.getBoolean(2)).toSeq
    assert(got == cases.map { case (p, s) => Robots.matches(p, s) })
  }

  test("X-Robots-Tag tokens: split/trim/lower, value-directives stay whole") {
    import org.apache.spark.sql.functions.col
    def toks(h: String): Seq[String] =
      Seq(Tuple1(h)).toDF("h")
        .select(Robots.xRobotsTokens(col("h"))).head().getSeq[String](0)
    assert(toks("NOINDEX, noFollow") == Seq("noindex", "nofollow"))
    assert(toks("noarchive,  nofollow") == Seq("noarchive", "nofollow"))
    // directive-with-value keeps its colon inside one token — it
    // must not read as a bare directive
    assert(toks("unavailable_after: 01 Jan 2030 00:00:00 GMT") ==
      Seq("unavailable_after: 01 jan 2030 00:00:00 gmt"))
    // agent-scoped prefix stays inside its token too
    assert(toks("googlebot: noindex") == Seq("googlebot: noindex"))
    assert(toks(null) == Seq.empty)
    assert(toks(" , ,") == Seq.empty)
  }

  test("Sitemap: directives extract globally, case- and comment-proof") {
    import org.apache.spark.sql.functions.{col, explode}
    val body =
      "User-agent: a\nDisallow: /\n" +
      "Sitemap: http://h.example/s1.xml\n" +
      "User-agent: *\nDisallow:\n" +
      "sitemap: http://h.example/s2.xml # daily\n" +
      "SiteMap:http://h.example/s3.xml\n" +
      "# Sitemap: http://h.example/commented-out.xml\n" +
      "Sitemap:\n" // empty value drops
    val got = Seq(Tuple1(body)).toDF("b")
      .select(explode(Robots.sitemapDirectives(col("b"))).as("u"))
      .collect().map(_.getString(0)).toSeq
    // GLOBAL extraction: s1 sits inside another agent's group and
    // still surfaces (RFC 9309: sitemap is not group-scoped)
    assert(got == Seq("http://h.example/s1.xml",
                      "http://h.example/s2.xml",
                      "http://h.example/s3.xml"))
    val none = Seq(Tuple1("User-agent: *\nDisallow:\n")).toDF("b")
      .select(Robots.sitemapDirectives(col("b")).as("u"))
      .head().getSeq[String](0)
    assert(none.isEmpty)
  }
}
