package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-frontier scheduling ([[Frontier]]): robots gating, priority
  * ranking, crawl-delay offsets, defaults. */
class FrontierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan: blocked locs drop, priorities rank, delays space fetches") {
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /no/\nCrawl-delay: 3"),
      ("b.org", "User-agent: *\nDisallow:")
    ).toDF("host", "robots_txt")
    val entries = Seq(
      ("http://a.org/x", "0.9"),
      ("http://a.org/y", "0.2"),
      ("http://a.org/z", "0.9"),   // priority tie with /x -> loc order
      ("http://a.org/no/w", "1.0"),// robots-blocked despite top priority
      ("http://b.org/only", null), // null priority -> protocol 0.5
      ("http://c.org/free", "0.1") // no robots row: allowed, default delay
    ).toDF("loc", "priority")
    val planned = Frontier.plan(entries, robots, "graftbot")
    // discovery-crawl spelling: staleness is declared but null
    assert(planned.columns.contains("staleness_h") &&
           planned.filter(col("staleness_h").isNotNull).count() == 0)
    val got = planned
      .select("host", "loc", "fetch_slot", "fetch_offset_ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("a.org", "http://a.org/x", 1, 0L),
      ("a.org", "http://a.org/z", 2, 3000L),
      ("a.org", "http://a.org/y", 3, 6000L),
      ("b.org", "http://b.org/only", 1, 0L),
      ("c.org", "http://c.org/free", 1, 0L)))
  }

  test("plan without a priority column uses the protocol default") {
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val got = Frontier.plan(
      Seq(Tuple1("http://d.org/b"), Tuple1("http://d.org/a"))
        .toDF("loc"),
      robots, "bot", defaultDelayMs = 250L)
      .select("loc", "fetch_slot", "fetch_offset_ms")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // equal default priorities -> loc ascending; default delay spaces
    assert(got == Set(("http://d.org/a", 1, 0L),
                      ("http://d.org/b", 2, 250L)))
  }

  test("recrawl plan: stale-first within priority ties; sentinels rank") {
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val entries = Seq(
      // same priority: staleness decides — older lastmod = more stale
      ("http://e.org/old",   "0.5", "2024-01-01", "daily"),
      ("http://e.org/fresh", "0.5", "2024-01-30", "daily"),
      // longer changefreq interval reduces staleness at equal lastmod
      ("http://e.org/month", "0.5", "2024-01-01", "monthly"),
      // priority beats any staleness
      ("http://e.org/vip",   "0.9", "2024-01-31", "always"),
      // unknown lastmod crawls first among its priority tie
      ("http://e.org/mystery", "0.5", null, "weekly"),
      // never entries crawl last
      ("http://e.org/archive", "0.5", "2020-01-01", "never"),
      // malformed lastmod degrades to unknown-first, never a throw
      ("http://e.org/garbled", "0.5", "not-a-date", "daily")
    ).toDF("loc", "priority", "lastmod", "changefreq")
    val got = Frontier.plan(entries, robots, "bot", asOf = "2024-02-01")
      .select("loc", "fetch_slot")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map(
      "http://e.org/vip" -> 1,
      // unknown-lastmod sentinel (1e6) outranks every real staleness;
      // garbled lastmod joins it, loc ascending breaks their tie
      "http://e.org/garbled" -> 2,
      "http://e.org/mystery" -> 3,
      "http://e.org/old" -> 4,    // 744 - 24 = 720h overdue
      // fresh (48-24) and month (744-720) are both 24h overdue —
      // the loc tie-break orders them
      "http://e.org/fresh" -> 5,
      "http://e.org/month" -> 6,
      "http://e.org/archive" -> 7))
  }

  test("revisitPlan: validators carry forward; duplicates collapse; misses go full") {
    val prior = Seq(
      ("http://r.org/a", Map("etag" -> "\"e1\"",
                             "last-modified" -> "Mon, 01 Jan 2024 00:00:01 GMT")),
      // a re-fetch of the same URL with a later validator pair —
      // must collapse to ONE row, max validators
      ("http://r.org/a", Map("etag" -> "\"e2\"",
                             "last-modified" -> "Mon, 01 Jan 2024 00:00:02 GMT")),
      ("http://r.org/b", Map("etag" -> "\"eb\"")),
      ("http://r.org/c", Map("content-type" -> "text/html")), // no validators
      ("http://r.org/d", null.asInstanceOf[Map[String, String]])
    ).toDF("url", "http_headers")
    val candidates = Seq("http://r.org/a", "http://r.org/b",
                         "http://r.org/c", "http://r.org/d",
                         "http://r.org/new").toDF("url")
    val got = Frontier.revisitPlan(candidates, prior).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(got.size == 5)
    assert(got("http://r.org/a") ==
      (("\"e2\"", "Mon, 01 Jan 2024 00:00:02 GMT", "conditional")))
    assert(got("http://r.org/b") == (("\"eb\"", null, "conditional")))
    assert(got("http://r.org/c") == ((null, null, "full")))
    assert(got("http://r.org/d") == ((null, null, "full")))
    assert(got("http://r.org/new") == ((null, null, "full")))
  }

  test("changeRate: exact mean-time-between-changes; stability and no-evidence edges") {
    val history = Seq(
      // u1: 4 fetches over 30h, digest changes twice (t10, t30)
      ("u1", 0L, "a"), ("u1", 10L, "b"), ("u1", 20L, "b"),
      ("u1", 30L, "c"),
      // u2: never changed over 40h -> interval = the observed span
      ("u2", 0L, "x"), ("u2", 40L, "x"),
      // u3: single fetch -> no evidence, null interval
      ("u3", 5L, "y"),
      // u4: changes EVERY fetch, 7h apart -> floor(14/2) = 7
      ("u4", 0L, "p"), ("u4", 7L, "q"), ("u4", 14L, "r")
    ).toDF("url", "fetch_t", "digest")
    val got = Frontier.changeRate(history).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4)))).toMap
    assert(got("u1") == ((4L, 2L, 30L, 15L)))
    assert(got("u2") == ((2L, 0L, 40L, 40L)))
    assert(got("u3") == ((1L, 0L, 0L, null)))
    assert(got("u4") == ((3L, 2L, 14L, 7L)))
  }

  test("recrawl staleness values are exact epoch-hour arithmetic") {
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val entries = Seq(
      ("http://f.org/a", "0.5", "2024-01-31", "daily"),   // 24 - 24 = 0
      ("http://f.org/b", "0.5", "2024-01-31", "always"),  // 24 - 0
      ("http://f.org/c", "0.5", "2024-01-01", "weekly")   // 744 - 168
    ).toDF("loc", "priority", "lastmod", "changefreq")
    val got = Frontier.plan(entries, robots, "bot", asOf = "2024-02-01")
      .select("loc", "staleness_h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("http://f.org/a" -> 0L, "http://f.org/b" -> 24L,
                      "http://f.org/c" -> 576L))
  }
}
