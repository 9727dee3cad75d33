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
    val got = Frontier.plan(entries, robots, "graftbot")
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
      .collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3))).toSet
    // equal default priorities -> loc ascending; default delay spaces
    assert(got == Set(("http://d.org/a", 1, 0L),
                      ("http://d.org/b", 2, 250L)))
  }
}
