package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Page-link pipeline surfaces ([[LinkGraph]]) + frontier expansion
  * ([[Frontier.expand]]). The oracle queries gate the id-arithmetic
  * mass; these cases pin the semantics the oracles can't see —
  * base-href re-rooting, quarantine rows, anchor aggregation, and
  * the expansion's exclusion rules. */
class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (String, String)*) =
    rows.toDF("url", "raw_html")

  test("pageLinks resolves against base href, else the page URL") {
    val d = docs(
      ("http://a.example/d/p1",
       """<base href="http://b.example/bd/"><a href="r">t</a>"""),
      ("http://a.example/d/p2", """<a href="r">t</a>"""))
    val got = LinkGraph.pageLinks(d)
      .select("src_url", "link_url").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "http://a.example/d/p1" -> "http://b.example/bd/r",
      "http://a.example/d/p2" -> "http://a.example/d/r"))
  }

  test("a RELATIVE base href resolves against the page URL first") {
    val d = docs(
      ("http://a.example/d/p",
       """<base href="/newroot/"><a href="r">t</a>"""))
    assert(LinkGraph.pageLinks(d).select("link_url").head().getString(0)
      == "http://a.example/newroot/r")
  }

  test("httpOnly drops mailto/javascript but keeps quarantine nulls") {
    val d = docs(
      ("not a parseable base", // unresolvable page URL → null link_url
       """<a href="r">t</a>"""),
      ("http://a.example/",
       """<a href="mailto:x@y.example">m</a><a href="/k">k</a>"""))
    val rows = LinkGraph.pageLinks(d)
      .select("link_url").collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSet
    assert(rows == Set(null, "http://a.example/k"))
  }

  test("hostGraph aggregates per host pair with nofollow counts") {
    val d = docs(
      ("http://a.example/1",
       """<a href="http://t.example/x">1</a>
         |<a href="http://t.example/y" rel=nofollow>2</a>""".stripMargin),
      ("http://www.a.example/2", """<a href="http://t.example/z">3</a>"""))
    val got = LinkGraph.hostGraph(LinkGraph.pageLinks(d))
      .collect().map(r => (r.getString(0), r.getString(1),
                           r.getLong(2), r.getLong(3))).toSet
    // www. strips into the same canonical src host
    assert(got == Set(("a.example", "t.example", 3L, 1L)))
  }

  test("anchorText aggregates per target; empty anchors drop") {
    val d = docs(
      ("http://a.example/1",
       """<a href="http://t.example/x">Spark</a>
         |<a href="http://t.example/x">Spark</a>
         |<a href="http://t.example/x">Apache Spark</a>
         |<a href="http://t.example/x"><img src=i></a>""".stripMargin))
    val got = LinkGraph.anchorText(LinkGraph.pageLinks(d))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("Spark", 2L), ("Apache Spark", 1L)))
  }

  test("expand: nofollow and seen exclude; counts aggregate exactly") {
    val d = docs(
      ("http://h1.example/p",
       """<a href="http://t.example/hub?b=2&amp;a=1">x</a>
         |<a href="http://t.example/hub?a=1&amp;b=2">y</a>
         |<a href="http://old.example/done">z</a>
         |<a href="http://no.example/" rel=nofollow>n</a>""".stripMargin),
      ("http://h2.example/q",
       """<a href="http://t.example/hub?a=1&amp;b=2">w</a>"""))
    val seen = Seq("http://old.example/done").toDF("url")
    val got = Frontier.expand(LinkGraph.pageLinks(d), seen)
      .collect().map(r => (r.getString(0), r.getString(1),
                           r.getLong(2), r.getLong(3))).toSet
    // the two param orders canonicalize into ONE candidate: 3
    // discoveries from 2 distinct hosts; seen and nofollow vanish
    assert(got == Set(
      ("http://t.example/hub?a=1&b=2", "t.example", 3L, 2L)))
  }
}
