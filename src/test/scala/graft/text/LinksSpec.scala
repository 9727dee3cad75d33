package graft.text

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hyperlink extraction + RFC 3986 resolution ([[Links]]). */
class LinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def links(html: String): Seq[(String, String, Boolean)] =
    Seq(Tuple1(html)).toDF("h")
      .select(explode(Links.htmlLinks(col("h"))).as("l"))
      .select(col("l.href"), col("l.anchor"), col("l.nofollow"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))

  private def base(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(Links.htmlBaseHref(col("h"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  private def res(b: String, r: String): String = {
    val row = Seq((b, r)).toDF("b", "r")
      .select(Links.resolveUrl(col("b"), col("r"))).head()
    if (row.isNullAt(0)) null else row.getString(0)
  }

  test("href, anchor text, and document order") {
    val got = links(
      """<p><a href="/x">first</a> prose
        |<a href='y/z'>second <b>bold</b></a></p>""".stripMargin)
    assert(got == Seq(("/x", "first", false),
                      ("y/z", "second bold", false)))
  }

  test("attribute variants: bare, quoted, whitespace, entity-decoded") {
    assert(links("<a href=bare>t</a>").head._1 == "bare")
    assert(links("<a href = \"spaced\">t</a>").head._1 == "spaced")
    assert(links("<a href=\"q?a=1&amp;b=2\">t</a>").head._1
      == "q?a=1&b=2")
    // a '>' inside a quoted attribute does not cut the tag
    assert(links("<a href=\"x\" title=\"a > b\">t</a>")
      == Seq(("x", "t", false)))
    // no href, empty href → no row
    assert(links("<a name=\"anchor\">t</a>").isEmpty)
    assert(links("<a href=\"\">t</a>").isEmpty)
  }

  test("rel=nofollow token parse") {
    assert(links("<a href=x rel=nofollow>t</a>").head._3)
    assert(links("<a href=x rel=\"ugc NOFOLLOW\">t</a>").head._3)
    assert(links("<a href=x rel=\"sponsored,nofollow\">t</a>").head._3)
    assert(!links("<a href=x rel=\"nofollowish\">t</a>").head._3)
    assert(!links("<a href=x>t</a>").head._3)
  }

  test("script/style content never fakes a link; anchors decode") {
    assert(links(
      "<script>var s='<a href=\"no\">x</a>';</script><a href=y>ok</a>")
      == Seq(("y", "ok", false)))
    assert(links("<a href=z>caf&eacute;? &amp; more</a>").head._2
      == "caf&eacute;? & more") // named entity beyond the XML five stays
    assert(links("<a href=z>a &#38; b</a>").head._2 == "a & b")
    // unterminated anchor runs to EOF
    assert(links("<a href=u>tail text").head._2 == "tail text")
  }

  test("base href: first wins, entity-decoded, absent → null") {
    assert(base("<head><base href=\"http://b.example/d/\"></head>")
      == "http://b.example/d/")
    assert(base("<base href=/one><base href=/two>") == "/one")
    assert(base("<p>no base</p>") == null)
  }

  test("RFC 3986 resolution: the spec's reference cases") {
    val b = "http://a.example/b/c/d;p?q"
    assert(res(b, "g") == "http://a.example/b/c/g")
    assert(res(b, "./g") == "http://a.example/b/c/g")
    assert(res(b, "g/") == "http://a.example/b/c/g/")
    assert(res(b, "/g") == "http://a.example/g")
    assert(res(b, "//o.example/g") == "http://o.example/g")
    assert(res(b, "?y") == "http://a.example/b/c/d;p?y")
    assert(res(b, "g?y") == "http://a.example/b/c/g?y")
    assert(res(b, "#s") == "http://a.example/b/c/d;p?q")
    assert(res(b, "") == "http://a.example/b/c/d;p?q")
    assert(res(b, "..") == "http://a.example/b/")
    assert(res(b, "../g") == "http://a.example/b/g")
    assert(res(b, "../../g") == "http://a.example/g")
    assert(res(b, "../../../g") == "http://a.example/g") // over-pop clamps
    assert(res(b, "g/../h") == "http://a.example/b/c/h")
    assert(res(b, "http://x.example/abs") == "http://x.example/abs")
    assert(res(b, "mailto:a@b.example") == "mailto:a@b.example")
  }

  test("resolution sanitization and quarantine") {
    assert(res("http://a.example/d/", " g with space ")
      == "http://a.example/d/g%20with%20space")
    assert(res("http://a.example", "p") == "http://a.example/p")
    assert(res("not a url", "p") == null)
    assert(res("http://", "p") == null)
    // fragment on an absolute ref still strips
    assert(res("http://a.example/", "http://x.example/p#frag")
      == "http://x.example/p")
  }

  private def canon(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(Links.htmlCanonical(col("h"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonical link: rel token match, first wins, absent → null") {
    assert(canon("""<link rel="canonical" href="http://c.example/x">""")
      == "http://c.example/x")
    assert(canon("""<link href="/y" rel="alternate canonical">""") == "/y")
    assert(canon("""<link rel=canonical href=/a><link rel=canonical href=/b>""")
      == "/a")
    assert(canon("""<link rel="stylesheet" href="s.css">""") == null)
    assert(canon("""<link rel="canonicalish" href="/no">""") == null)
    assert(canon("<p>no links</p>") == null)
    assert(canon("""<link rel=canonical href="q?a=1&amp;b=2">""")
      == "q?a=1&b=2")
  }

  private def feeds(html: String): Seq[String] =
    Seq(Tuple1(html)).toDF("h")
      .select(Links.htmlFeedLinks(col("h")).as("f"))
      .head().getSeq[String](0)

  test("feed autodiscovery: type gates, rel tokens, decoys, order, entities") {
    assert(feeds(
      """<link rel="alternate" type="application/rss+xml" href="/f.xml">""")
      == Seq("/f.xml"))
    // both kinds, document order, case-insensitive type and rel
    assert(feeds(
      """<link rel="ALTERNATE" type="Application/Atom+XML" href="/a">
        |<link rel="feed alternate" type="application/rss+xml" href="/r">"""
        .stripMargin) == Seq("/a", "/r"))
    // rel=alternate WITHOUT a feed type is a language/media variant
    assert(feeds("""<link rel="alternate" hreflang="de" href="/de">""")
      == Seq.empty)
    assert(feeds("""<link rel="stylesheet" type="text/css" href="/s.css">""")
      == Seq.empty)
    assert(feeds("""<link type="application/rss+xml" href="/norel">""")
      == Seq.empty)
    assert(feeds(
      """<link rel=alternate type=application/rss+xml href="f?a=1&amp;b=2">""")
      == Seq("f?a=1&b=2"))
    assert(feeds("<p>no links</p>") == Seq.empty)
  }

  test("kernels run inside whole-stage codegen") {
    val df = spark.range(4).select(
      Links.resolveUrl(lit("http://a.example/d/"),
        concat(lit("p"), col("id"))).as("u"),
      Links.htmlBaseHref(
        concat(lit("<base href=/b"), col("id"), lit(">"))).as("b"),
      size(Links.htmlLinks(
        concat(lit("<a href=x"), col("id"), lit(">t</a>")))).as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
    val rows = df.collect()
    assert(rows.zipWithIndex.forall { case (r, i) =>
      r.getString(0) == s"http://a.example/d/p$i" &&
      r.getString(1) == s"/b$i" && r.getInt(2) == 1
    })
  }
}
