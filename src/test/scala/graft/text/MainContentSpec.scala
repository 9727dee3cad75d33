package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Block-level main-content extraction ([[MainContent]]): the
  * jusText-lite segmenter + length/link-density classifier + heading
  * promotion, plus its codegen'd column surface. */
class MainContentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mc(h: String) =
    MainContent.mainContent(
      org.apache.spark.unsafe.types.UTF8String.fromString(h), 25, 20)
      .toString

  private val article =
    "This paragraph carries enough plain prose characters to clear " +
      "the minimum length bar easily."

  test("nav menus, link asides, and short footers are boilerplate") {
    val h = "<nav><ul><li><a href=/a>Home</a></li><li><a href=/b>About" +
      s"</a></li></ul></nav><p>$article</p>" +
      "<aside><a href=/x>sponsored thing</a></aside>" +
      "<footer>Copyright 9</footer>"
    assert(mc(h) == article)
  }

  test("a long block fails on link density alone") {
    // text well over minChars but ~all of it inside anchors
    val links = (1 to 8).map(i =>
      s"<a href=/$i>navigation entry number $i</a>").mkString(" ")
    assert(mc(s"<div>$links</div><p>$article</p>") == article)
    // the same words OUTSIDE anchors classify as content
    val plain = (1 to 8).map(i => s"navigation entry number $i")
      .mkString(" ")
    assert(mc(s"<div>$plain</div>") == plain)
  }

  test("an inline link under the density bar does not sink a paragraph") {
    val h = s"<p>$article See the <a href=/r>details</a> page.</p>"
    assert(mc(h) == s"$article See the details page.")
  }

  test("headings promote before content and stay boilerplate elsewhere") {
    val h = s"<h1>Big story</h1><p>$article</p>" +
      "<h2>Related</h2><div><a href=/1>More one</a> " +
      "<a href=/2>More two</a></div>"
    assert(mc(h) == s"Big story $article")
    // a heading with nothing after it stays out
    assert(mc("<h1>Lonely headline</h1>") == "")
    // consecutive headings: both promote over the same content block
    assert(mc(s"<h1>Top</h1><h2>Sub head</h2><p>$article</p>")
      == s"Top Sub head $article")
  }

  test("a block-level banner link counts fully toward link density") {
    // HTML5 allows flow content inside <a>: the div's text is all link
    val h = s"<a href=/promo><div>A big clickable banner with plenty " +
      s"of text inside it</div></a><p>$article</p>"
    assert(mc(h) == article)
  }

  test("script/style/comments and entities follow the HtmlText grammar") {
    val h = s"<p>$article &amp; more <script>var x=1;</script>" +
      "<!-- hidden --> still &#79;K.</p>"
    assert(mc(h) == s"$article & more still OK.")
  }

  test("empty and markup-only pages extract to empty, never null") {
    assert(mc("") == "")
    assert(mc("<nav><a href=/a>Home</a></nav>") == "")
  }

  test("block stats census matches the classifier") {
    val h = s"<h1>Head line</h1><p>$article</p>" +
      "<div><a href=/1>linky link list</a></div>"
    val rows = Seq(h).toDF("html")
      .select(explode(MainContent.htmlBlockStats(col("html")))
        .as("b"))
      .select(col("b.text"), col("b.n_chars"), col("b.link_chars"),
              col("b.heading"), col("b.content"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
                 r.getBoolean(3), r.getBoolean(4)))
    assert(rows.length == 3)
    assert(rows(0) == (("Head line", 9, 0, true, true))) // promoted
    assert(rows(1) == ((article, article.length, 0, false, true)))
    assert(rows(2) == (("linky link list", 15, 15, false, false)))
  }

  test("column kernel matches interpreted eval under codegen") {
    val pages = Seq(
      s"<nav><a href=/>Home</a></nav><h1>T</h1><p>$article</p>",
      "<div>short</div>",
      null)
    val got = pages.map(Tuple1(_)).toDF("h")
      .select(MainContent.htmlMainContent(col("h")).as("t"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq(s"T $article", "", null))
  }

  test("main_content is registered SQL surface with tunable thresholds") {
    graft.functions.GraftExtensions.register(spark)
    val got = spark.sql(
      s"SELECT html_main_content('<p>$article</p><div>tiny</div>') AS t," +
        s" html_main_content('<div>tiny</div>', 3, 20) AS u")
      .collect()(0)
    assert(got.getString(0) == article)
    assert(got.getString(1) == "tiny")
  }
}
