package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML → text extraction kernel ([[HtmlText]]). */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(HtmlText.htmlText(col("h"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def title(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(HtmlText.htmlTitle(col("h"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("tags strip to spaces; whitespace collapses; ends trim") {
    assert(text("<p>a</p><p>b</p>") == "a b")
    assert(text("  <div> a \n\t b </div> ") == "a b")
    assert(text("a<b>bold</b>c") == "a bold c")
    assert(text("<br/>x<img src='y'>z") == "x z")
    assert(text("") == "")
    assert(text("plain text stays") == "plain text stays")
  }

  test("script and style vanish WITH content; comments vanish") {
    assert(text("a<script>var x='<p>no</p>';</script>b") == "a b")
    assert(text("a<STYLE>p{x:1}</STYLE>b") == "a b")
    assert(text("a<!-- <p>gone</p> -->b") == "a b")
    // unterminated script swallows to EOF — never leaks code as prose
    assert(text("a<script>var y=1;") == "a")
    // an element NAMED like script is not one
    assert(text("<scripts>keep</scripts>") == "keep")
  }

  test("bare '<' before a non-tag char is prose, not a tag opener") {
    assert(text("<p>i <3 u</p>") == "i <3 u")
    assert(text("when x < y the loop exits") == "when x < y the loop exits")
    assert(text("a < b > c") == "a < b > c")
    assert(text("trailing <") == "trailing <")
    // tag openers still open: letter, '/', '!', '?'
    assert(text("a<?php echo 1 ?>b") == "a b")
    assert(text("<!DOCTYPE html>x") == "x")
  }

  test("title requires an element-name boundary") {
    assert(title("<titlebar>Main Menu</titlebar><p>x</p>") == null)
    assert(title("<titles>no</titles><title>yes</title>") == "yes")
    // a </titles> inside a real title does not close it
    assert(title("<title>a </titles> b</title>") == "a b")
  }

  test("character references decode; malformed ampersands survive") {
    assert(text("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;")
      == "a & b <c> \"d\" 'e'")
    assert(text("x&nbsp;y") == "x y")
    assert(text("bang&#33; hex&#x21;") == "bang! hex!")
    assert(text("AT&T r&d &broken") == "AT&T r&d &broken")
    assert(text("&#999999999999;") == "&#999999999999;") // out of range
    // tab/LF/CR references are legal whitespace spellings: decode to a
    // space and collapse, never leak entity syntax into the prose
    assert(text("a&#10;b") == "a b")
    assert(text("a&#9;&#13;&#10;b") == "a b")
    assert(text("a &#x0A; b") == "a b")
    assert(text("bell&#7;") == "bell&#7;") // other controls stay rejected
  }

  test("title: first title element, decoded; null when absent") {
    assert(title("<html><head><title>A &amp; B</title></head></html>")
      == "A & B")
    assert(title("<TITLE> spaced  out </TITLE>") == "spaced out")
    assert(title("<p>no title here</p>") == null)
    // unterminated title swallows to EOF (still returns its text)
    assert(title("<title>partial") == "partial")
  }

  private def meta(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(HtmlText.htmlMetaRobots(col("h"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("meta robots: any attr order/quoting, first tag wins, null absent") {
    assert(meta("""<meta name="robots" content="noindex, nofollow">""")
      == "noindex, nofollow")
    assert(meta("<meta content='index' name=ROBOTS>") == "index")
    assert(meta("<META NAME=robots CONTENT=none >") == "none")
    // other meta tags do not match; first robots tag wins
    assert(meta("""<meta name="viewport" content="w=1">
                   <meta name="robots" content="noarchive">
                   <meta name="robots" content="all">""") == "noarchive")
    assert(meta("<p>no meta</p>") == null)
    assert(meta("<meta name=\"robots\">") == null) // no content attr
    // a <metadata> element is not a meta tag
    assert(meta("<metadata name='robots' content='x'></metadata>") == null)
  }

  test("kernel matches interpreted eval under codegen") {
    val rows = Seq(
      "<p>a &amp; b</p><script>x</script>tail",
      "<title>T</title><style>s</style>body &#65;",
      null)
    val df = rows.map(Tuple1(_)).toDF("h")
      .select(HtmlText.htmlText(col("h")).as("t"),
              HtmlText.htmlTitle(col("h")).as("ti"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0),
       if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(got == Seq(("a & b tail", null), ("T body A", "T"),
                      (null, null)))
  }
}
