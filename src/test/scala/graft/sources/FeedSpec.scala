package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Web-feed source ([[Feed]]). The q_feed_parse oracle gates the
  * planted mass; these cases pin the parser semantics the twin
  * can't see — the rel=self decoy skip, no-rel-defaults-to-
  * alternate, attribute quoting variants, and the quarantine
  * postures. */
class FeedSpec extends AnyFunSuite {

  test("RSS round-trip: writer and parser agree, entities decode") {
    val entries = Seq(
      ("http://x.example/p?a=1&b=2", "T1", "2024-01-01", "g1"),
      ("http://x.example/q", null, null, null))
    val got = Feed.parseFeed(
      new String(Feed.writeRss(entries), "UTF-8"))
    assert(got == Seq(
      Feed.Entry("rss", "http://x.example/p?a=1&b=2", "T1",
                 "2024-01-01", "g1"),
      Feed.Entry("rss", "http://x.example/q", null, null, null)))
  }

  test("Atom round-trip: rel=self decoys skip, alternate wins") {
    val entries = Seq(("http://x.example/a", "A", "2024-02-02", "u1"))
    val got = Feed.parseFeed(
      new String(Feed.writeAtom(entries), "UTF-8"))
    assert(got == Seq(
      Feed.Entry("atom", "http://x.example/a", "A", "2024-02-02", "u1")))
  }

  test("Atom link with no rel defaults to alternate (RFC 4287 §4.2.7)") {
    val xml =
      """<feed><entry>
        |  <link href="http://x.example/norel"/>
        |  <title>N</title>
        |</entry></feed>""".stripMargin
    assert(Feed.parseFeed(xml) ==
      Seq(Feed.Entry("atom", "http://x.example/norel", "N", null, null)))
  }

  test("Atom entry with only a self link quarantines") {
    val xml =
      """<feed><entry>
        |  <link rel="self" href="http://x.example/self-only"/>
        |</entry></feed>""".stripMargin
    assert(Feed.parseFeed(xml) ==
      Seq(Feed.Entry("invalid", null, null, null, null)))
  }

  test("attribute parsing: single quotes, spacing, case") {
    assert(Feed.attrValue("<link HREF = 'http://q.example/'>", "href")
      == "http://q.example/")
    assert(Feed.attrValue("<link rel=\"self\" href=\"h\">", "rel")
      == "self")
    assert(Feed.attrValue("<link href=\"h\">", "rel") == null)
    // 'href' inside another attribute's VALUE must not match
    assert(Feed.attrValue("<link title=\"href=x\" href=\"real\">", "href")
      == "real")
    // a name-prefix attribute must not shadow the real one
    assert(Feed.attrValue("<link hreflang=\"en\" href=\"real\">", "href")
      == "real")
  }

  test("empty RSS link and non-feed bytes quarantine; never throw") {
    val rss = new String(Feed.writeRss(Seq(("", "T", null, null))), "UTF-8")
    assert(Feed.parseFeed(rss) ==
      Seq(Feed.Entry("invalid", null, null, null, null)))
    assert(Feed.parseFeed("no feed here") ==
      Seq(Feed.Entry("invalid", null, null, null, null)))
    assert(Feed.parseFeed(null) ==
      Seq(Feed.Entry("invalid", null, null, null, null)))
  }

  test("readFeeds: plain + gzip files land as rows with quarantine") {
    val spark = graft.TestSpark.spark
    val tmp = java.nio.file.Files.createTempDirectory("feedspec")
    java.nio.file.Files.write(tmp.resolve("a.rss.xml"),
      Feed.writeRss(Seq(("http://x.example/1", "T", null, null))))
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(Feed.writeAtom(Seq(("http://x.example/2", "U", null, null))))
    g.close()
    java.nio.file.Files.write(tmp.resolve("b.atom.xml.gz"), gz.toByteArray)
    java.nio.file.Files.write(tmp.resolve("junk.bin"),
      "junk".getBytes("UTF-8"))
    val got = Feed.readFeeds(spark, tmp.toString)
      .select("format", "link").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("rss", "http://x.example/1"),
                      ("atom", "http://x.example/2"),
                      ("invalid", null)))
  }
}
