package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Sitemap protocol parsing ([[Sitemap]]): both document shapes,
  * optional fields, entity decode, namespace prefixes, gzip, and
  * malformed-input quarantine. */
class SitemapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("urlset round-trips with optional fields and entity decode") {
    val xml = new String(Sitemap.writeUrlset(Seq(
      ("http://e.org/a?x=1&y=2", "2024-01-01", "daily", "0.8"),
      ("http://e.org/b", null, null, null))), "UTF-8")
    val got = Sitemap.parseSitemap(xml)
    assert(got == Seq(
      Sitemap.Entry("url", "http://e.org/a?x=1&y=2", "2024-01-01",
                    "daily", "0.8"),
      Sitemap.Entry("url", "http://e.org/b", null, null, null)))
  }

  test("sitemapindex parses child sitemap pointers") {
    val xml = new String(Sitemap.writeIndex(Seq(
      ("http://e.org/s1.xml.gz", "2024-02-01"),
      ("http://e.org/s2.xml.gz", null))), "UTF-8")
    assert(Sitemap.parseSitemap(xml) == Seq(
      Sitemap.Entry("sitemap", "http://e.org/s1.xml.gz", "2024-02-01",
                    null, null),
      Sitemap.Entry("sitemap", "http://e.org/s2.xml.gz", null, null, null)))
  }

  test("namespace prefixes and numeric references are tolerated") {
    val xml =
      """<?xml version="1.0"?>
        |<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:url><sm:loc>http://e.org/caf&#xe9;</sm:loc></sm:url>
        |</sm:urlset>""".stripMargin
    assert(Sitemap.parseSitemap(xml) == Seq(
      Sitemap.Entry("url", "http://e.org/café", null, null, null)))
  }

  test("malformed input quarantines, never throws") {
    // no recognizable root
    assert(Sitemap.parseSitemap("plain text") ==
      Seq(Sitemap.Entry("invalid", null, null, null, null)))
    assert(Sitemap.parseSitemap(null).head.kind == "invalid")
    // entry with no loc -> per-entry invalid; later entries survive
    val xml =
      """<urlset><url><lastmod>2024-01-01</lastmod></url>
        |<url><loc>http://e.org/ok</loc></url></urlset>""".stripMargin
    assert(Sitemap.parseSitemap(xml) == Seq(
      Sitemap.Entry("invalid", null, null, null, null),
      Sitemap.Entry("url", "http://e.org/ok", null, null, null)))
    // unterminated entry: quarantine and stop
    val cut = "<urlset><url><loc>http://e.org/x</loc>"
    assert(Sitemap.parseSitemap(cut) ==
      Seq(Sitemap.Entry("invalid", null, null, null, null)))
  }

  test("readSitemaps: plain and gz files, one row per entry") {
    val tmp = java.nio.file.Files.createTempDirectory("sitemap_spec")
    java.nio.file.Files.write(tmp.resolve("a.xml"),
      Sitemap.writeUrlset(Seq(("http://e.org/1", null, null, null),
                              ("http://e.org/2", null, null, null))))
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(Sitemap.writeIndex(Seq(("http://e.org/s.xml", null))))
    g.close()
    java.nio.file.Files.write(tmp.resolve("b.xml.gz"), gz.toByteArray)
    val rows = Sitemap.readSitemaps(spark, tmp.toString)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("url", "http://e.org/1"),
                       ("url", "http://e.org/2"),
                       ("sitemap", "http://e.org/s.xml")))
  }
}
