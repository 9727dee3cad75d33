package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DOCX/EPUB zip-container sources ([[Docx]]): real zip round-trips,
  * lexical-XML edges (entities, self-closing runs, spine order),
  * bounds, and the sniff routing of the three zip kinds. */
class DocxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("docx round-trip: paragraphs, title, census") {
    val p = Docx.parseDocx(Docx.encodeDocx("My Title",
      Seq("first paragraph here", "second one")))
    assert(p.ok)
    assert(p.title == "My Title")
    assert(p.text == "first paragraph here\nsecond one")
    assert(p.nParagraphs == 2L)
    assert(p.nChars == p.text.length.toLong)
  }

  test("docx: XML entities decode; tabs fold to spaces") {
    val xml =
      """<?xml version="1.0"?><w:document xmlns:w="x"><w:body>""" +
        "<w:p><w:r><w:t>a &amp; b &lt;c&gt; &#65;</w:t></w:r>" +
        "<w:r><w:tab/><w:t>after tab</w:t></w:r></w:p>" +
        "</w:body></w:document>"
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      def add(n: String, c: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
      add("[Content_Types].xml", "<Types/>")
      add("word/document.xml", xml)
      zos.close(); bos.toByteArray
    }
    val p = Docx.parseDocx(bytes)
    assert(p.ok)
    assert(p.text == "a & b <c> A after tab")
    assert(p.title == null) // no core.xml
  }

  test("docx: non-docx zips and junk fail with named reasons") {
    val epubBytes = Docx.encodeEpub("e", Seq(("c.xhtml", Seq("x"))))
    assert(Docx.parseDocx(epubBytes).reason == "missing_content_types")
    assert(!Docx.parseDocx("PKjunk".getBytes("ISO-8859-1")).ok)
    assert(!Docx.parseDocx(Array[Byte](1, 2, 3)).ok)
  }

  test("epub round-trip: spine order decides chapter order") {
    val e = Docx.parseEpub(Docx.encodeEpub("Book T", Seq(
      ("one.xhtml", Seq("alpha text")), ("two.xhtml", Seq("beta text")))))
    assert(e.ok)
    assert(e.title == "Book T")
    assert(e.nChapters == 2L)
    // HtmlText joins blocks with single spaces; per-chapter <title>
    // text leads each chapter
    assert(e.text == "Book T alpha text\n\nBook T beta text")
  }

  test("epub: missing mimetype / container named reasons") {
    assert(Docx.parseEpub(Docx.encodeDocx("d", Seq("x")))
      .reason == "bad_mimetype")
  }

  test("sniff: epub, docx, and other zips route as documented") {
    val rows = Seq(
      (0L, Docx.encodeEpub("e", Seq(("c.xhtml", Seq("x"))))),
      (1L, Docx.encodeDocx("d", Seq("x"))),
      (2L, { // a zip that is neither: single entry "data.bin"
        val bos = new java.io.ByteArrayOutputStream()
        val zos = new java.util.zip.ZipOutputStream(bos)
        zos.putNextEntry(new java.util.zip.ZipEntry("data.bin"))
        zos.write(Array[Byte](1, 2, 3)); zos.closeEntry(); zos.close()
        bos.toByteArray
      })).toDF("asset_id", "content")
    val got = graft.multimodal.Sniff.route(rows)
      .select("asset_id", "detected", "route")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got(0L) == (("application/epub+zip", "document")))
    assert(got(1L)._1.startsWith("application/vnd.openxmlformats"))
    assert(got(1L)._2 == "document")
    assert(got(2L) == (("application/zip", "quarantine")))
  }

  test("zip bounds: an entry inflating past MaxBytes fails loudly") {
    // 80 MB of zeros deflates tiny but inflates past the 64 MB bound
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("[Content_Types].xml"))
    val chunk = new Array[Byte](1 << 20)
    (0 until 80).foreach(_ => zos.write(chunk))
    zos.closeEntry(); zos.close()
    assert(Docx.parseDocx(bos.toByteArray).reason == "zip_bounds")
  }
}
