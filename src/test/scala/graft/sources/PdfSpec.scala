package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PDF structural walker + text extraction ([[Pdf]]): encoder →
  * parser round-trips across the syntax degrees of freedom, the
  * quarantine dispositions, and the Spark surfaces. */
class PdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roundTrip(pages: Seq[Seq[String]],
                        flate: Boolean = true, useTJ: Boolean = false,
                        indirectLength: Boolean = false) =
    Pdf.parsePdf(Pdf.encodePdf(pages, flate = flate, useTJ = useTJ,
                               indirectLength = indirectLength))

  test("single page round-trips through raw and FlateDecode streams") {
    for (flate <- Seq(false, true)) {
      val p = roundTrip(Seq(Seq("Hello world", "second line")),
                        flate = flate)
      assert(p.ok && p.nPages == 1 && p.version == "1.4")
      assert(p.text == "Hello world\nsecond line")
      assert(p.nShows == 2)
    }
  }

  test("multi-page trees join pages with newlines in Kids order") {
    val p = roundTrip(Seq(Seq("page one"), Seq("page two", "more"),
                          Seq("page three")))
    assert(p.ok && p.nPages == 3)
    assert(p.text == "page one\npage two\nmore\npage three")
  }

  test("TJ kerned arrays concatenate; indirect /Length resolves") {
    val p = roundTrip(Seq(Seq("kerned text line")), useTJ = true,
                      indirectLength = true)
    assert(p.ok && p.text == "kerned text line" && p.nShows == 1)
  }

  test("literal-string escapes and balanced parens round-trip") {
    val tricky = "parens (nested (deep)) and \\ backslash"
    val p = roundTrip(Seq(Seq(tricky, "x (y) z")))
    assert(p.ok && p.text == s"$tricky\nx (y) z")
  }

  /** Patch a raw (un-flated, single-page) fixture's content ops and
    * fix its `/Length` — the parser never reads the xref table, so
    * only the stream length declaration must stay truthful. */
  private def patchContent(pdf: Array[Byte], from: String,
                           to: String): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val s = new String(pdf, iso)
    assert(s.contains(from), s"fixture does not contain '$from'")
    val delta = to.length - from.length
    val patched = "/Length (\\d+)".r.replaceAllIn(
      s.replace(from, to),
      m => "/Length " + (m.group(1).toInt + delta))
    patched.getBytes(iso)
  }

  test("hex strings and octal escapes decode in content streams") {
    val base = Pdf.encodePdf(Seq(Seq("PLACEHOLDER")), flate = false)
    val p = Pdf.parsePdf(patchContent(base,
      "(PLACEHOLDER) Tj", "<486921> Tj (\\101\\102) Tj"))
    assert(p.ok && p.text == "Hi!AB" && p.nShows == 2)
  }

  test("shows outside BT/ET are ignored") {
    val base = Pdf.encodePdf(Seq(Seq("KEEPME")), flate = false)
    val p = Pdf.parsePdf(patchContent(base,
      "BT /F1 12 Tf", "(DROP) Tj BT /F1 12 Tf"))
    assert(p.ok && p.text == "KEEPME" && p.nShows == 1)
  }

  test("quarantine: encrypted, unsupported filter, truncation, junk") {
    val enc = Pdf.parsePdf(Pdf.encodePdf(Seq(Seq("s")), encrypted = true))
    assert(!enc.ok && enc.encrypted && enc.reason == "encrypted document")
    val filt = Pdf.parsePdf(Pdf.encodePdf(Seq(Seq("s")), badFilter = true))
    assert(!filt.ok && filt.reason == "unsupported filter /DCTDecode")
    val cut = Pdf.parsePdf(Pdf.encodePdf(Seq(Seq("s"))).take(80))
    assert(!cut.ok && cut.version == "1.4")
    val junk = Pdf.parsePdf("plain text".getBytes("US-ASCII"))
    assert(!junk.ok && junk.reason == "missing %PDF- magic")
    // a lying /Length (points past endstream) quarantines too
    val base = Pdf.encodePdf(Seq(Seq("abc")), flate = false)
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lied = s.replaceFirst("/Length (\\d\\d)", "/Length 9$1")
    val p = Pdf.parsePdf(
      lied.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(!p.ok && p.reason == "/Length past endstream")
  }

  test("sniff detects PDFs and routes them to the document lane") {
    val assets = Seq(
      (0L, Pdf.encodePdf(Seq(Seq("doc")))),
      (1L, "%PDF-x.y not a version".getBytes("US-ASCII")),
      (2L, "not remotely pdf".getBytes("US-ASCII")))
      .toDF("asset_id", "content")
    val got = graft.multimodal.Sniff.route(assets)
      .select(col("asset_id"), col("detected"), col("route"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, "application/pdf", "document"),
                      (1L, "unknown", "quarantine"),
                      (2L, "unknown", "quarantine")))
  }

  test("readPdf walks files; parsePdfs walks a content column") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pdf")
    java.nio.file.Files.write(tmp.resolve("a.pdf"),
      Pdf.encodePdf(Seq(Seq("file doc A"))))
    java.nio.file.Files.write(tmp.resolve("b.pdf"),
      Pdf.encodePdf(Seq(Seq("file doc B", "line two")), useTJ = true))
    val rows = Pdf.readPdf(spark, tmp.toString)
      .select(col("text"), col("n_pages"), col("ok"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("file doc A", 1, true),
                       ("file doc B\nline two", 1, true)))
    val viaCol = Pdf.parsePdfs(
      Seq((7L, Pdf.encodePdf(Seq(Seq("col doc"))))).toDF("asset_id", "content"))
      .select(col("asset_id"), col("text"), col("n_chars")).collect()(0)
    assert((viaCol.getLong(0), viaCol.getString(1), viaCol.getLong(2))
      == ((7L, "col doc", 7L)))
  }
}
