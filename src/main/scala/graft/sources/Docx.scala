package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.MediaKernel

/** Office/ebook document sources: DOCX (OOXML WordprocessingML) and
  * EPUB — the corpus world's next format family after HTML and PDF
  * (reference repo has no document surface; this is the SURVEY §2.11
  * ingest-loop extension, the [[Pdf]] posture applied to the two
  * zip-container formats).
  *
  * Both formats are "zip + XML", so the reader is a zero-dependency
  * `java.util.zip` walk plus the same lexical-XML discipline the
  * [[graft.text.Html]] kernels use — no XML parser dependency, no
  * entity expansion beyond the five predefined XML entities + numeric
  * references (which also means no XXE/billion-laughs surface at
  * all: nothing here resolves an external entity or nests
  * expansions).
  *
  * ==What is parsed (real structure, not a sniff)==
  *  - DOCX: the zip must carry `[Content_Types].xml` and
  *    `word/document.xml`; text is the concatenation of `<w:t>` runs
  *    per `<w:p>` paragraph (tabs/breaks folded to whitespace),
  *    paragraphs newline-joined; the title comes from
  *    `docProps/core.xml`'s `dc:title` when present.
  *  - EPUB: the zip must carry a `mimetype` entry equal to
  *    `application/epub+zip` (OCF §3.3) and
  *    `META-INF/container.xml`, which names the OPF package file;
  *    chapters are read in SPINE order (manifest id → href,
  *    href resolved against the OPF directory), each through the
  *    [[graft.text.HtmlText]] extractor; the title is the OPF
  *    `dc:title`.
  *
  * ==100-TB shape==
  * Parsing is map-shaped over `(asset_id, content)` ([[MediaKernel]]
  * batching — one handle per partition, no shuffle, nothing
  * driver-side); per-asset work is bounded by [[MaxBytes]] /
  * [[MaxEntries]] (the `Robots.compile` byte-bounding posture — a
  * hostile zip bomb fails loudly instead of inflating unbounded).
  *
  * Fixture writers ([[encodeDocx]]/[[encodeEpub]]) serialize REAL
  * containers (deflated entries; EPUB's `mimetype` STORED first, as
  * OCF requires) so the oracle queries gate genuine zip walking and
  * inflation, not a handshake with a fake.
  */
object Docx {

  /** Inflation bounds: a single entry or the walked total past these
    * fails the document with reason `zip_bounds` (zip-bomb guard). */
  val MaxBytes: Long = 64L << 20
  val MaxEntries: Int = 4096

  final case class DocxParsed(title: String, text: String,
                              nParagraphs: Long, nChars: Long,
                              ok: Boolean, reason: String)
  final case class EpubParsed(title: String, text: String,
                              nChapters: Long, nChars: Long,
                              ok: Boolean, reason: String)

  // ---- zip walk -----------------------------------------------------

  /** All entries of a zip byte array (name → bytes), inflation-bounded.
    * Directory entries skipped. Throws IllegalArgumentException with a
    * short reason on malformed/oversized input. */
  private[sources] def zipEntries(bytes: Array[Byte])
      : Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var total = 0L
    var n = 0
    val buf = new Array[Byte](8192)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          n += 1
          if (n > MaxEntries)
            throw new IllegalArgumentException("zip_bounds")
          val bos = new ByteArrayOutputStream()
          var r = zin.read(buf)
          while (r >= 0) {
            total += r
            if (total > MaxBytes)
              throw new IllegalArgumentException("zip_bounds")
            bos.write(buf, 0, r)
            r = zin.read(buf)
          }
          out += e.getName -> bos.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  // ---- lexical XML helpers -------------------------------------------

  /** The five predefined XML entities + numeric character references —
    * everything a non-DTD XML document can legally carry. */
  private def decodeXmlEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val sc = s.indexOf(';', i + 1)
        val body = if (sc > i && sc - i <= 12) s.substring(i + 1, sc) else null
        val rep = body match {
          case null => null
          case "lt" => "<"
          case "gt" => ">"
          case "amp" => "&"
          case "quot" => "\""
          case "apos" => "'"
          case b if b.startsWith("#x") || b.startsWith("#X") =>
            try String.valueOf(Character.toChars(
              Integer.parseInt(b.substring(2), 16)))
            catch { case _: Exception => null }
          case b if b.startsWith("#") =>
            try String.valueOf(Character.toChars(
              Integer.parseInt(b.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep != null) { sb.append(rep); i = sc + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Text content of the FIRST `<name …>…</name>` element, entity-
    * decoded; null when absent. Namespace-prefix-tolerant when
    * `name` carries none (matches `dc:title` for name "title"? no —
    * callers pass the prefixed form they mean). */
  private[sources] def firstElementText(xml: String, name: String)
      : String = {
    var from = 0
    while (true) {
      val at = xml.indexOf("<" + name, from)
      if (at < 0) return null
      val after = at + 1 + name.length
      // must be a real name boundary, not a prefix of a longer name
      if (after < xml.length &&
          (xml.charAt(after) == '>' || Character.isWhitespace(xml.charAt(after)))) {
        val gt = xml.indexOf('>', at)
        if (gt < 0) return null
        if (xml.charAt(gt - 1) == '/') return "" // self-closing
        val close = xml.indexOf("</" + name, gt + 1)
        if (close < 0) return null
        return decodeXmlEntities(xml.substring(gt + 1, close)).trim
      }
      from = at + 1
    }
    null
  }

  /** Value of `key="…"` inside an element tag string. */
  private def attr(tag: String, key: String): String = {
    val at = tag.indexOf(key + "=\"")
    if (at < 0) null
    else {
      val start = at + key.length + 2
      val end = tag.indexOf('"', start)
      if (end < 0) null else decodeXmlEntities(tag.substring(start, end))
    }
  }

  // ---- DOCX ----------------------------------------------------------

  private def bad(reason: String): DocxParsed =
    DocxParsed(null, null, 0L, 0L, ok = false, reason)

  /** Parse DOCX bytes: zip walk → `word/document.xml` paragraph/run
    * scan. Never throws — malformed input returns `ok=false` with a
    * short reason. */
  def parseDocx(bytes: Array[Byte]): DocxParsed = {
    val entries =
      try zipEntries(bytes)
      catch { case e: Exception =>
        return bad(if (e.getMessage == "zip_bounds") "zip_bounds"
                   else "bad_zip")
      }
    if (!entries.contains("[Content_Types].xml"))
      return bad("missing_content_types")
    val doc = entries.getOrElse("word/document.xml", null)
    if (doc == null) return bad("missing_document_xml")
    val xml = new String(doc, java.nio.charset.StandardCharsets.UTF_8)
    val paras = Seq.newBuilder[String]
    var i = 0
    var nP = 0L
    while (i < xml.length) {
      val p = xml.indexOf("<w:p", i)
      if (p < 0) { i = xml.length }
      else {
        val after = p + 4
        // <w:p> or <w:p attrs> — not <w:pPr>, <w:pStyle>…
        val isPara = after < xml.length &&
          (xml.charAt(after) == '>' || xml.charAt(after) == ' ' ||
           xml.charAt(after) == '/')
        if (!isPara) { i = p + 4 }
        else if (xml.startsWith("/>", xml.indexOf('>', p) - 1)) {
          nP += 1; paras += ""; i = xml.indexOf('>', p) + 1
        } else {
          nP += 1
          val end = xml.indexOf("</w:p>", p)
          val body = if (end < 0) xml.substring(p) else xml.substring(p, end)
          val sb = new java.lang.StringBuilder()
          var j = 0
          while (j < body.length) {
            val t = body.indexOf("<w:t", j)
            if (t < 0) { j = body.length }
            else {
              val afterT = t + 4
              val isRun = afterT < body.length &&
                (body.charAt(afterT) == '>' || body.charAt(afterT) == ' ' ||
                 body.charAt(afterT) == '/')
              if (!isRun) {
                // <w:tab/>, <w:tc>… — tabs fold to a space
                if (body.startsWith("<w:tab", t)) sb.append(' ')
                j = t + 4
              } else {
                val gt = body.indexOf('>', t)
                if (gt < 0) { j = body.length }
                else if (body.charAt(gt - 1) == '/') { j = gt + 1 }
                else {
                  val close = body.indexOf("</w:t>", gt)
                  if (close < 0) { j = body.length }
                  else {
                    sb.append(decodeXmlEntities(body.substring(gt + 1, close)))
                    j = close + 6
                  }
                }
              }
            }
          }
          paras += sb.toString
          i = if (end < 0) xml.length else end + 6
        }
      }
    }
    val text = paras.result().mkString("\n")
    val title = entries.get("docProps/core.xml")
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
      .map(x => firstElementText(x, "dc:title")).orNull
    DocxParsed(title, text, nP, text.length.toLong, ok = true, null)
  }

  // ---- EPUB ----------------------------------------------------------

  private def badE(reason: String): EpubParsed =
    EpubParsed(null, null, 0L, 0L, ok = false, reason)

  /** Parse EPUB bytes: OCF mimetype check → container.xml → OPF
    * manifest/spine → chapters in spine order through the
    * [[graft.text.HtmlText]] extractor. Never throws. */
  def parseEpub(bytes: Array[Byte]): EpubParsed = {
    val entries =
      try zipEntries(bytes)
      catch { case e: Exception =>
        return badE(if (e.getMessage == "zip_bounds") "zip_bounds"
                    else "bad_zip")
      }
    val mime = entries.get("mimetype")
      .map(b => new String(b,
        java.nio.charset.StandardCharsets.US_ASCII).trim).orNull
    if (mime != "application/epub+zip") return badE("bad_mimetype")
    val container = entries.get("META-INF/container.xml")
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
      .orNull
    if (container == null) return badE("missing_container")
    // <rootfile full-path="OEBPS/content.opf" …/> — note the trailing
    // space: a bare "<rootfile" prefix would match "<rootfiles>" first
    val rfAt = container.indexOf("<rootfile ")
    val opfPath =
      if (rfAt < 0) null
      else attr(container.substring(rfAt,
        math.min(container.length, container.indexOf('>', rfAt) + 1)),
        "full-path")
    if (opfPath == null || !entries.contains(opfPath))
      return badE("missing_opf")
    val opf = new String(entries(opfPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val opfDir = {
      val slash = opfPath.lastIndexOf('/')
      if (slash < 0) "" else opfPath.substring(0, slash + 1)
    }
    // manifest: id → href
    val manifest = scala.collection.mutable.Map[String, String]()
    var i = 0
    while ({ i = opf.indexOf("<item ", i); i >= 0 }) {
      val gt = opf.indexOf('>', i)
      if (gt < 0) { i = opf.length }
      else {
        val tag = opf.substring(i, gt + 1)
        val id = attr(tag, "id"); val href = attr(tag, "href")
        if (id != null && href != null) manifest(id) = href
        i = gt + 1
      }
    }
    // spine: ordered idrefs
    val spine = Seq.newBuilder[String]
    i = 0
    while ({ i = opf.indexOf("<itemref", i); i >= 0 }) {
      val gt = opf.indexOf('>', i)
      if (gt < 0) { i = opf.length }
      else {
        val idref = attr(opf.substring(i, gt + 1), "idref")
        if (idref != null) spine += idref
        i = gt + 1
      }
    }
    val chapterTexts = spine.result().flatMap { idref =>
      manifest.get(idref).flatMap { href =>
        entries.get(opfDir + href).map { b =>
          val html = new String(b, java.nio.charset.StandardCharsets.UTF_8)
          String.valueOf(graft.text.HtmlText.extract(
            UTF8String.fromString(html)))
        }
      }
    }
    if (chapterTexts.isEmpty) return badE("empty_spine")
    val text = chapterTexts.mkString("\n\n")
    val title = firstElementText(opf, "dc:title")
    EpubParsed(title, text, chapterTexts.size.toLong,
      text.length.toLong, ok = true, null)
  }

  // ---- Spark surfaces -------------------------------------------------

  private val docxFactory
      : MediaKernel.Factory[Array[Byte], DocxParsed] =
    new MediaKernel.Factory[Array[Byte], DocxParsed] {
      def open() = new MediaKernel.Handle[Array[Byte], DocxParsed] {
        def processBatch(batch: Seq[Array[Byte]]): Seq[DocxParsed] =
          batch.map(parseDocx)
      }
    }

  private val epubFactory
      : MediaKernel.Factory[Array[Byte], EpubParsed] =
    new MediaKernel.Factory[Array[Byte], EpubParsed] {
      def open() = new MediaKernel.Handle[Array[Byte], EpubParsed] {
        def processBatch(batch: Seq[Array[Byte]]): Seq[EpubParsed] =
          batch.map(parseEpub)
      }
    }

  /** Parse an `(asset_id, content)` frame of DOCX bytes (map-shaped,
    * [[MediaKernel]] batching). */
  def parseDocxAssets(assets: DataFrame, batchSize: Int = 32)
      : DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, docxFactory, batchSize)
      .map { case (id, p) =>
        (id, p.title, p.text, p.nParagraphs, p.nChars, p.ok, p.reason)
      }
      .toDF("asset_id", "title", "text", "n_paragraphs", "n_chars",
            "ok", "reason")
  }

  /** Parse an `(asset_id, content)` frame of EPUB bytes. */
  def parseEpubAssets(assets: DataFrame, batchSize: Int = 32)
      : DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, epubFactory, batchSize)
      .map { case (id, p) =>
        (id, p.title, p.text, p.nChapters, p.nChars, p.ok, p.reason)
      }
      .toDF("asset_id", "title", "text", "n_chapters", "n_chars",
            "ok", "reason")
  }

  /** Read DOCX files → one row per document (binaryFile loading; the
    * [[Warc]] scale notes apply). */
  def readDocx(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (f, raw) =>
        val p = parseDocx(raw)
        (f, p.title, p.text, p.nParagraphs, p.nChars, p.ok, p.reason)
      }
      .toDF("docx_file", "title", "text", "n_paragraphs", "n_chars",
            "ok", "reason")
  }

  // ---- fixture writers (the encoder side of the same containers) ----

  private def zipAdd(zos: ZipOutputStream, name: String,
                     bytes: Array[Byte], stored: Boolean = false): Unit = {
    val e = new ZipEntry(name)
    if (stored) {
      e.setMethod(ZipEntry.STORED)
      e.setSize(bytes.length.toLong)
      e.setCompressedSize(bytes.length.toLong)
      val crc = new CRC32(); crc.update(bytes)
      e.setCrc(crc.getValue)
    }
    zos.putNextEntry(e)
    zos.write(bytes)
    zos.closeEntry()
  }

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Serialize a real DOCX container — `[Content_Types].xml`, rels,
    * `docProps/core.xml` (title), and a WordprocessingML body with one
    * `<w:p>/<w:r>/<w:t>` chain per paragraph — for the authored-
    * fixture oracles. */
  def encodeDocx(title: String, paragraphs: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zipAdd(zos, "[Content_Types].xml",
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
       """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
       """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
       """<Default Extension="xml" ContentType="application/xml"/>""" +
       """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
       """</Types>""").getBytes("UTF-8"))
    zipAdd(zos, "_rels/.rels",
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
       """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
       """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
       """</Relationships>""").getBytes("UTF-8"))
    zipAdd(zos, "docProps/core.xml",
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
       """<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
       s"<dc:title>${xmlEsc(title)}</dc:title>" +
       """</cp:coreProperties>""").getBytes("UTF-8"))
    val body = paragraphs.map(p =>
      s"<w:p><w:r><w:t xml:space=\"preserve\">${xmlEsc(p)}</w:t></w:r></w:p>")
      .mkString
    zipAdd(zos, "word/document.xml",
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
       """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
       s"<w:body>$body</w:body></w:document>").getBytes("UTF-8"))
    zos.close()
    bos.toByteArray
  }

  /** Serialize a real EPUB (OCF) container — STORED `mimetype` first
    * (as the spec requires), container.xml, an OPF with manifest +
    * spine, and one XHTML file per chapter `(name, paragraphs)`. */
  def encodeEpub(title: String,
                 chapters: Seq[(String, Seq[String])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zipAdd(zos, "mimetype",
      "application/epub+zip".getBytes("US-ASCII"), stored = true)
    zipAdd(zos, "META-INF/container.xml",
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
       """<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
       """<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>""" +
       """</container>""").getBytes("UTF-8"))
    val manifest = chapters.zipWithIndex.map { case ((name, _), i) =>
      s"""<item id="c$i" href="$name" media-type="application/xhtml+xml"/>"""
    }.mkString
    val spine = chapters.indices.map(i =>
      s"""<itemref idref="c$i"/>""").mkString
    zipAdd(zos, "OEBPS/content.opf",
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
       """<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">""" +
       """<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
       s"<dc:title>${xmlEsc(title)}</dc:title>" +
       """<dc:identifier id="uid">urn:graft:fixture</dc:identifier>""" +
       "</metadata>" +
       s"<manifest>$manifest</manifest><spine>$spine</spine>" +
       "</package>").getBytes("UTF-8"))
    chapters.foreach { case (name, paras) =>
      val body = paras.map(p => s"<p>${xmlEsc(p)}</p>").mkString
      zipAdd(zos, "OEBPS/" + name,
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
         """<html xmlns="http://www.w3.org/1999/xhtml"><head>""" +
         s"<title>${xmlEsc(title)}</title></head>" +
         s"<body>$body</body></html>").getBytes("UTF-8"))
    }
    zos.close()
    bos.toByteArray
  }
}
