package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MediaKernel

/** PDF text extraction — the corpus world's second-biggest document
  * format after HTML: a zero-dependency structural walker over the
  * public ISO 32000 file syntax, the `pdftotext`-lite tier. The
  * extractor parses the REAL object graph (indirect objects, the
  * trailer, catalog → page-tree walk, content-stream references,
  * FlateDecode) and replays the content streams' TEXT operators —
  * `Tj` / `'` / `"` / `TJ` shows inside `BT`/`ET` text objects —
  * which is exactly what the simple-PDF majority of corpus documents
  * needs. The judgment-call tiers (font/CMap-aware Unicode mapping,
  * layout reconstruction, OCR) are deployment concerns; documents
  * needing them quarantine loudly instead of extracting garbage.
  *
  * ==Extraction rules (deterministic, twin-replayable)==
  *  1. Pages come from the catalog's page tree, depth-first in
  *     `/Kids` order (cycle-guarded); page texts join with `\n`.
  *  2. Within a page: `Tj`/`'`/`"` append their string, `TJ` appends
  *     its array's strings (kerning numbers ignored); `Td`/`TD`/
  *     `Tm`/`T*`/`'`/`"` begin a new line (one `\n`, never doubled);
  *     shows outside `BT`/`ET` are ignored.
  *  3. Literal strings decode the standard escapes (`\n \r \t \b \f
  *     \( \) \\`, octal `\ddd`, line continuations) with balanced
  *     nested parens; hex strings decode bytewise. Byte → char is
  *     Latin-1 (the simple-font fast path; CMap-mapped composite
  *     fonts are the documented boundary).
  *  4. Streams decode raw or via `/FlateDecode` (zlib); `/Length`
  *     may be an indirect reference (resolved after the full object
  *     scan — encoders routinely emit it as a follow-on object).
  *
  * ==Quarantine (ok = false, loud reason, never a throw)==
  * Missing `%PDF-` magic, `/Encrypt` in the trailer (flagged
  * `encrypted`), an unsupported content-stream filter (DCTDecode
  * etc.), a truncated or malformed object graph, no resolvable page
  * tree. Same captured-not-fatal posture as [[graft.multimodal
  * .Mp3Io]] — one bad document must never kill a 100-TB scan task.
  *
  * ==Scale notes==
  * Shards load via `binaryFile` (one task per file, the same 2 GB
  * bound and swap path documented on [[Warc]]); parsing is per-task
  * map work over the [[MediaKernel]] seam — no shuffle, bytes never
  * leave their partition.
  *
  * Reference behavior: the reference ships its own report as PDF
  * (`capstone_final_report.pdf`) but processes none; this source is
  * part of the 100-TB document-pipeline surface the brief adds. */
object Pdf {

  /** Structural + text facts of one PDF. Facts are null/zero when
    * `ok = false`; `reason` says why (null when ok). */
  final case class Parsed(version: String, nPages: Int, text: String,
                          nShows: Long, nContentBytes: Long,
                          encrypted: Boolean, ok: Boolean, reason: String)

  private def bad(reason: String, version: String = null,
                  encrypted: Boolean = false): Parsed =
    Parsed(version, 0, null, 0L, 0L, encrypted, ok = false, reason)

  private final case class PdfErr(msg: String) extends Exception(msg)

  // ---- object model ------------------------------------------------
  private sealed trait PVal
  private case class PNum(v: Double) extends PVal
  private case class PName(v: String) extends PVal
  private case class PStr(v: String) extends PVal
  private case class PArr(items: Vector[PVal]) extends PVal
  private case class PDict(m: Map[String, PVal]) extends PVal
  private case class PRef(num: Int) extends PVal
  private case object POther extends PVal

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == 0.toChar
  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent parser over the file's Latin-1 view (byte ↔
    * char 1:1, so offsets stay byte offsets). */
  private final class P(val s: String, var i: Int) {
    def ws(): Unit = {
      var go = true
      while (go) {
        while (i < s.length && isWs(s.charAt(i))) i += 1
        if (i < s.length && s.charAt(i) == '%') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else go = false
      }
    }

    def value(): PVal = {
      ws()
      if (i >= s.length) throw PdfErr("unexpected end of data")
      val c = s.charAt(i)
      if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') dict()
      else if (c == '<') hexString()
      else if (c == '[') array()
      else if (c == '(') litString()
      else if (c == '/') name()
      else if (c == 't' && s.startsWith("true", i)) { i += 4; POther }
      else if (c == 'f' && s.startsWith("false", i)) { i += 5; POther }
      else if (c == 'n' && s.startsWith("null", i)) { i += 4; POther }
      else if (c == '+' || c == '-' || c == '.' ||
               (c >= '0' && c <= '9')) numberOrRef()
      else throw PdfErr(s"unexpected char '$c' at $i")
    }

    private def dict(): PDict = {
      i += 2
      val b = Map.newBuilder[String, PVal]
      var done = false
      while (!done) {
        ws()
        if (i + 1 < s.length && s.charAt(i) == '>' &&
            s.charAt(i + 1) == '>') { i += 2; done = true }
        else {
          val k = name().v
          b += k -> value()
        }
      }
      PDict(b.result())
    }

    private def array(): PArr = {
      i += 1
      val b = Vector.newBuilder[PVal]
      var done = false
      while (!done) {
        ws()
        if (i < s.length && s.charAt(i) == ']') { i += 1; done = true }
        else b += value()
      }
      PArr(b.result())
    }

    private def name(): PName = {
      if (s.charAt(i) != '/') throw PdfErr(s"expected name at $i")
      i += 1
      val sb = new java.lang.StringBuilder()
      while (i < s.length && !isWs(s.charAt(i)) && !isDelim(s.charAt(i))) {
        val c = s.charAt(i)
        if (c == '#' && i + 2 < s.length) {
          val h = Integer.parseInt(s.substring(i + 1, i + 3), 16)
          sb.append(h.toChar); i += 3
        } else { sb.append(c); i += 1 }
      }
      PName(sb.toString)
    }

    private def litString(): PStr = {
      i += 1
      val sb = new java.lang.StringBuilder()
      var depth = 1
      while (depth > 0) {
        if (i >= s.length) throw PdfErr("unterminated string")
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) throw PdfErr("dangling escape")
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => // line continuation (CR or CRLF)
              i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < s.length && s.charAt(i) >= '0' &&
                     s.charAt(i) <= '7') {
                v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
              }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other); i += 2
          }
        } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
        else if (c == ')') {
          depth -= 1; if (depth > 0) sb.append(c); i += 1
        } else { sb.append(c); i += 1 }
      }
      PStr(sb.toString)
    }

    private def hexString(): PStr = {
      i += 1
      val sb = new java.lang.StringBuilder()
      val hex = new java.lang.StringBuilder()
      var done = false
      while (!done) {
        if (i >= s.length) throw PdfErr("unterminated hex string")
        val c = s.charAt(i)
        if (c == '>') { i += 1; done = true }
        else {
          if (!isWs(c)) {
            if (Character.digit(c, 16) < 0)
              throw PdfErr(s"bad hex digit '$c'")
            hex.append(c)
          }
          i += 1
        }
      }
      if (hex.length % 2 == 1) hex.append('0')
      var k = 0
      while (k < hex.length) {
        sb.append(Integer.parseInt(hex.substring(k, k + 2), 16).toChar)
        k += 2
      }
      PStr(sb.toString)
    }

    private def numberOrRef(): PVal = {
      val start = i
      if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.'))
        i += 1
      val tok = s.substring(start, i)
      val n = try tok.toDouble catch {
        case _: NumberFormatException => throw PdfErr(s"bad number $tok")
      }
      // "N G R" lookahead: an indirect reference
      if (n >= 0 && n == n.floor && !tok.contains('.')) {
        val save = i
        ws()
        val gStart = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (i > gStart) {
          ws()
          if (i < s.length && s.charAt(i) == 'R' &&
              (i + 1 >= s.length || isWs(s.charAt(i + 1)) ||
               isDelim(s.charAt(i + 1)))) {
            i += 1
            return PRef(n.toInt)
          }
        }
        i = save
      }
      PNum(n)
    }
  }

  // ---- document walk -----------------------------------------------

  private final case class Obj(value: PVal, streamOff: Int,
                               streamEnd: Int)

  private val ObjPattern =
    java.util.regex.Pattern.compile("(\\d+)\\s+(\\d+)\\s+obj\\b")

  /** Parse one PDF's bytes into structural + text facts. */
  def parsePdf(bytes: Array[Byte]): Parsed = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return bad("missing %PDF- magic")
    val verEnd = {
      var j = 5
      while (j < s.length && (s.charAt(j).isDigit || s.charAt(j) == '.'))
        j += 1
      j
    }
    val version = if (verEnd > 5) s.substring(5, verEnd) else null
    if (version == null) return bad("malformed version header")
    try {
      // object scan — offsets of every "N G obj", skipping matches
      // that fall inside a previous object's stream data (binary
      // payload bytes may spell anything; "endstream" bounds the
      // skip, /Length decides the decode later)
      val objects = scala.collection.mutable.LinkedHashMap[Int, Obj]()
      val m = ObjPattern.matcher(s)
      var guard = 0
      var searchFrom = 0
      while (m.find(searchFrom)) {
        guard += 1
        if (guard > 100000) throw PdfErr("object-count bound exceeded")
        val num = m.group(1).toInt
        val p = new P(s, m.end)
        val v = p.value()
        p.ws()
        var streamOff = -1
        var streamEnd = -1
        if (s.startsWith("stream", p.i)) {
          var d = p.i + 6
          if (d < s.length && s.charAt(d) == '\r') d += 1
          if (d < s.length && s.charAt(d) == '\n') d += 1
          streamOff = d
          streamEnd = s.indexOf("endstream", d)
          if (streamEnd < 0) throw PdfErr("unterminated stream")
        }
        objects.put(num, Obj(v, streamOff, streamEnd)) // later def wins
        searchFrom = if (streamEnd > 0) streamEnd else p.i
      }
      if (objects.isEmpty) throw PdfErr("no objects")

      def resolve(v: PVal): PVal = v match {
        case PRef(n) =>
          objects.get(n).map(_.value).getOrElse(
            throw PdfErr(s"dangling reference $n"))
        case other => other
      }

      // trailer: last trailer dict; xref-stream-only files fall back
      // to the catalog scan below
      val trailer: Option[PDict] = {
        val t = s.lastIndexOf("trailer")
        if (t < 0) None
        else new P(s, t + 7).value() match {
          case d: PDict => Some(d)
          case _ => None
        }
      }
      if (trailer.exists(_.m.contains("Encrypt")))
        return bad("encrypted document", version, encrypted = true)

      val catalog: PDict = trailer.flatMap(_.m.get("Root"))
        .map(resolve) match {
        case Some(d: PDict) => d
        case _ =>
          objects.values.map(_.value).collectFirst {
            case d: PDict if d.m.get("Type").contains(PName("Catalog")) => d
          }.getOrElse(throw PdfErr("no document catalog"))
      }

      // page-tree walk, /Kids order, cycle-guarded
      val pageRefs = Vector.newBuilder[PDict]
      val visited = scala.collection.mutable.HashSet[Int]()
      def walk(v: PVal, depth: Int): Unit = {
        if (depth > 64) throw PdfErr("page tree too deep")
        v match {
          case PRef(n) =>
            if (visited.add(n)) walk(resolve(PRef(n)), depth + 1)
          case d: PDict => d.m.get("Type") match {
            case Some(PName("Pages")) => d.m.get("Kids") match {
              case Some(PArr(kids)) => kids.foreach(walk(_, depth + 1))
              case _ => throw PdfErr("Pages node without Kids")
            }
            case Some(PName("Page")) => pageRefs += d
            case _ => throw PdfErr("unexpected page-tree node")
          }
          case _ => throw PdfErr("bad page-tree entry")
        }
      }
      walk(catalog.m.getOrElse("Pages",
        throw PdfErr("catalog without Pages")), 0)
      val pages = pageRefs.result()

      def streamBytes(ref: PVal): Array[Byte] = {
        val num = ref match {
          case PRef(n) => n
          case _ => throw PdfErr("content must be a stream reference")
        }
        val o = objects.getOrElse(num, throw PdfErr(s"no object $num"))
        val dict = o.value match {
          case d: PDict => d
          case _ => throw PdfErr("stream object without dict")
        }
        if (o.streamOff < 0) throw PdfErr("referenced object has no stream")
        val len = resolve(dict.m.getOrElse("Length",
          throw PdfErr("stream without /Length"))) match {
          case PNum(v) if v >= 0 && v == v.floor => v.toInt
          case _ => throw PdfErr("bad /Length")
        }
        if (o.streamOff + len > s.length || o.streamOff + len > o.streamEnd)
          throw PdfErr("/Length past endstream")
        val raw = bytes.slice(o.streamOff, o.streamOff + len)
        dict.m.get("Filter") match {
          case None => raw
          case Some(PName("FlateDecode")) => inflate(raw)
          case Some(PArr(Vector(PName("FlateDecode")))) => inflate(raw)
          case Some(f) =>
            val pretty = f match {
              case PName(n) => "/" + n
              case PArr(items) => items.map {
                case PName(n) => "/" + n
                case o => o.toString
              }.mkString("[", " ", "]")
              case o => o.toString
            }
            throw PdfErr(s"unsupported filter $pretty")
        }
      }

      var nShows = 0L
      var nContentBytes = 0L
      val pageTexts = pages.map { page =>
        val refs = page.m.get("Contents") match {
          case None => Vector.empty[PVal]
          case Some(r: PRef) => Vector(r)
          case Some(PArr(items)) => items
          case Some(_) => throw PdfErr("bad /Contents")
        }
        val sb = new java.lang.StringBuilder()
        refs.foreach { r =>
          val content = streamBytes(r)
          nContentBytes += content.length
          nShows += walkContent(
            new String(content, StandardCharsets.ISO_8859_1), sb)
        }
        sb.toString
      }
      Parsed(version, pages.length, pageTexts.mkString("\n"), nShows,
             nContentBytes, encrypted = false, ok = true, reason = null)
    } catch {
      case PdfErr(msg) => bad(msg, version)
      case _: StackOverflowError => bad("pathological nesting", version)
      case e: Exception => bad(s"parse failure: ${e.getMessage}", version)
    }
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater() // zlib wrapper — PDF FlateDecode is RFC 1950
    inf.setInput(raw)
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](1 << 14)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw PdfErr("corrupt FlateDecode stream")
        out.write(buf, 0, n)
      }
    } catch {
      case _: java.util.zip.DataFormatException =>
        throw PdfErr("corrupt FlateDecode stream")
    } finally inf.end()
    out.toByteArray
  }

  /** Replay one content stream's text operators into `sb`; returns
    * the show count. Operand stack is cleared after every operator —
    * PDF operators consume all their operands. */
  private def walkContent(c: String, sb: java.lang.StringBuilder): Long = {
    val p = new P(c, 0)
    val stack = scala.collection.mutable.ArrayBuffer[PVal]()
    var inText = false
    var shows = 0L
    def newline(): Unit =
      if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n')
        sb.append('\n')
    def show(): Unit = stack.lastOption match {
      case Some(PStr(t)) => sb.append(t); shows += 1
      case _ => () // malformed show — skip, keep walking
    }
    while ({ p.ws(); p.i < c.length }) {
      val ch = c.charAt(p.i)
      if (ch == '(' || ch == '<' || ch == '[' || ch == '/' ||
          ch == '+' || ch == '-' || ch == '.' || ch.isDigit) {
        stack += p.value()
      } else {
        val start = p.i
        while (p.i < c.length && !isWs(c.charAt(p.i)) &&
               !isDelim(c.charAt(p.i))) p.i += 1
        if (p.i == start) p.i += 1 // stray delimiter — skip
        c.substring(start, p.i) match {
          case "BT" => inText = true
          case "ET" => inText = false
          case "Tj" if inText => show()
          case "'" if inText => newline(); show()
          case "\"" if inText => newline(); show()
          case "TJ" if inText => stack.lastOption match {
            case Some(PArr(items)) =>
              items.foreach { case PStr(t) => sb.append(t); case _ => () }
              shows += 1
            case _ => ()
          }
          case "Td" | "TD" | "Tm" | "T*" if inText => newline()
          case _ => ()
        }
        stack.clear()
      }
    }
    shows
  }

  // ---- Spark surfaces ----------------------------------------------

  final class Parser extends MediaKernel.Handle[Array[Byte], Parsed] {
    def processBatch(batch: Seq[Array[Byte]]): Seq[Parsed] =
      batch.map(parsePdf)
  }

  val parserFactory: MediaKernel.Factory[Array[Byte], Parsed] =
    new MediaKernel.Factory[Array[Byte], Parsed] {
      def open() = new Parser
    }

  /** Parse a `(asset_id, content)` frame of PDF bytes (map-shaped,
    * [[MediaKernel]] batching). */
  def parsePdfs(assets: DataFrame, batchSize: Int = 32): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    MediaKernel.runKernel(assets, parserFactory, batchSize)
      .map { case (id, p) =>
        (id, p.version, p.nPages, p.text,
         if (p.text == null) 0L else p.text.length.toLong,
         p.nShows, p.nContentBytes, p.encrypted, p.ok, p.reason)
      }
      .toDF("asset_id", "version", "n_pages", "text", "n_chars",
            "n_shows", "n_content_bytes", "encrypted", "ok", "reason")
  }

  /** Read PDF files → one row per document (binaryFile loading; the
    * [[Warc]] scale notes apply). */
  def readPdf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (f, raw) =>
        val p = parsePdf(raw)
        (f, p.version, p.nPages, p.text,
         if (p.text == null) 0L else p.text.length.toLong,
         p.nShows, p.nContentBytes, p.encrypted, p.ok, p.reason)
      }
      .toDF("pdf_file", "version", "n_pages", "text", "n_chars",
            "n_shows", "n_content_bytes", "encrypted", "ok", "reason")
  }

  // ---- fixture writer (the encoder side of the same syntax) --------

  /** Serialize a syntactically-complete PDF — catalog, page tree,
    * per-page content streams, font, byte-accurate xref table and
    * trailer — for the authored-fixture oracles (the
    * [[graft.multimodal.Mp3Io.encodeMp3]] role). Each page is a list
    * of text lines rendered `BT … Td (l0) Tj T* (l1) Tj … ET`;
    * `useTJ` renders each line as a two-part kerned `TJ` array
    * (concatenating to the same text); `indirectLength` emits every
    * content stream's `/Length` as a follow-on integer object;
    * `encrypted` plants an `/Encrypt` dict in the trailer (the
    * quarantine case — no actual crypto, which is exactly why the
    * reader must refuse by STRUCTURE, not by failed decode);
    * `badFilter` declares `/DCTDecode` on the content streams. */
  def encodePdf(pages: Seq[Seq[String]], flate: Boolean = true,
                useTJ: Boolean = false, indirectLength: Boolean = false,
                version: String = "1.4", encrypted: Boolean = false,
                badFilter: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    def esc(t: String): String =
      t.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      }
    def contentOps(lines: Seq[String]): String = {
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
      lines.zipWithIndex.foreach { case (l, k) =>
        if (k > 0) sb.append("T* ")
        if (useTJ) {
          val cut = l.length / 2
          sb.append("[(").append(esc(l.substring(0, cut)))
            .append(") -250 (").append(esc(l.substring(cut)))
            .append(")] TJ ")
        } else sb.append("(").append(esc(l)).append(") Tj ")
      }
      sb.append("ET").toString
    }
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new Deflater()
      d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream(b.length)
      val buf = new Array[Byte](1 << 14)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val n = pages.length
    val fontObj = 3 + 2 * n
    val nObjs = if (indirectLength) fontObj + n else fontObj
    val out = new ByteArrayOutputStream()
    def w(str: String): Unit =
      out.write(str.getBytes(StandardCharsets.ISO_8859_1))
    val offs = new Array[Int](nObjs + 1)
    w(s"%PDF-$version\n%âãÏÓ\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offs(num) = out.size
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2) {
      val kids = (0 until n).map(k => s"${3 + 2 * k} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [$kids] /Count $n >>\n")
    }
    val streams = pages.map { lines =>
      val raw = contentOps(lines).getBytes(StandardCharsets.ISO_8859_1)
      if (flate) deflate(raw) else raw
    }
    (0 until n).foreach { k =>
      obj(3 + 2 * k)(w(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
          s"/Contents ${4 + 2 * k} 0 R >>\n"))
      obj(4 + 2 * k) {
        val data = streams(k)
        val lenSpec =
          if (indirectLength) s"${fontObj + 1 + k} 0 R"
          else data.length.toString
        val filter =
          if (badFilter) " /Filter /DCTDecode"
          else if (flate) " /Filter /FlateDecode"
          else ""
        w(s"<< /Length $lenSpec$filter >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    obj(fontObj)(w(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    if (indirectLength) (0 until n).foreach { k =>
      obj(fontObj + 1 + k)(w(s"${streams(k).length}\n"))
    }
    val xref = out.size
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach(i => w(f"${offs(i)}%010d 00000 n \n"))
    val enc =
      if (encrypted) " /Encrypt << /Filter /Standard /V 1 >>" else ""
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R$enc >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }
}
