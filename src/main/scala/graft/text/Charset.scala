package graft.text

import java.nio.charset.{StandardCharsets, Charset => JCharset}
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset sniffing + decoding for crawled payloads — the byte→text
  * boundary the crawl lane crossed BLIND until now: `cast(body AS
  * string)` decodes every HTTP body as UTF-8, but a double-digit
  * fraction of the real web is windows-1252/legacy-labeled, and at
  * 100 TB "blind UTF-8" silently turns every such page into
  * replacement-character soup that then poisons language ID, quality
  * scores, dedup shingles, and the training corpus itself.
  *
  * ==Detection cascade (the WHATWG `decode` order, the one browsers
  * and Common Crawl's WET extractors follow)==
  *  1. byte-order mark — authoritative over everything (a BOM'd
  *     page mislabeled by its server still renders as its BOM says);
  *  2. transport layer: the HTTP `Content-Type` header's `charset`
  *     parameter;
  *  3. content prescan: `<meta charset=…>` / `<meta http-equiv=
  *     "content-type" content="…; charset=…">` within the first
  *     1024 bytes (the WHATWG prescan window, ASCII-superset scan);
  *  4. no label anywhere: bodies that VALIDATE as UTF-8 (strict
  *     table walk, no decoder allocation) are UTF-8;
  *  5. everything else falls back to windows-1252 — the WHATWG
  *     default for unlabeled legacy content.
  * Labels normalize per the WHATWG encoding registry's aliasing:
  * `iso-8859-1`/`latin1`/`us-ascii` MEAN windows-1252 on the real
  * web (the superset every browser substitutes); unknown labels fall
  * through to steps 4/5 rather than failing the row.
  *
  * ==Mojibake repair (`fix_mojibake`)==
  * The single most common corpus corruption: UTF-8 bytes decoded as
  * windows-1252 somewhere upstream ("é" → "Ã©", "–" → "â€“"). The
  * repair is the ftfy core move: re-encode through windows-1252
  * (sloppy: the five unmapped 0x8x/0x9x holes pass through as their
  * Latin-1 code points, so round-trips are exact inverses), strict-
  * decode as UTF-8, and keep the result ONLY if the whole string
  * round-trips cleanly — correctly-encoded text containing a lone
  * `Ã` fails the strict decode and passes through untouched. Two
  * passes, so double-mangled text repairs too.
  *
  * ==Scale shape==
  * Every kernel is per-row map work over bytes already in the task
  * (a prefix scan + one linear validation pass) inside whole-stage
  * codegen — no shuffle, no UDF boundary, no allocation beyond the
  * decoded string itself. */
object CharsetSniff {

  /** Column API: detected charset label of an HTTP body.
    * `contentType` is the HTTP `Content-Type` header value (null →
    * treated as absent, not a null result). */
  def sniffCharset(body: Column, contentType: Column): Column =
    ColumnBridge.column(SniffCharset(
      ColumnBridge.expression(body),
      ColumnBridge.expression(coalesce(contentType, lit("")))))

  /** Column API: the body decoded per the detection cascade (BOM
    * stripped; malformed sequences → U+FFFD, the cast-to-string
    * convention). */
  def decodePayload(body: Column, contentType: Column): Column =
    ColumnBridge.column(DecodePayload(
      ColumnBridge.expression(body),
      ColumnBridge.expression(coalesce(contentType, lit("")))))

  /** Column API: windows-1252-of-UTF-8 mojibake repaired; clean text
    * passes through unchanged. */
  def fixMojibake(text: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(text)))

  // ---- label normalization ----------------------------------------

  /** WHATWG-registry alias → canonical label. The legacy Latin
    * family all means windows-1252 on the web. */
  private val aliases: Map[String, String] = Map(
    "utf-8" -> "utf-8", "utf8" -> "utf-8",
    "unicode-1-1-utf-8" -> "utf-8",
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "iso_8859-1" -> "windows-1252", "latin1" -> "windows-1252",
    "l1" -> "windows-1252", "cp819" -> "windows-1252",
    "cp1252" -> "windows-1252", "x-cp1252" -> "windows-1252",
    "windows-1252" -> "windows-1252",
    "ascii" -> "windows-1252", "us-ascii" -> "windows-1252",
    "ansi_x3.4-1968" -> "windows-1252",
    "utf-16" -> "utf-16le", "utf-16le" -> "utf-16le",
    "utf-16be" -> "utf-16be")

  /** Canonical label for a raw charset token, or null when the label
    * is unknown to both the alias table and the JVM. */
  private[text] def canonicalLabel(raw: String): String = {
    if (raw == null) return null
    val t = raw.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'")
      .trim.toLowerCase(Locale.ROOT)
    if (t.isEmpty) return null
    aliases.getOrElse(t,
      try { if (JCharset.isSupported(t))
              JCharset.forName(t).name().toLowerCase(Locale.ROOT)
            else null }
      catch { case _: Exception => null })
  }

  /** `charset` parameter of a Content-Type header value, canonical,
    * or null. */
  private[text] def headerCharset(contentType: String): String = {
    if (contentType == null) return null
    val lower = contentType.toLowerCase(Locale.ROOT)
    val at = lower.indexOf("charset")
    if (at < 0) return null
    var i = at + "charset".length
    while (i < contentType.length && contentType.charAt(i) == ' ') i += 1
    if (i >= contentType.length || contentType.charAt(i) != '=') return null
    i += 1
    while (i < contentType.length && contentType.charAt(i) == ' ') i += 1
    val end0 = contentType.indexOf(';', i)
    val end = if (end0 < 0) contentType.length else end0
    canonicalLabel(contentType.substring(i, end))
  }

  private val PrescanWindow = 1024

  /** WHATWG-style meta prescan: the first `<meta …>` tag in the
    * first 1024 bytes carrying either a `charset` attribute or an
    * `http-equiv=content-type` + `content="…charset=…"` pair. Bytes
    * read as Latin-1 (an ASCII superset — the labels themselves are
    * ASCII, so the lens is lossless where it matters). */
  private[text] def metaCharset(body: Array[Byte]): String = {
    if (body == null) return null
    val n = math.min(body.length, PrescanWindow)
    val s = new String(body, 0, n, StandardCharsets.ISO_8859_1)
    var i = 0
    while (i < s.length) {
      val at = s.indexOf("<meta", i)
      if (at < 0 || !(at + 5 < s.length &&
            (s.charAt(at + 5) == ' ' || s.charAt(at + 5) == '\t' ||
             s.charAt(at + 5) == '\n' || s.charAt(at + 5) == '\r' ||
             s.charAt(at + 5) == '/'))) {
        if (at < 0) return null
        i = at + 5
      } else {
        val close = s.indexOf('>', at)
        val tag = if (close < 0) s.substring(at) else s.substring(at, close)
        val direct = attrToken(tag, "charset")
        if (direct != null) {
          val c = canonicalLabel(direct)
          if (c != null) return c
        }
        val content = attrToken(tag, "content")
        if (content != null) {
          val c = headerCharset(content)
          if (c != null) return c
        }
        if (close < 0) return null
        i = close + 1
      }
    }
    null
  }

  /** Value of `key=…` inside a tag blob: quoted or bare token;
    * case-insensitive key; null when absent. Requires a non-name
    * character before the key so `content=` does not match inside
    * `http-equiv-content=`. */
  private def attrToken(tag: String, key: String): String = {
    val lower = tag.toLowerCase(Locale.ROOT)
    var from = 0
    while (from < lower.length) {
      val at = lower.indexOf(key, from)
      if (at < 0) return null
      val beforeOk = at == 0 || {
        val c = lower.charAt(at - 1)
        !(Character.isLetterOrDigit(c) || c == '-' || c == '_')
      }
      var i = at + key.length
      while (i < tag.length && (tag.charAt(i) == ' ' ||
             tag.charAt(i) == '\t')) i += 1
      if (beforeOk && i < tag.length && tag.charAt(i) == '=') {
        i += 1
        while (i < tag.length && (tag.charAt(i) == ' ' ||
               tag.charAt(i) == '\t')) i += 1
        if (i >= tag.length) return null
        val q = tag.charAt(i)
        if (q == '"' || q == '\'') {
          val end = tag.indexOf(q, i + 1)
          return if (end < 0) null else tag.substring(i + 1, end)
        }
        var end = i
        while (end < tag.length && tag.charAt(end) != ' ' &&
               tag.charAt(end) != '\t' && tag.charAt(end) != '/' &&
               tag.charAt(end) != '>' && tag.charAt(end) != ';') end += 1
        return tag.substring(i, end)
      }
      from = at + key.length
    }
    null
  }

  // ---- UTF-8 validation (strict, table-free linear walk) ----------

  /** Strict UTF-8 validity: correct continuation counts, no overlong
    * forms, no surrogates, max U+10FFFF. */
  private[text] def validUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= b.length) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        if (c == 0xe0 && c1 < 0xa0) return false // overlong
        if (c == 0xed && c1 >= 0xa0) return false // surrogate
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= b.length) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80 ||
            (b(i + 3) & 0xc0) != 0x80) return false
        if (c == 0xf0 && c1 < 0x90) return false // overlong
        if (c == 0xf4 && c1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  private def bomOf(b: Array[Byte]): String = {
    if (b == null) null
    else if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
             (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) "utf-8"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xfe &&
             (b(1) & 0xff) == 0xff) "utf-16be"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff &&
             (b(1) & 0xff) == 0xfe) "utf-16le"
    else null
  }

  private def bomLen(label: String): Int = label match {
    case "utf-8" => 3
    case "utf-16be" | "utf-16le" => 2
    case _ => 0
  }

  /** The full cascade; never null for non-null bytes. */
  def detect(body: Array[Byte], contentType: String): String = {
    val bom = bomOf(body)
    if (bom != null) return bom
    val hdr = headerCharset(contentType)
    if (hdr != null) return hdr
    val meta = metaCharset(body)
    if (meta != null) return meta
    if (validUtf8(body, 0)) "utf-8" else "windows-1252"
  }

  /** Kernel for the generated call site. */
  def sniff(body: Array[Byte], contentType: UTF8String): UTF8String =
    UTF8String.fromString(
      detect(body, if (contentType == null) null else contentType.toString))

  /** Kernel: detect + decode (BOM skipped, malformed → U+FFFD). */
  def decodeKernel(body: Array[Byte], contentType: UTF8String)
      : UTF8String = {
    val label = detect(body,
      if (contentType == null) null else contentType.toString)
    val skip = if (bomOf(body) != null) bomLen(label) else 0
    val cs = label match {
      case "utf-8" => StandardCharsets.UTF_8
      case "utf-16le" => StandardCharsets.UTF_16LE
      case "utf-16be" => StandardCharsets.UTF_16BE
      case other => try JCharset.forName(other)
                    catch { case _: Exception => StandardCharsets.UTF_8 }
    }
    // String(bytes, charset) replaces malformed input with U+FFFD —
    // the same convention as cast(binary AS string)
    UTF8String.fromString(
      new String(body, skip, body.length - skip, cs))
  }

  // ---- mojibake repair --------------------------------------------

  /** cp1252 byte ↔ char for 0x80–0x9F (the non-Latin-1 block); -1 =
    * the five unmapped holes, which pass through as Latin-1 so the
    * sloppy round-trip is exact. */
  private val cp1252High: Array[Int] = Array(
    0x20ac, -1, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017d, -1,
    -1, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, -1, 0x017e, 0x0178)

  private lazy val cp1252Rev: Map[Int, Int] =
    cp1252High.zipWithIndex.collect {
      case (cp, i) if cp >= 0 => cp -> (0x80 + i)
    }.toMap

  /** Sloppy windows-1252 encode: every char of `s` to one byte, or
    * null when any char has no cp1252/Latin-1 byte (then `s` cannot
    * be mojibake of anything). */
  private def sloppyCp1252Bytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val b =
        if (c < 0x80 || (c >= 0xa0 && c <= 0xff)) c
        else if (c >= 0x80 && c <= 0x9f) c // a hole decoded as Latin-1
        else cp1252Rev.getOrElse(c, -1)
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    out
  }

  /** Sloppy windows-1252 decode of raw bytes (holes → Latin-1) —
    * the fixture-side mangler, the exact inverse of
    * [[sloppyCp1252Bytes]]. */
  private[graft] def sloppyCp1252Decode(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      val cp = if (v >= 0x80 && v <= 0x9f) {
        val m = cp1252High(v - 0x80); if (m >= 0) m else v
      } else v
      sb.append(cp.toChar)
      i += 1
    }
    sb.toString
  }

  /** One repair pass: re-encode via sloppy cp1252, strict-decode as
    * UTF-8; null when the string is not whole-string mojibake. */
  private def repairOnce(s: String): String = {
    // pure ASCII cannot be mojibake; also the common fast path
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) >= 0x80) hasHigh = true; i += 1
    }
    if (!hasHigh) return null
    val bytes = sloppyCp1252Bytes(s)
    if (bytes == null) return null
    // require at least one multi-byte sequence to actually decode —
    // an all-Latin-1 string round-trips trivially and is NOT mojibake
    if (!validUtf8(bytes, 0)) return null
    var hasMulti = false
    i = 0
    while (i < bytes.length && !hasMulti) {
      if ((bytes(i) & 0xff) >= 0xc2) hasMulti = true; i += 1
    }
    if (!hasMulti) return null
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Kernel: up to two repair passes (double-mangled text repairs
    * too); clean text is a fixed point. */
  def fix(s: UTF8String): UTF8String = {
    var cur = s.toString
    var pass = 0
    var changed = false
    while (pass < 2) {
      val r = repairOnce(cur)
      if (r == null || r == cur) pass = 2
      else { cur = r; changed = true; pass += 1 }
    }
    if (changed) UTF8String.fromString(cur) else s
  }

  /** Fixture-side mangler: what `clean` looks like after a UTF-8 →
    * cp1252 mis-decode (`rounds` times). Test/fixture code only. */
  private[graft] def mangle(clean: String, rounds: Int = 1): String = {
    var cur = clean
    var r = 0
    while (r < rounds) {
      cur = sloppyCp1252Decode(cur.getBytes(StandardCharsets.UTF_8))
      r += 1
    }
    cur
  }
}

/** `sniff_charset(body, content_type)` — detected charset label. */
case class SniffCharset(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sniff_charset requires (binary, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "sniff_charset"

  override def nullSafeEval(body: Any, ct: Any): Any =
    CharsetSniff.sniff(body.asInstanceOf[Array[Byte]],
                       ct.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, c) =>
      s"graft.text.CharsetSniff.sniff($b, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SniffCharset =
    copy(left = newLeft, right = newRight)
}

/** `decode_payload(body, content_type)` — charset-aware decode. */
case class DecodePayload(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decode_payload requires (binary, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_payload"

  override def nullSafeEval(body: Any, ct: Any): Any =
    CharsetSniff.decodeKernel(body.asInstanceOf[Array[Byte]],
                              ct.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, c) =>
      s"graft.text.CharsetSniff.decodeKernel($b, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodePayload =
    copy(left = newLeft, right = newRight)
}

/** `fix_mojibake(text)` — windows-1252-of-UTF-8 repair. */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fix_mojibake requires string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    CharsetSniff.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.CharsetSniff.fix($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : FixMojibake = copy(child = newChild)
}
