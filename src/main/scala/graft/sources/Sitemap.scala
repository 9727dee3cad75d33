package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap (sitemaps.org protocol) source — the crawl-frontier half
  * of crawl politeness: robots.txt says where a crawler may NOT go
  * ([[graft.text.Robots]]); the sitemap says where the site WANTS it
  * to go, with freshness (`lastmod`) and scheduling (`changefreq`,
  * `priority`) hints a frontier scheduler consumes. The protocol is
  * two rigid XML shapes: `<urlset>` of `<url>` entries (`loc` +
  * optional `lastmod`/`changefreq`/`priority`) and `<sitemapindex>`
  * of `<sitemap>` entries (`loc` + optional `lastmod`) pointing at
  * child sitemaps.
  *
  * ==Parsing posture==
  * A deliberate lenient walk of the two protocol shapes (not a
  * general XML parser — no DTDs, no namespace resolution beyond
  * ignoring prefixes, hence no XXE surface): find the root element,
  * walk its entry blocks, lift child-element text, decode the five
  * XML entities + numeric references in `loc`. Malformed input
  * quarantines: no recognizable root → one `invalid` row for the
  * file; an entry with no `loc` → an `invalid` row for that entry
  * (the protocol requires `loc`); never a throw.
  *
  * ==Scale notes==
  * Files load via `binaryFile` (one task per sitemap, gzip members
  * handled by the same explicit [[Warc.gunzip]] walker — `.xml.gz`
  * is the protocol's standard large form); parsing is per-task map
  * work, no shuffle. The 50k-URL/50MB protocol cap keeps single
  * files bounded by construction. */
object Sitemap {

  /** One parsed entry: `kind` ∈ url | sitemap | invalid. */
  final case class Entry(kind: String, loc: String, lastmod: String,
                        changefreq: String, priority: String)

  // ---- minimal XML helpers (protocol subset) -----------------------

  /** Decode the five XML entities + numeric character references. */
  private[sources] def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val rep = if (semi < 0) null else s.substring(i + 1, semi) match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case r if r.startsWith("#x") || r.startsWith("#X") =>
            try new String(Character.toChars(Integer.parseInt(r.substring(2), 16)))
            catch { case _: Exception => null }
          case r if r.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(r.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep != null) { sb.append(rep); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Index of `<name` (any namespace prefix ignored by matching the
    * local name after `<` or `<px:`) starting at `from`; -1 if
    * absent. Returns the index OF the '<'. */
  private[sources] def findOpen(s: String, name: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = s.indexOf('<', i)
      if (i < 0) return -1
      // skip closing tags, comments, declarations
      if (i + 1 < s.length && s.charAt(i + 1) != '/' &&
          s.charAt(i + 1) != '!' && s.charAt(i + 1) != '?') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '>' &&
               !Character.isWhitespace(s.charAt(j))) j += 1
        val tag = s.substring(i + 1, j)
        val local = {
          val c = tag.indexOf(':')
          if (c >= 0) tag.substring(c + 1) else tag
        }
        if (local.equalsIgnoreCase(name)) return i
      }
      i += 1
    }
    -1
  }

  /** Text of the first `<name>...</name>` inside [from, to); null
    * when absent. */
  private[sources] def childText(s: String, name: String, from: Int, to: Int)
      : String = {
    val open = findOpen(s, name, from)
    if (open < 0 || open >= to) return null
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= to) return null
    val close = s.indexOf("</", gt)
    if (close < 0 || close > to) return null
    s.substring(gt + 1, close).trim
  }

  /** End index (exclusive) of the entry block opened at `open`:
    * just past `</name ...>`, or -1 when unterminated. */
  private[sources] def blockEnd(s: String, name: String, open: Int): Int = {
    var i = open
    while (i >= 0) {
      i = s.indexOf("</", i)
      if (i < 0) return -1
      var j = i + 2
      val local0 = j
      while (j < s.length && s.charAt(j) != '>' &&
             !Character.isWhitespace(s.charAt(j))) j += 1
      val tag = s.substring(local0, j)
      val local = {
        val c = tag.indexOf(':')
        if (c >= 0) tag.substring(c + 1) else tag
      }
      if (local.equalsIgnoreCase(name)) {
        val gt = s.indexOf('>', i)
        return if (gt < 0) -1 else gt + 1
      }
      i += 2
    }
    -1
  }

  /** Walk one sitemap document's text. */
  def parseSitemap(xml: String): Seq[Entry] = {
    if (xml == null) return Seq(Entry("invalid", null, null, null, null))
    val isIndex = findOpen(xml, "sitemapindex", 0) >= 0
    val isUrlset = findOpen(xml, "urlset", 0) >= 0
    if (!isIndex && !isUrlset)
      return Seq(Entry("invalid", null, null, null, null))
    val (entryTag, kind) = if (isIndex) ("sitemap", "sitemap")
                           else ("url", "url")
    val out = Seq.newBuilder[Entry]
    var i = findOpen(xml, entryTag, 0)
    while (i >= 0) {
      val end = blockEnd(xml, entryTag, i)
      if (end < 0) {
        // unterminated entry: quarantine it, stop (no guess about
        // where the next entry starts)
        out += Entry("invalid", null, null, null, null)
        i = -1
      } else {
        val loc = childText(xml, "loc", i, end)
        if (loc == null || loc.isEmpty)
          out += Entry("invalid", null, null, null, null)
        else out += Entry(kind, decodeXml(loc),
          childText(xml, "lastmod", i, end),
          if (isIndex) null else childText(xml, "changefreq", i, end),
          if (isIndex) null else childText(xml, "priority", i, end))
        i = findOpen(xml, entryTag, end)
      }
    }
    out.result()
  }

  /** Read sitemap files (plain or `.xml.gz`) → one row per entry:
    * `(sitemap_file, kind, loc, lastmod, changefreq, priority)`. */
  def readSitemaps(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        val (bytes, clean) = Warc.gunzip(raw)
        val entries = parseSitemap(
          new String(bytes, StandardCharsets.UTF_8))
        val all =
          if (clean || entries.lastOption.exists(_.kind == "invalid"))
            entries
          else entries :+ Entry("invalid", null, null, null, null)
        all.map(e => (p, e.kind, e.loc, e.lastmod, e.changefreq,
                      e.priority))
      }
      .toDF("sitemap_file", "kind", "loc", "lastmod", "changefreq",
            "priority")
  }

  // ---- fixture writers (the encoder side of the same syntax) -------

  /** Serialize a urlset; entries = (loc, lastmod, changefreq,
    * priority), optional fields null to omit. */
  def writeUrlset(entries: Seq[(String, String, String, String)])
      : Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { case (loc, lastmod, freq, prio) =>
      sb.append("  <url>\n")
      sb.append(s"    <loc>${encodeXml(loc)}</loc>\n")
      if (lastmod != null) sb.append(s"    <lastmod>$lastmod</lastmod>\n")
      if (freq != null) sb.append(s"    <changefreq>$freq</changefreq>\n")
      if (prio != null) sb.append(s"    <priority>$prio</priority>\n")
      sb.append("  </url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Serialize a sitemapindex; entries = (loc, lastmod). */
  def writeIndex(entries: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { case (loc, lastmod) =>
      sb.append("  <sitemap>\n")
      sb.append(s"    <loc>${encodeXml(loc)}</loc>\n")
      if (lastmod != null) sb.append(s"    <lastmod>$lastmod</lastmod>\n")
      sb.append("  </sitemap>\n")
    }
    sb.append("</sitemapindex>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def encodeXml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
}
