package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-feed (RSS 2.0 / Atom, RFC 4287) source — the third crawl
  * DISCOVERY channel beside hyperlinks ([[graft.text.Links]]) and
  * sitemaps ([[Sitemap]]): feeds are how news/blog crawlers learn
  * about FRESH URLs minutes after publication, where sitemaps lag
  * hours and link discovery lags a full recrawl. Entries carry the
  * same scheduling hints the frontier consumes — a link, a title
  * (anchor-text-grade relevance signal), and a publication instant.
  *
  * ==Parsing posture==
  * Same lenient protocol-subset walk as [[Sitemap]] (shared lexical
  * helpers; not a general XML parser — no DTDs, no namespace
  * resolution beyond ignoring prefixes, hence no XXE surface):
  *  - RSS 2.0: `<rss>`/`<channel>` root, `<item>` blocks, link from
  *    `<link>text</link>`, title/`pubDate`/`guid` child text;
  *  - Atom: `<feed>` root, `<entry>` blocks, link from the first
  *    `<link>` whose `rel` is absent or `alternate` (RFC 4287 §4.2.7:
  *    no-rel defaults to alternate; `self`/`hub` decoys skip),
  *    title/`updated`/`id` child text.
  * Malformed input quarantines (`format = invalid`): no recognizable
  * root → one invalid row for the file; an entry with no link → an
  * invalid row for that entry; never a throw.
  *
  * ==Scale notes==
  * Files load via `binaryFile` (one task per feed; `.gz` handled by
  * the explicit [[Warc.gunzip]] walker); parsing is per-task map
  * work, no shuffle. Feeds are small by construction (the protocol
  * convention is "recent entries only"), so per-file memory is
  * bounded by crawl policy, not engine luck. */
object Feed {

  /** One parsed entry: `format` ∈ rss | atom | invalid. */
  final case class Entry(format: String, link: String, title: String,
                         published: String, entryId: String)

  /** First attribute value of `name` inside the opening tag `tag`
    * (quote-aware, case-insensitive name); null when absent. */
  private[sources] def attrValue(tag: String, name: String): String = {
    val lower = tag.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i >= 0 && i < lower.length) {
      i = lower.indexOf(name.toLowerCase(java.util.Locale.ROOT), i)
      if (i < 0) return null
      // attribute-name boundary on both sides, then = then a quote
      // boundary on BOTH sides: ` href=` matches, `hreflang=` and a
      // match inside another attribute's value don't
      val before = i == 0 || Character.isWhitespace(lower.charAt(i - 1))
      var j = i + name.length
      while (j < tag.length && Character.isWhitespace(tag.charAt(j))) j += 1
      if (before && j < tag.length && tag.charAt(j) == '=') {
        j += 1
        while (j < tag.length && Character.isWhitespace(tag.charAt(j))) j += 1
        if (j < tag.length && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
          val q = tag.charAt(j)
          val end = tag.indexOf(q, j + 1)
          if (end > 0) return tag.substring(j + 1, end)
        }
        return null // `name=` without a quoted value: malformed XML
      }
      i += name.length // boundary miss (e.g. hreflang): keep scanning
    }
    null
  }

  /** Atom entry link: first `<link>` in [from, to) whose `rel` is
    * absent or `alternate`; href entity-decoded; null when none. */
  private def atomLink(s: String, from: Int, to: Int): String = {
    var i = from
    while (i >= 0 && i < to) {
      i = Sitemap.findOpen(s, "link", i)
      if (i < 0 || i >= to) return null
      val gt = s.indexOf('>', i)
      if (gt < 0 || gt >= to) return null
      val tag = s.substring(i, gt + 1)
      val rel = attrValue(tag, "rel")
      if (rel == null || rel.equalsIgnoreCase("alternate")) {
        val href = attrValue(tag, "href")
        if (href != null && href.trim.nonEmpty)
          return Sitemap.decodeXml(href.trim)
        return null // a rel-matching link with no href is malformed
      }
      i = gt + 1
    }
    null
  }

  /** Walk one feed document's text. */
  def parseFeed(xml: String): Seq[Entry] = {
    if (xml == null) return Seq(Entry("invalid", null, null, null, null))
    val isAtom = Sitemap.findOpen(xml, "feed", 0) >= 0
    val isRss = Sitemap.findOpen(xml, "rss", 0) >= 0 ||
      Sitemap.findOpen(xml, "channel", 0) >= 0
    if (!isAtom && !isRss)
      return Seq(Entry("invalid", null, null, null, null))
    val (entryTag, format) =
      if (isRss) ("item", "rss") else ("entry", "atom")
    val out = Seq.newBuilder[Entry]
    var i = Sitemap.findOpen(xml, entryTag, 0)
    while (i >= 0) {
      val end = Sitemap.blockEnd(xml, entryTag, i)
      if (end < 0) {
        // unterminated entry: quarantine it, stop (no guess about
        // where the next entry starts)
        out += Entry("invalid", null, null, null, null)
        i = -1
      } else {
        val link =
          if (isRss) {
            val t = Sitemap.childText(xml, "link", i, end)
            if (t == null || t.isEmpty) null else Sitemap.decodeXml(t)
          } else atomLink(xml, i, end)
        if (link == null)
          out += Entry("invalid", null, null, null, null)
        else out += Entry(format, link,
          Sitemap.childText(xml, "title", i, end),
          Sitemap.childText(xml,
            if (isRss) "pubDate" else "updated", i, end),
          Sitemap.childText(xml, if (isRss) "guid" else "id", i, end))
        i = Sitemap.findOpen(xml, entryTag, end)
      }
    }
    out.result()
  }

  /** Walk one feed FILE's bytes (plain or gzip) — the per-file unit
    * [[readFeeds]] maps over `binaryFile` and
    * [[graft.streaming.FeedIngest]] lifts to streams (the
    * `Warc.recordsOf` posture: stateless, quarantines, never
    * throws). A gzip tail that fails to decode cleanly appends one
    * `invalid` row rather than silently shortening the file. */
  def entriesOf(raw: Array[Byte]): Seq[Entry] = {
    val (bytes, clean) = Warc.gunzip(raw)
    val entries = parseFeed(new String(bytes, StandardCharsets.UTF_8))
    if (clean || entries.lastOption.exists(_.format == "invalid"))
      entries
    else entries :+ Entry("invalid", null, null, null, null)
  }

  /** Read feed files (plain or `.gz`) → one row per entry:
    * `(feed_file, format, link, title, published, entry_id)`. */
  def readFeeds(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        entriesOf(raw).map(e => (p, e.format, e.link, e.title,
                                 e.published, e.entryId))
      }
      .toDF("feed_file", "format", "link", "title", "published",
            "entry_id")
  }

  // ---- fixture writers (the encoder side of the same syntax) -------

  /** Serialize an RSS 2.0 channel; entries = (link, title, pubDate,
    * guid), optional fields null to omit. */
  def writeRss(entries: Seq[(String, String, String, String)])
      : Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<rss version=\"2.0\">\n<channel>\n")
    sb.append("  <title>fixture</title>\n")
    entries.foreach { case (link, title, pubDate, guid) =>
      sb.append("  <item>\n")
      sb.append(s"    <link>${encodeXml(link)}</link>\n")
      if (title != null) sb.append(s"    <title>${encodeXml(title)}</title>\n")
      if (pubDate != null) sb.append(s"    <pubDate>$pubDate</pubDate>\n")
      if (guid != null) sb.append(s"    <guid>$guid</guid>\n")
      sb.append("  </item>\n")
    }
    sb.append("</channel>\n</rss>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Serialize an Atom feed; entries = (href, title, updated, id),
    * each entry led by a rel="self" decoy link the parser must
    * skip. */
  def writeAtom(entries: Seq[(String, String, String, String)])
      : Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
    sb.append("  <title>fixture</title>\n")
    sb.append("  <link rel=\"self\" href=\"http://fx.example/feed.atom\"/>\n")
    entries.foreach { case (href, title, updated, id) =>
      sb.append("  <entry>\n")
      sb.append("    <link rel=\"self\" href=\"http://fx.example/entry-self\"/>\n")
      sb.append(s"    <link rel=\"alternate\" href=\"${encodeXml(href)}\"/>\n")
      if (title != null) sb.append(s"    <title>${encodeXml(title)}</title>\n")
      if (updated != null) sb.append(s"    <updated>$updated</updated>\n")
      if (id != null) sb.append(s"    <id>$id</id>\n")
      sb.append("  </entry>\n")
    }
    sb.append("</feed>\n")
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
