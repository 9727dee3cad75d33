package graft.text

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hyperlink extraction + URL reference resolution — the DISCOVERY
  * half of the crawl loop. Everything upstream (WARC walk, robots,
  * frontier scheduling) consumes URLs the operator already has;
  * this module produces the NEXT ones: every `<a href>` with its
  * anchor text and `rel=nofollow` flag, the page's `<base href>`,
  * and RFC 3986 reference resolution so relative links become
  * absolute fetch candidates. The same surface feeds the host-level
  * link graph (PageRank/centrality — the classic quality prior web
  * corpora weight by) and anchor-text aggregation (the relevance
  * signal search-era pipelines attach to the TARGET page).
  *
  * ==Extraction rules (deterministic, twin-replayable)==
  *  - `<a …>` tags found by the TX18 lexical grammar (tag opener =
  *    `<` + letter; `<script>`/`<style>` content skipped so JS
  *    string literals never fake a link); attribute blobs scanned
  *    quote-aware, so `>` inside a quoted attribute doesn't cut the
  *    tag;
  *  - `href` values entity-decode (`&amp;` is everywhere in real
  *    query strings); empty/absent href → no row;
  *  - anchor text = the run to the matching `</a` (unterminated → to
  *    EOF), extracted through [[HtmlText.extract]] — nested markup
  *    strips, references decode, whitespace collapses;
  *  - `nofollow` = the `rel` attribute contains the token (space or
  *    comma separated, case-insensitive);
  *  - `<base href>`: the FIRST base tag wins (the WHATWG rule).
  *
  * ==Resolution ([[Links.resolveUrl]])==
  * RFC 3986 §5.2 reference resolution, hand-rolled rather than
  * `java.net.URI` (which throws on the unencoded spaces and stray
  * characters of real crawled hrefs): absolute refs pass through,
  * protocol-relative inherit the base scheme, path-absolute and
  * path-relative merge + dot-segment-normalize against the base,
  * query-only and empty refs take the base path, fragments always
  * drop (a fetch candidate never has one). Unresolvable inputs →
  * null (quarantine, never a throw).
  *
  * ==Scale shape==
  * All codegen'd per-row kernels; the pipeline shape is scan →
  * extract → explode → resolve — pure map work until the caller
  * aggregates (host graph) or anti-joins (frontier dedup). */
object Links {

  /** Column API: `array<struct<href,anchor,nofollow>>` of a page's
    * `<a href>` links, document order. */
  def htmlLinks(html: Column): Column =
    ColumnBridge.column(HtmlLinks(ColumnBridge.expression(html)))

  /** Column API: the first `<base href>` value (entity-decoded), or
    * null. */
  def htmlBaseHref(html: Column): Column =
    ColumnBridge.column(HtmlBaseHref(ColumnBridge.expression(html)))

  /** Column API: RFC 3986 resolution of `ref` against `base`;
    * fragment-free; null when unresolvable. */
  def resolveUrl(base: Column, ref: Column): Column =
    ColumnBridge.column(ResolveUrl(
      ColumnBridge.expression(base), ColumnBridge.expression(ref)))

  /** Column API: the first `<link rel="canonical" href>` value
    * (entity-decoded, possibly relative — resolve against the page
    * URL), or null. The canonical link is the page's OWN statement
    * of its preferred URL — the dedup signal that collapses print
    * views, tracking-parameter variants, and mirrored paths onto
    * one identity before any content hashing runs. */
  def htmlCanonical(html: Column): Column =
    ColumnBridge.column(HtmlCanonical(ColumnBridge.expression(html)))

  val linkStruct: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))

  // ---- attribute + entity helpers ---------------------------------

  /** Quote-aware scan: index of the `>` closing the tag whose `<` is
    * at `lt`, or -1. */
  private def tagEnd(s: String, lt: Int): Int = {
    var i = lt
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  /** `key=value` inside a tag blob (key case-insensitive, preceded
    * by a non-name char; value quoted or bare), or null. */
  private[text] def attr(tag: String, key: String): String = {
    val lower = tag.toLowerCase(Locale.ROOT)
    var from = 0
    while (from < lower.length) {
      val at = lower.indexOf(key, from)
      if (at < 0) return null
      val beforeOk = at > 0 && {
        val c = lower.charAt(at - 1)
        !(Character.isLetterOrDigit(c) || c == '-' || c == '_')
      }
      var i = at + key.length
      while (i < tag.length && (tag.charAt(i) == ' ' ||
             tag.charAt(i) == '\t' || tag.charAt(i) == '\n' ||
             tag.charAt(i) == '\r')) i += 1
      if (beforeOk && i < tag.length && tag.charAt(i) == '=') {
        i += 1
        while (i < tag.length && (tag.charAt(i) == ' ' ||
               tag.charAt(i) == '\t' || tag.charAt(i) == '\n' ||
               tag.charAt(i) == '\r')) i += 1
        if (i >= tag.length) return null
        val q = tag.charAt(i)
        if (q == '"' || q == '\'') {
          val end = tag.indexOf(q, i + 1)
          return if (end < 0) null else tag.substring(i + 1, end)
        }
        var end = i
        while (end < tag.length && !Character.isWhitespace(tag.charAt(end)) &&
               tag.charAt(end) != '>') end += 1
        return tag.substring(i, end)
      }
      from = at + key.length
    }
    null
  }

  /** Character references in an attribute value decode (the body
    * path decodes via [[HtmlText.extract]]; attr values need their
    * own pass — `&amp;` in query strings is the crawl norm). */
  private[text] def decodeEntities(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '&') {
        val (rep, next) = HtmlText.entity(v, i)
        if (rep != null) { sb.append(rep); i = next }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def relNofollow(rel: String): Boolean = {
    if (rel == null) return false
    rel.toLowerCase(Locale.ROOT).split("[ ,\t\n\r]+")
      .exists(_ == "nofollow")
  }

  // ---- link extraction kernel -------------------------------------

  /** Kernel for the generated call site: one struct row per `<a
    * href>`, document order. */
  def extract(html: UTF8String): ArrayData = {
    val s = html.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = s.length
      else if (HtmlText.lowerAt(s, lt + 1, "script") &&
               HtmlText.nameBoundary(s, lt + 7)) {
        val e = HtmlText.closeOf(s, lt, "script")
        i = if (e < 0) s.length else e
      } else if (HtmlText.lowerAt(s, lt + 1, "style") &&
                 HtmlText.nameBoundary(s, lt + 6)) {
        val e = HtmlText.closeOf(s, lt, "style")
        i = if (e < 0) s.length else e
      } else if (HtmlText.lowerAt(s, lt + 1, "a") &&
                 HtmlText.nameBoundary(s, lt + 2)) {
        val gt = tagEnd(s, lt)
        if (gt < 0) i = s.length
        else {
          val tag = s.substring(lt, gt)
          val href0 = attr(tag, "href")
          // anchor run: to the matching </a (unterminated → EOF)
          var close = gt + 1
          var found = -1
          while (found < 0 && close < s.length) {
            val c = s.indexOf('<', close)
            if (c < 0) { found = s.length; close = s.length }
            else if (c + 2 < s.length && s.charAt(c + 1) == '/' &&
                     (s.charAt(c + 2) == 'a' || s.charAt(c + 2) == 'A') &&
                     HtmlText.nameBoundary(s, c + 3)) found = c
            else close = c + 1
          }
          if (found < 0) found = s.length
          if (href0 != null && href0.trim.nonEmpty) {
            val href = decodeEntities(href0.trim)
            val anchor = HtmlText.extract(
              UTF8String.fromString(s.substring(gt + 1, found)))
            out += InternalRow(UTF8String.fromString(href), anchor,
                               relNofollow(attr(tag, "rel")))
          }
          // resume INSIDE the anchor so malformed nested links are
          // still seen; the close tag itself is consumed by the
          // generic scan
          i = gt + 1
        }
      } else i = lt + 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Kernel: the first `<link rel=canonical href>` (first wins — the
    * search-engine convention for conflicting declarations), or
    * null. */
  def canonicalHref(html: UTF8String): UTF8String = {
    val s = html.toString
    var i = 0
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return null
      if (HtmlText.lowerAt(s, lt + 1, "link") &&
          HtmlText.nameBoundary(s, lt + 5)) {
        val gt = tagEnd(s, lt)
        if (gt < 0) return null
        val tag = s.substring(lt, gt)
        val rel = attr(tag, "rel")
        if (rel != null &&
            rel.toLowerCase(Locale.ROOT).split("[ ,\t\n\r]+")
              .contains("canonical")) {
          val v = attr(tag, "href")
          if (v != null && v.trim.nonEmpty)
            return UTF8String.fromString(decodeEntities(v.trim))
        }
        i = gt + 1
      } else i = lt + 1
    }
    null
  }

  /** Kernel: every `<link rel=alternate type=application/rss+xml|
    * application/atom+xml href>` value in document order
    * (entity-decoded, possibly relative — resolve against the page
    * URL). Feed AUTODISCOVERY (the RSS-autodiscovery convention all
    * browsers and crawlers honor): pages ADVERTISE their feeds in
    * the head, and this is how a crawler finds the
    * [[graft.sources.Feed]] inputs nobody pre-registered — the feed
    * channel's analog of robots.txt `Sitemap:` discovery. The
    * `type` attribute gates (a rel=alternate without it is a
    * language/media variant, not a feed). */
  def feedHrefs(html: UTF8String): GenericArrayData = {
    val s = html.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var done = false
    while (!done && i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) done = true
      else if (HtmlText.lowerAt(s, lt + 1, "link") &&
               HtmlText.nameBoundary(s, lt + 5)) {
        val gt = tagEnd(s, lt)
        if (gt < 0) done = true
        else {
          val tag = s.substring(lt, gt)
          val rel = attr(tag, "rel")
          val typ = attr(tag, "type")
          if (rel != null && typ != null &&
              rel.toLowerCase(Locale.ROOT).split("[ ,\t\n\r]+")
                .contains("alternate") &&
              (typ.trim.equalsIgnoreCase("application/rss+xml") ||
               typ.trim.equalsIgnoreCase("application/atom+xml"))) {
            val v = attr(tag, "href")
            if (v != null && v.trim.nonEmpty)
              out += UTF8String.fromString(decodeEntities(v.trim))
          }
          i = gt + 1
        }
      } else i = lt + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API for [[feedHrefs]]. */
  def htmlFeedLinks(html: Column): Column =
    ColumnBridge.column(HtmlFeedLinks(ColumnBridge.expression(html)))

  /** Kernel: the first `<base href>` (WHATWG: first wins), or null. */
  def baseHref(html: UTF8String): UTF8String = {
    val s = html.toString
    var i = 0
    while (i < s.length) {
      val lt = s.indexOf("<", i)
      if (lt < 0) return null
      if (HtmlText.lowerAt(s, lt + 1, "base") &&
          HtmlText.nameBoundary(s, lt + 5)) {
        val gt = tagEnd(s, lt)
        if (gt < 0) return null
        val v = attr(s.substring(lt, gt), "href")
        return if (v == null || v.trim.isEmpty) null
               else UTF8String.fromString(decodeEntities(v.trim))
      }
      i = lt + 1
    }
    null
  }

  // ---- RFC 3986 reference resolution ------------------------------

  private def hasScheme(ref: String): Boolean = {
    if (ref.isEmpty || !Character.isLetter(ref.charAt(0))) return false
    var i = 1
    while (i < ref.length) {
      val c = ref.charAt(i)
      if (c == ':') return true
      if (!(Character.isLetterOrDigit(c) || c == '+' || c == '-' ||
            c == '.')) return false
      i += 1
    }
    false
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[text] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val slash = out.lastIndexOf("/")
        out.setLength(if (slash < 0) 0 else slash)
      }
      else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', from)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  /** Kernel: resolve `ref` against hierarchical `base`; fragment
    * stripped; null when the base is not hierarchical or the inputs
    * are unusable. */
  def resolve(base: String, ref0: String): String = {
    if (base == null || ref0 == null) return null
    // crawl-reality sanitization: trim, control chars out, embedded
    // spaces percent-encoded (URI would throw on all of these)
    var ref = ref0.trim.replace("\t", "").replace("\n", "")
      .replace("\r", "").replace(" ", "%20")
    val frag = ref.indexOf('#')
    if (frag >= 0) ref = ref.substring(0, frag)
    if (hasScheme(ref)) return ref
    // base parse: scheme://authority[path][?query]
    val ss = base.indexOf("://")
    if (ss <= 0) return null
    val scheme = base.substring(0, ss).toLowerCase(Locale.ROOT)
    var i = ss + 3
    val authEnd = {
      var j = i
      while (j < base.length && base.charAt(j) != '/' &&
             base.charAt(j) != '?' && base.charAt(j) != '#') j += 1
      j
    }
    val authority = base.substring(i, authEnd)
    if (authority.isEmpty) return null
    i = authEnd
    val bFrag = base.indexOf('#', i)
    val bEnd = if (bFrag < 0) base.length else bFrag
    val bQ = {
      val q = base.indexOf('?', i)
      if (q < 0 || q > bEnd) -1 else q
    }
    val basePath = base.substring(i, if (bQ < 0) bEnd else bQ)
    if (ref.isEmpty)
      return scheme + "://" + authority + basePath +
        (if (bQ < 0) "" else base.substring(bQ, bEnd))
    if (ref.startsWith("//")) return scheme + ":" + ref
    // split ref into path + query
    val rQ = ref.indexOf('?')
    val refPath = if (rQ < 0) ref else ref.substring(0, rQ)
    val refQuery = if (rQ < 0) "" else ref.substring(rQ)
    if (rQ == 0) // query-only ref keeps the base path
      return scheme + "://" + authority + basePath + refQuery
    val merged =
      if (refPath.startsWith("/")) refPath
      else {
        val dir = basePath.lastIndexOf('/')
        (if (dir < 0) "/" else basePath.substring(0, dir + 1)) + refPath
      }
    scheme + "://" + authority + removeDotSegments(merged) + refQuery
  }

  /** UTF8String spelling for the generated call site. */
  def resolveKernel(base: UTF8String, ref: UTF8String): UTF8String = {
    val r = resolve(base.toString, ref.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** `html_links(html)` — `array<struct<href,anchor,nofollow>>`. */
case class HtmlLinks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"html_links requires string, got ${other.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(Links.linkStruct, containsNull = false)
  override def prettyName: String = "html_links"

  override def nullSafeEval(input: Any): Any =
    Links.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Links.extract($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlLinks = copy(child = newChild)
}

/** `html_base_href(html)` — first `<base href>`, or null. */
case class HtmlBaseHref(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"html_base_href requires string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_base_href"

  override def nullSafeEval(input: Any): Any =
    Links.baseHref(input.asInstanceOf[UTF8String])

  // defineCodeGen assumes a non-null kernel result; a baseless
  // document yields null, so propagate it into isNull explicitly
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.text.Links.baseHref($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlBaseHref = copy(child = newChild)
}

/** `html_canonical(html)` — first `<link rel=canonical href>`, or
  * null. */
case class HtmlCanonical(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"html_canonical requires string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_canonical"

  override def nullSafeEval(input: Any): Any =
    Links.canonicalHref(input.asInstanceOf[UTF8String])

  // a canonical-less document yields null — propagate into isNull
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.text.Links.canonicalHref($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlCanonical = copy(child = newChild)
}

/** `html_feed_links(html)` — every rel=alternate RSS/Atom link href
  * in document order (feed autodiscovery). */
case class HtmlFeedLinks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"html_feed_links requires string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_feed_links"

  override def nullSafeEval(input: Any): Any =
    Links.feedHrefs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.Links.feedHrefs($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlFeedLinks = copy(child = newChild)
}

/** `resolve_url(base, ref)` — RFC 3986 resolution, fragment-free;
  * null when unresolvable. */
case class ResolveUrl(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"resolve_url requires (string, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"

  override def nullSafeEval(base: Any, ref: Any): Any =
    Links.resolveKernel(base.asInstanceOf[UTF8String],
                        ref.asInstanceOf[UTF8String])

  // an unresolvable ref yields null for non-null inputs — propagate
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = graft.text.Links.resolveKernel($b, $r);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
}
