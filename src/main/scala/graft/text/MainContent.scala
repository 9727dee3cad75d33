package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Block-level main-content extraction — the boilerplate-removal tier
  * BETWEEN tag stripping ([[HtmlText]], the C4-`clean` tier) and the
  * content filters: real web-corpus pipelines (jusText, trafilatura,
  * Readability; RefinedWeb and FineWeb both run one) classify each
  * BLOCK of a page by text mass and link density so navigation menus,
  * sidebars, and footers — which survive plain tag stripping — never
  * reach language ID, quality scoring, or dedup.
  *
  * ==Classification rules (jusText-lite, deterministic, twin-replayable)==
  *  1. The page splits into BLOCKS at every open or close tag of a
  *     block-level element (the HTML5 flow/sectioning set below);
  *     `<script>`/`<style>`/comments vanish and inline tags collapse
  *     to a space exactly as in [[HtmlText]] — the two kernels share
  *     one lexical grammar, so `main_content(h)` is always a
  *     subsequence of `html_text(h)`'s blocks.
  *  2. Per block: `n_chars` = collapsed text length, `link_chars` =
  *     chars emitted inside an `<a>` element (depth-tracked, so a
  *     block-level banner link `<a><div>…</div></a>` counts fully;
  *     depth persists across block boundaries because HTML5 allows
  *     flow content inside anchors).
  *  3. A block is CONTENT iff `n_chars >= minChars` (default 25) AND
  *     `link_chars * 100 < n_chars * linkDensityPct` (default 20%) —
  *     jusText's length + link-density core.
  *  4. Heading promotion (the one context rule kept from jusText's
  *     smoothing pass): an `<h1>`–`<h6>` block that fails only the
  *     length bar is promoted iff the nearest FOLLOWING non-heading
  *     block is content — an article's short headline belongs to the
  *     article; a "Related links" heading over a nav list does not.
  *  5. Output: content blocks' texts joined by one space ([[HtmlText]]
  *     rule-4 posture); empty string (never null) when nothing
  *     classifies as content.
  *
  * The full jusText algorithm adds stopword densities (language-
  * dependent) and two-sided near-good smoothing — tuning judgments a
  * deployment owns; this kernel keeps the deterministic core so the
  * oracle twin can CONSTRUCT expected output from planted arithmetic.
  *
  * Reference behavior: the reference's pipelines assume pre-extracted
  * text (`data_exploration.py` loads ratings CSVs); this stage is part
  * of the 100-TB web-corpus surface the brief adds on top. */
object MainContent {

  /** One classified block: collapsed text, chars inside links, and
    * whether the block was opened by a heading tag. */
  final case class Block(text: String, linkChars: Int, heading: Boolean)

  // block boundary set: HTML5 flow/sectioning elements whose open OR
  // close tag ends the current block (br/hr included — they are the
  // classic text-mail separators); everything else is inline
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("address", "article", "aside", "blockquote", "body", "br",
        "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "head", "header", "hr", "html", "li", "main", "nav", "ol", "p",
        "pre", "section", "table", "tbody", "td", "tfoot", "th",
        "thead", "tr", "ul").foreach(s.add)
    s
  }

  private def isHeading(name: String): Boolean =
    name.length == 2 && name.charAt(0) == 'h' &&
      name.charAt(1) >= '1' && name.charAt(1) <= '6'

  /** Segment `html` into classified blocks — the shared walker under
    * [[mainContent]] and [[HtmlBlockStats]]; same lexical grammar as
    * [[HtmlText.extract]] (script/style/comment elision, HTML5
    * data-state `<`, character references, whitespace collapse). */
  def blocks(html: String): Vector[Block] = {
    val s = html
    val out = Vector.newBuilder[Block]
    val sb = new java.lang.StringBuilder(64)
    var pendingSpace = false
    var linkChars = 0
    var linkDepth = 0
    var heading = false
    def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) {
        val c = str.charAt(k)
        if (Character.isWhitespace(c)) pendingSpace = true
        else {
          if (pendingSpace && sb.length > 0) {
            sb.append(' ')
            if (linkDepth > 0) linkChars += 1
          }
          pendingSpace = false
          sb.append(c)
          if (linkDepth > 0) linkChars += 1
        }
        k += 1
      }
    }
    def flush(nextHeading: Boolean): Unit = {
      if (sb.length > 0) out += Block(sb.toString, linkChars, heading)
      sb.setLength(0)
      linkChars = 0
      pendingSpace = false
      heading = nextHeading
    }
    def tagOpener(at: Int): Boolean = at + 1 < s.length && {
      val n = s.charAt(at + 1)
      (n >= 'a' && n <= 'z') || (n >= 'A' && n <= 'Z') ||
        n == '/' || n == '!' || n == '?'
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<' && tagOpener(i)) {
        def elem(name: String): Boolean =
          HtmlText.lowerAt(s, i + 1, name) &&
            HtmlText.nameBoundary(s, i + 1 + name.length)
        if (elem("script")) {
          i = HtmlText.closeOf(s, i + 1, "script"); pendingSpace = true
        } else if (elem("style")) {
          i = HtmlText.closeOf(s, i + 1, "style"); pendingSpace = true
        } else if (HtmlText.lowerAt(s, i + 1, "!--")) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
          pendingSpace = true
        } else {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < s.length && Character.isLetterOrDigit(s.charAt(j)))
            j += 1
          val name = s.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          while (j < s.length && s.charAt(j) != '>') j += 1
          i = math.min(j + 1, s.length)
          if (name == "a") {
            if (closing) linkDepth = math.max(0, linkDepth - 1)
            else linkDepth += 1
            pendingSpace = true
          } else if (BlockTags.contains(name)) {
            flush(nextHeading = !closing && isHeading(name))
          } else pendingSpace = true
        }
      } else if (c == '&') {
        val (dec, next) = HtmlText.entity(s, i)
        if (dec != null) { emit(dec); i = next }
        else { emit("&"); i += 1 }
      } else {
        emit(String.valueOf(c))
        i += 1
      }
    }
    flush(nextHeading = false)
    out.result()
  }

  /** Content flags for `bs` under rules 3–4. */
  def classify(bs: IndexedSeq[Block], minChars: Int,
               linkDensityPct: Int): Array[Boolean] = {
    val keep = new Array[Boolean](bs.length)
    def lowDensity(b: Block): Boolean =
      b.linkChars * 100 < b.text.length.toLong * linkDensityPct
    var i = 0
    while (i < bs.length) {
      keep(i) = bs(i).text.length >= minChars && lowDensity(bs(i))
      i += 1
    }
    // heading promotion: nearest following non-heading block decides
    i = 0
    while (i < bs.length) {
      if (!keep(i) && bs(i).heading && lowDensity(bs(i))) {
        var j = i + 1
        while (j < bs.length && bs(j).heading) j += 1
        if (j < bs.length && bs(j).text.length >= minChars &&
            lowDensity(bs(j)))
          keep(i) = true
      }
      i += 1
    }
    keep
  }

  /** Shared interpreted/codegen kernel (public static for generated
    * code): content blocks joined by one space; empty when none. */
  def mainContent(html: UTF8String, minChars: Int,
                  linkDensityPct: Int): UTF8String = {
    val bs = blocks(html.toString)
    val keep = classify(bs, minChars, linkDensityPct)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < bs.length) {
      if (keep(i)) {
        if (sb.length > 0) sb.append(' ')
        sb.append(bs(i).text)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column API: the main-content prose of an HTML string. */
  def htmlMainContent(html: Column, minChars: Int = 25,
                      linkDensityPct: Int = 20): Column =
    ColumnBridge.column(HtmlMainContent(
      ColumnBridge.expression(html), minChars, linkDensityPct))

  /** Column API: per-block audit rows
    * `array<struct<text, n_chars, link_chars, heading, content>>` —
    * the surface a deployment inspects when tuning the thresholds. */
  def htmlBlockStats(html: Column, minChars: Int = 25,
                     linkDensityPct: Int = 20): Column =
    ColumnBridge.column(HtmlBlockStats(
      ColumnBridge.expression(html), minChars, linkDensityPct))
}

/** `html_main_content(html)` — codegen'd scalar over the block
  * classifier; config thresholds are plan-time constants baked into
  * the generated call. Never null for non-null input (empty string
  * when no block classifies). */
case class HtmlMainContent(child: Expression, minChars: Int,
                           linkDensityPct: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_main_content requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_content"

  override def nullSafeEval(input: Any): Any =
    MainContent.mainContent(input.asInstanceOf[UTF8String],
                            minChars, linkDensityPct)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.text.MainContent.mainContent($c, $minChars, $linkDensityPct)")

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlMainContent = copy(child = newChild)
}

/** `html_block_stats(html)` — the per-block audit surface. Interpreted
  * ([[CodegenFallback]]) by design: it materializes nested rows for
  * threshold tuning and spot audits, not for the per-record hot path —
  * production extraction is the codegen'd [[HtmlMainContent]]. */
case class HtmlBlockStats(child: Expression, minChars: Int,
                          linkDensityPct: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_block_stats requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false),
    StructField("heading", BooleanType, nullable = false),
    StructField("content", BooleanType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "html_block_stats"

  override def nullSafeEval(input: Any): Any = {
    val bs = MainContent.blocks(input.asInstanceOf[UTF8String].toString)
    val keep = MainContent.classify(bs, minChars, linkDensityPct)
    new GenericArrayData(bs.zipWithIndex.map { case (b, i) =>
      InternalRow(UTF8String.fromString(b.text), b.text.length,
                  b.linkChars, b.heading, keep(i))
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlBlockStats = copy(child = newChild)
}
