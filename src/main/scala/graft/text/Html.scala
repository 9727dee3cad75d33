package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the stage between a crawl's raw payloads
  * ([[graft.sources.Warc]]) and every text operator in the engine:
  * language ID, quality scoring, dedup, and tokenization all assume
  * PROSE, and feeding them markup skews every signal (tag soup looks
  * like high-punctuation low-stopword "junk", scripts dominate
  * n-gram tables). This is the deterministic, zero-dependency
  * extraction tier (C4's `clean` / jusText-lite): full DOM-aware
  * boilerplate removal is a judgment call a deployment tunes; tag
  * stripping is a FUNCTION, so it lives here as a codegen'd kernel.
  *
  * ==Extraction rules (deterministic, twin-replayable)==
  *  1. `<script>`/`<style>` elements vanish WITH their content
  *     (case-insensitive; unterminated ones vanish to EOF);
  *  2. comments (`<!-- -->`) and all remaining tags (incl. `<!...>`
  *     and `<?...?>` declarations) become one space — block/inline
  *     distinctions collapse under rule 4 anyway; a `<` NOT followed
  *     by a letter, `/`, `!` or `?` is prose (the HTML5 data-state
  *     rule — `i <3 u`, `x < y` survive extraction);
  *  3. character references decode: the five XML named entities +
  *     `&nbsp;` (→ plain space) and decimal/hex numeric references;
  *     an unrecognized or malformed `&...` run is kept literally
  *     (crawl reality: bare `&` is everywhere);
  *  4. whitespace runs collapse to a single space, ends trimmed.
  *
  * [[HtmlText.htmlTitle]] extracts the first `<title>` element's
  * text through the same decode/collapse path — the one header
  * field web curation keys on before any body processing. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_text requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HtmlText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlText = copy(child = newChild)
}

object HtmlText {

  /** Column API: extracted prose of an HTML string. */
  def htmlText(html: Column): Column =
    ColumnBridge.column(HtmlText(ColumnBridge.expression(html)))

  /** Column API: the first `<title>` element's decoded text; null
    * when absent. */
  def htmlTitle(html: Column): Column =
    ColumnBridge.column(HtmlTitle(ColumnBridge.expression(html)))

  private[text] def lowerAt(s: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > s.length) return false
    var k = 0
    while (k < lit.length) {
      if (Character.toLowerCase(s.charAt(i + k)) != lit.charAt(k))
        return false
      k += 1
    }
    true
  }

  /** True when the char at `i` (if any) cannot extend an element
    * name — so `</scripts>` never closes a `script` element. */
  private[text] def nameBoundary(s: String, i: Int): Boolean =
    i >= s.length || !Character.isLetterOrDigit(s.charAt(i))

  /** Index just past `</name ... >` starting the search at `i`;
    * length when unterminated. */
  private[text] def closeOf(s: String, i: Int, name: String): Int = {
    var j = i
    while (j < s.length) {
      if (s.charAt(j) == '<' && j + 1 < s.length &&
          s.charAt(j + 1) == '/' && lowerAt(s, j + 2, name) &&
          nameBoundary(s, j + 2 + name.length)) {
        var k = j + 2 + name.length
        while (k < s.length && s.charAt(k) != '>') k += 1
        return math.min(k + 1, s.length)
      }
      j += 1
    }
    s.length
  }

  /** Decode a character reference starting at `i` (the `&`). Returns
    * (decoded string or null when not a reference, index past it). */
  // constant lookup table — hoisted out of entity(): it sits on the
  // per-'&' hot path of a codegen'd kernel
  private val NamedEntities =
    Array(("amp;", "&"), ("lt;", "<"), ("gt;", ">"),
          ("quot;", "\""), ("apos;", "'"), ("nbsp;", " "))

  private[text] def entity(s: String, i: Int): (String, Int) = {
    val named = NamedEntities
    var e = 0
    while (e < named.length) {
      if (lowerAt(s, i + 1, named(e)._1))
        return (named(e)._2, i + 1 + named(e)._1.length)
      e += 1
    }
    if (i + 2 < s.length && s.charAt(i + 1) == '#') {
      val hex = s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X'
      var j = i + (if (hex) 3 else 2)
      var cp = 0L
      val start = j
      while (j < s.length && cp <= 0x10FFFF && {
        val c = s.charAt(j)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true }
        else false
      }) j += 1
      // tab/LF/CR references ('&#9;' '&#10;' '&#13;') are legal and
      // common whitespace spellings in crawled HTML — decode them to
      // a space (they collapse under the whitespace rule anyway)
      // instead of leaking literal entity syntax into the prose;
      // other control codepoints stay rejected
      if (j > start && j < s.length && s.charAt(j) == ';' &&
          (cp == 9L || cp == 10L || cp == 13L))
        return (" ", j + 1)
      if (j > start && j < s.length && s.charAt(j) == ';' &&
          cp >= 32 && cp <= 0x10FFFF)
        return (new String(Character.toChars(cp.toInt)), j + 1)
    }
    (null, i)
  }

  /** Shared interpreted/codegen kernel (public static for generated
    * code). */
  def extract(html: UTF8String): UTF8String = {
    val s = html.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) {
        val c = str.charAt(k)
        if (Character.isWhitespace(c)) pendingSpace = true
        else {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.append(c)
        }
        k += 1
      }
    }
    // '<' opens a tag only before a letter, '/', '!' or '?' — the
    // HTML5 data-state rule; a bare '<' before anything else ('i <3
    // u', 'x < y') is PROSE, and eating to the next '>' (or EOF)
    // would truncate real text
    def tagOpener(at: Int): Boolean = at + 1 < s.length && {
      val n = s.charAt(at + 1)
      (n >= 'a' && n <= 'z') || (n >= 'A' && n <= 'Z') ||
        n == '/' || n == '!' || n == '?'
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<' && tagOpener(i)) {
        // element-name boundary: `<scripts>` is NOT a script element
        def elem(name: String): Boolean = lowerAt(s, i + 1, name) && {
          val after = i + 1 + name.length
          after >= s.length || !Character.isLetterOrDigit(s.charAt(after))
        }
        if (elem("script")) { i = closeOf(s, i + 1, "script")
                              pendingSpace = true }
        else if (elem("style")) { i = closeOf(s, i + 1, "style")
                                  pendingSpace = true }
        else if (lowerAt(s, i + 1, "!--")) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
          pendingSpace = true
        } else {
          var j = i + 1
          while (j < s.length && s.charAt(j) != '>') j += 1
          i = math.min(j + 1, s.length)
          pendingSpace = true
        }
      } else if (c == '&') {
        val (dec, next) = entity(s, i)
        if (dec != null) { emit(dec); i = next }
        else { emit("&"); i += 1 }
      } else {
        emit(String.valueOf(c))
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Value of attribute `key` inside one tag's text (`<meta ...>`),
    * or null: handles `key="v"`, `key='v'`, bare `key=v`, any attr
    * order, case-insensitive names. */
  private def attrValue(tag: String, key: String): String = {
    val t = tag
    var i = 0
    while (i < t.length) {
      // attribute-name start: preceded by whitespace
      if (Character.isWhitespace(t.charAt(i)) && lowerAt(t, i + 1, key)) {
        var j = i + 1 + key.length
        while (j < t.length && Character.isWhitespace(t.charAt(j))) j += 1
        if (j < t.length && t.charAt(j) == '=') {
          j += 1
          while (j < t.length && Character.isWhitespace(t.charAt(j))) j += 1
          if (j >= t.length) return null
          val q = t.charAt(j)
          if (q == '"' || q == '\'') {
            val end = t.indexOf(q, j + 1)
            return if (end < 0) null else t.substring(j + 1, end)
          }
          val start = j
          while (j < t.length && !Character.isWhitespace(t.charAt(j)) &&
                 t.charAt(j) != '>' && t.charAt(j) != '/') j += 1
          return t.substring(start, j)
        }
      }
      i += 1
    }
    null
  }

  /** Kernel for [[HtmlMetaRobots]]: the `content` of the first
    * `<meta name="robots">` element (any attr order/quoting), null
    * when the document declares none. */
  def metaRobots(html: UTF8String): UTF8String = {
    val s = html.toString
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' && lowerAt(s, i + 1, "meta") &&
          nameBoundary(s, i + 5)) {
        var j = i + 5
        while (j < s.length && s.charAt(j) != '>') j += 1
        val tag = s.substring(i, math.min(j + 1, s.length))
        val name = attrValue(tag, "name")
        if (name != null &&
            name.toLowerCase(java.util.Locale.ROOT) == "robots") {
          val content = attrValue(tag, "content")
          return if (content == null) null
                 else UTF8String.fromString(content.trim)
        }
        i = j + 1
      } else i += 1
    }
    null
  }

  /** Column API: `content` of the first robots meta tag; null when
    * absent. */
  def htmlMetaRobots(html: Column): Column =
    ColumnBridge.column(HtmlMetaRobots(ColumnBridge.expression(html)))

  /** Kernel for [[HtmlTitle]]: first `<title>`'s extracted text. */
  def title(html: UTF8String): UTF8String = {
    val s = html.toString
    var i = 0
    while (i < s.length) {
      // element-name boundary both ways: <titlebar> is not a title,
      // and </titles> does not close one
      if (s.charAt(i) == '<' && lowerAt(s, i + 1, "title") &&
          nameBoundary(s, i + 6)) {
        var j = i + 6
        while (j < s.length && s.charAt(j) != '>') j += 1
        if (j >= s.length) return null
        val bodyStart = j + 1
        var k = bodyStart
        while (k < s.length &&
               !(s.charAt(k) == '<' && k + 1 < s.length &&
                 s.charAt(k + 1) == '/' && lowerAt(s, k + 2, "title") &&
                 nameBoundary(s, k + 7)))
          k += 1
        return extract(UTF8String.fromString(s.substring(bodyStart, k)))
      }
      i += 1
    }
    null
  }
}

/** `html_meta_robots(html)` — the robots meta directive string
  * (`noindex`, `nofollow`, …) a page declares, null when none: the
  * in-document half of crawl politeness ([[graft.text.Robots]] is the
  * robots.txt half). Null-propagating codegen like [[HtmlTitle]]. */
case class HtmlMetaRobots(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_meta_robots requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_meta_robots"

  override def nullSafeEval(input: Any): Any =
    HtmlText.metaRobots(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.text.HtmlText.metaRobots($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlMetaRobots = copy(child = newChild)
}

case class HtmlTitle(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_title requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_title"

  override def nullSafeEval(input: Any): Any =
    HtmlText.title(input.asInstanceOf[UTF8String])

  // defineCodeGen assumes the kernel never returns null for non-null
  // input; a titleless document DOES yield null, so the generated
  // code must propagate it into isNull explicitly
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.text.HtmlText.title($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlTitle = copy(child = newChild)
}
