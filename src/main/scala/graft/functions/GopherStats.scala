package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass counters behind the Gopher rule signals
  * ([[graft.text.Gopher]]) — raw-word census (count, summed char
  * length, alphabetic-word count, distinct stop-word hits), trimmed
  * non-blank line census (count, bullet-started, ellipsis-ended), and
  * the symbol counts ("#", non-overlapping "...", "…").
  *
  * Why native (the [[QualityStats]] rationale, measured there): the
  * composed form pays ~8 interpreted walks per row — a split + two
  * `filter` HOFs and an `aggregate` over the word array, an
  * `array_intersect`, a split + trim/filter pipeline plus two `filter`
  * HOFs over the line array, and three `regexp_replace` passes for the
  * symbols. This kernel is two char walks (words+symbols, lines)
  * inside codegen. Ratio/flag arithmetic stays in plain Columns so
  * values — and the `q_gopher_filter` oracle — are byte-identical.
  *
  * Semantics pinned to the composed form (GopherSpec asserts
  * bit-for-bit equality against [[graft.text.Gopher
  * .signalsFromParts]]):
  *  - words split on Java `\s+` (the six ASCII whitespace chars —
  *    space, \t, \n, \x0B, \f, \r), empties dropped; lengths in
  *    CODE POINTS (UTF8String/regex char semantics);
  *  - alphabetic = contains ≥1 `\p{L}` code point
  *    (`Character.isLetter`);
  *  - stop hits = |distinct CASE-FOLDED words ∩ stop list| (the
  *    `array_intersect`-over-`lower(word)` count — a seen-bit per
  *    stop word; folding is Locale.ROOT `toLowerCase`, identical to
  *    Spark/DuckDB `lower` on the ASCII stop lists);
  *  - lines split on '\n', trimmed of SPACES only (Spark `trim`
  *    semantics), empties dropped; bullet prefixes "- ", "* ",
  *    "• ", "‣ "; ellipsis suffixes "..." and "…";
  *  - "..." occurrences are leftmost non-overlapping (= Σ ⌊run/3⌋
  *    over maximal '.' runs, the `regexp_replace` length
  *    arithmetic).
  */
case class GopherStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  require(stopwords.size <= 32,
    s"gopher_stats tracks stop words in a 32-bit seen mask; " +
      s"got ${stopwords.size}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gopher_stats requires string, got ${t.catalogString}")
    }

  override def dataType: DataType = GopherStats.OutputType
  override def prettyName: String = "gopher_stats"

  @transient private lazy val stops = stopwords.toArray

  override def nullSafeEval(text: Any): Any =
    GopherStats.stats(text.asInstanceOf[UTF8String], stops)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stops,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.GopherStats.stats($t, $stopsRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GopherStats = copy(child = newChild)
}

object GopherStats {

  val OutputType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ell3", LongType, nullable = false),
    StructField("n_ellchar", LongType, nullable = false)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  /** Shared interpreted/codegen kernel (public static for generated
    * code). */
  def stats(text: UTF8String, stops: Array[String]): InternalRow = {
    val s = text.toString
    val n = s.length
    var maxStopLen = 0
    var k0 = 0
    while (k0 < stops.length) {
      if (stops(k0).length > maxStopLen) maxStopLen = stops(k0).length
      k0 += 1
    }
    // ---- word walk + symbol counts (one pass) ----
    var nWords = 0L; var sumLen = 0L; var alphaWords = 0L
    var inWord = false; var wordLen = 0L; var wordHasAlpha = false
    var wordStart = 0
    var stopMask = 0
    var nHash = 0L; var dotRun = 0L; var nEll3 = 0L; var nEllChar = 0L
    def endWord(endExcl: Int): Unit = {
      nWords += 1; sumLen += wordLen
      if (wordHasAlpha) alphaWords += 1
      // stop words are short — compare only plausible lengths; the
      // probe is CASE-FOLDED (sentence-initial "The"/"With" count —
      // the published Gopher rule is on word identity, not surface
      // case; composed form and oracle twin lower() identically)
      val wl = endExcl - wordStart
      if (wl <= maxStopLen) {
        val w = s.substring(wordStart, endExcl)
          .toLowerCase(java.util.Locale.ROOT)
        var k = 0
        while (k < stops.length) {
          if ((stopMask & (1 << k)) == 0 && stops(k) == w)
            stopMask |= 1 << k
          k += 1
        }
      }
      inWord = false; wordLen = 0L; wordHasAlpha = false
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '.') dotRun += 1
      else { nEll3 += dotRun / 3; dotRun = 0 }
      if (c == '#') nHash += 1
      if (c == '…') nEllChar += 1
      if (isWs(c)) {
        if (inWord) endWord(i)
        i += 1
      } else {
        if (!inWord) { inWord = true; wordStart = i }
        val cp = s.codePointAt(i)
        wordLen += 1
        if (!wordHasAlpha && Character.isLetter(cp)) wordHasAlpha = true
        i += Character.charCount(cp)
      }
    }
    nEll3 += dotRun / 3
    if (inWord) endWord(n)
    // ---- line walk ----
    var nLines = 0L; var bulletLines = 0L; var ellipsisLines = 0L
    var ls = 0
    while (ls <= n) {
      var le = s.indexOf('\n', ls)
      if (le < 0) le = n
      // trim SPACES only (Spark trim semantics)
      var a = ls; var b = le
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        nLines += 1
        if (a + 1 < b && s.charAt(a + 1) == ' ' &&
            (s.charAt(a) == '-' || s.charAt(a) == '*' ||
             s.charAt(a) == '•' || s.charAt(a) == '‣'))
          bulletLines += 1
        if (s.charAt(b - 1) == '…' ||
            (b - a >= 3 && s.charAt(b - 1) == '.' &&
             s.charAt(b - 2) == '.' && s.charAt(b - 3) == '.'))
          ellipsisLines += 1
      }
      ls = le + 1
    }
    new GenericInternalRow(Array[Any](
      nWords, sumLen, alphaWords, Integer.bitCount(stopMask).toLong,
      nLines, bulletLines, ellipsisLines, nHash, nEll3, nEllChar))
  }

  /** Column API. */
  def gopherStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(GopherStats(
      ColumnBridge.expression(text), stopwords))
}
