package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native normalizing tokenizer: maximal runs of Unicode
  * letters/decimal digits/combining marks, lowercased —
  * byte-identical to the composed form it replaces,
  * `filter(split(lower(regexp_replace(text, "[^\p{L}\p{M}\p{Nd}]+",
  * " ")), " "), t => t =!= "")`, which pays a full regex REPLACE
  * building a new string, a second lowercased copy, a split array
  * with empty entries, and an interpreted HOF filter per row.
  *
  * Combining marks (`\p{M}` = Mn/Mc/Me) are run members: splitting at
  * marks would shred exactly the scripts a multilingual corpus needs
  * tokenized — Devanagari vowel signs (के → क + U+0947), Arabic
  * harakat, Hebrew niqqud all attach to the word they modify. On
  * mark-free text (all of ASCII/Latin/Cyrillic/CJK prose) this is the
  * identical function to the pre-round-14 letter/digit-only form.
  *
  * Equivalence notes (why one code-point walk is the same function):
  * Java's `\p{L}` is exactly `Character.isLetter` (Lu/Ll/Lt/Lm/Lo),
  * `\p{Nd}` exactly `Character.isDigit`, and `\p{M}` exactly
  * `Character.getType ∈ {Mn, Mc, Me}`, all per code point;
  * runs-then-lowercase equals lowercase-then-split because
  * lowercasing never maps an alphanumeric across the separator
  * boundary and Java's only context-sensitive mapping (final sigma)
  * sees the same "followed by non-letter" context at a run end as at
  * the replaced space; per-token `String.toLowerCase()` is the same
  * default-locale call `Lower`'s non-ASCII path makes on the whole
  * string. */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any =
    Tokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Tokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Tokenize = copy(child = newChild)
}

object Tokenize {

  /** Column API: lowercase alphanumeric-run tokens of a string. */
  def tokenize(text: Column): Column =
    ColumnBridge.column(Tokenize(ColumnBridge.expression(text)))

  /** Shared interpreted/codegen kernel (public static for generated
    * code). */
  def tokenize(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    var start = -1
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (Character.isLetter(cp) || Character.isDigit(cp) || isMark(cp)) {
        if (start < 0) start = i
      } else if (start >= 0) {
        out.add(UTF8String.fromString(lower(s.substring(start, i))))
        start = -1
      }
      i += w
    }
    if (start >= 0)
      out.add(UTF8String.fromString(lower(s.substring(start, n))))
    new GenericArrayData(out.toArray)
  }

  /** `\p{M}` per code point: Mn / Mc / Me. */
  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK ||
      t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** Mirror of `UTF8String.toLowerCase`'s two paths: all-ASCII tokens
    * take a locale-independent mapping (Locale.ROOT — a tr/az default
    * JVM locale must NOT turn ASCII 'I' into 'ı' here when Spark's
    * `lower()` and the DuckDB oracle twins would not), non-ASCII
    * tokens take the same default-locale call `Lower`'s slow path
    * makes. */
  private def lower(t: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < t.length) { ascii = t.charAt(i) < 0x80; i += 1 }
    if (ascii) t.toLowerCase(java.util.Locale.ROOT) else t.toLowerCase
  }
}
