package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Unicode-script census: a single code-point walk
  * emitting per-script character counts plus the total code-point
  * count → `struct<n_chars, n_latin, …, n_kana>`.
  *
  * Why a kernel (the [[LangHits]]/[[GopherStats]] rationale): the
  * composed [[graft.text.Scripts.scriptProfile]] paid NINE
  * `regexp_count` passes per row, and the profile struct's fields
  * (counts, total, argmax, dominant share) each re-reference those
  * columns — two of the heaviest non-composite queries in the round-13
  * bench window were exactly this shape (`q_lang_script_audit` 2.35 s,
  * `q_script_detect` 1.03 s). One codegen'd walk replaces all nine;
  * the argmax over its fields is scalar integer math, and
  * subexpression elimination applies (codegen-capable expression).
  *
  * The ranges MIRROR [[graft.text.Scripts.Ranges]]'s regex character
  * classes verbatim (including the `\x{00C0}-\x{024F}` Latin
  * supplement block's two non-letters × and ÷ — the census is defined
  * by the published ranges, not the Unicode Script property; the SQL
  * oracle twins count the same regex classes). KernelsSpec pins
  * kernel ≡ `regexp_count` per script on random multilingual text.
  * `n_chars` counts CODE POINTS — the same value as Spark/DuckDB
  * `length()` — so ratio arithmetic (e.g. the CJK/kana/hangul
  * language rules) rides the same pass.
  */
case class ScriptHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"script_hits requires string, got ${t.catalogString}")
    }

  override def dataType: DataType = ScriptHits.OutputType
  override def prettyName: String = "script_hits"

  override def nullSafeEval(input: Any): Any =
    ScriptHits.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptHits.hits($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ScriptHits = copy(child = newChild)
}

object ScriptHits {

  /** Script names in [[graft.text.Scripts.Ranges]] order — the
    * dominance-tie order and the struct field order. */
  val Scripts: Seq[String] = Seq(
    "latin", "cyrillic", "greek", "arabic", "hebrew", "devanagari",
    "cjk", "hangul", "kana")

  val OutputType: StructType = StructType(
    StructField("n_chars", LongType, nullable = false) +:
      Scripts.map(s => StructField(s"n_$s", LongType, nullable = false)))

  /** Shared interpreted/codegen kernel (public static for generated
    * code). All ranges are BMP, so the per-script tests are plain char
    * compares; `n_chars` counts code points (== `length()`). */
  def hits(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var nChars = 0L
    var latin = 0L; var cyr = 0L; var greek = 0L; var arab = 0L
    var heb = 0L; var deva = 0L; var cjk = 0L; var hang = 0L
    var kana = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      // ranges mirror graft.text.Scripts.Ranges verbatim
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0x00C0 && cp <= 0x024F)) latin += 1
      else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
      else if (cp >= 0x0370 && cp <= 0x03FF) greek += 1
      else if (cp >= 0x0600 && cp <= 0x06FF) arab += 1
      else if (cp >= 0x0590 && cp <= 0x05FF) heb += 1
      else if (cp >= 0x0900 && cp <= 0x097F) deva += 1
      else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
      else if (cp >= 0xAC00 && cp <= 0xD7AF) hang += 1
      else if (cp >= 0x3040 && cp <= 0x30FF) kana += 1
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](
      nChars, latin, cyr, greek, arab, heb, deva, cjk, hang, kana))
  }

  /** Column API: one-pass script census of a string column. */
  def scriptHits(text: Column): Column =
    ColumnBridge.column(ScriptHits(ColumnBridge.expression(text)))
}
