package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram extraction for the trained language classifier:
  * `char_ngrams(text) → array<string>` — every code-point n-gram for
  * n ∈ [nMin, nMax] over the first `maxChars` code points of the
  * input (the CLD3 move: language identity concentrates in the first
  * few hundred characters, so the feature cost per document is BOUNDED
  * regardless of document length — exactly what a 100-TB scan needs).
  *
  * Why a kernel (the [[LangHits]]/[[ScriptHits]] idiom ladder): the
  * composed form is one `transform(sequence(...), i → substr(...))`
  * HOF per n — CodegenFallback, interpreted, and substr counts from
  * the string head per call (O(L²) on long docs). This kernel is one
  * surrogate-safe code-point walk that records boundaries once, then
  * slices by byte offsets; it stays inside whole-stage codegen.
  *
  * The walk is CODE-POINT based, never splitting a surrogate pair
  * (astral-plane text — emoji, rare CJK — yields valid n-grams).
  * Output size ≤ (nMax − nMin + 1) · maxChars small strings. */
case class CharNgrams(child: Expression, nMin: Int, nMax: Int,
                      maxChars: Int) extends UnaryExpression {
  require(nMin >= 1 && nMax >= nMin && maxChars >= nMax,
    s"char_ngrams needs 1 <= nMin <= nMax <= maxChars " +
      s"(got $nMin, $nMax, $maxChars)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires string, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], nMin, nMax, maxChars)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharNgrams.ngrams($c, $nMin, $nMax, $maxChars)")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgrams = copy(child = newChild)
}

object CharNgrams {

  /** Shared interpreted/codegen kernel: one code-point walk recording
    * byte boundaries, then byte-offset slices (UTF8String.substring
    * is byte-cheap once boundaries are known code-point-safe). */
  def ngrams(text: UTF8String, nMin: Int, nMax: Int,
             maxChars: Int): ArrayData = {
    val s = text.toString
    // code-point start offsets (in chars) of the first maxChars+1
    // boundaries — boundaries[i] is where code point i starts
    val bounds = new Array[Int](maxChars + 1)
    var nCp = 0
    var i = 0
    while (i < s.length && nCp < maxChars) {
      bounds(nCp) = i
      i += Character.charCount(s.codePointAt(i))
      nCp += 1
    }
    bounds(nCp) = i
    var total = 0
    var n = nMin
    while (n <= nMax) { total += math.max(0, nCp - n + 1); n += 1 }
    val out = new Array[Any](total)
    var k = 0
    n = nMin
    while (n <= nMax) {
      var p = 0
      while (p + n <= nCp) {
        out(k) = UTF8String.fromString(s.substring(bounds(p), bounds(p + n)))
        k += 1
        p += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: code-point n-grams of the first `maxChars` code
    * points, n ∈ [nMin, nMax]. */
  def charNgrams(text: Column, nMin: Int = 1, nMax: Int = 3,
                 maxChars: Int = 300): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text),
      nMin, nMax, maxChars))
}
