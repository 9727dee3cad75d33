package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Gopher-repetition-signal kernel: one pass over a document's
  * trimmed lines and normalized tokens →
  * `struct<n_lines, dup_line_frac, dup_line_char_frac,
  * top_2gram_cov, top_3gram_cov, top_4gram_cov>`.
  *
  * Why a custom Catalyst `Expression` (idiom ladder, SURVEY §2.8): the
  * composed form needs one `array_sort` + run-length `aggregate` HOF
  * per gram size plus an O(distinct × lines) nested-filter aggregate
  * for line stats — all CodegenFallback, re-evaluated interpreted per
  * reference (measured 49 s fused / 3.7 s staged for 5K docs at
  * sf0.1; this kernel: one hash-counting pass per row inside codegen).
  * Semantics are pinned bit-for-bit against the HOF reference form
  * [[graft.text.Text.repetitionSignalsFromParts]] in KernelsSpec.
  *
  * Gram keys join tokens with a space — injective because normalized
  * tokens cannot contain whitespace (same assumption the HOF form's
  * `concat_ws` makes). Char counts use UTF8String.numChars (code
  * points), matching SQL `length()`.
  */
case class RepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats requires (array<string>, array<string>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = RepetitionStats.OutputType
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(lines: Any, toks: Any): Any =
    RepetitionStats.compute(lines.asInstanceOf[ArrayData],
                            toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, t) => s"graft.functions.RepetitionStats.compute($l, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepetitionStats =
    copy(left = newLeft, right = newRight)
}

object RepetitionStats {

  val OutputType: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_2gram_cov", DoubleType, nullable = false),
    StructField("top_3gram_cov", DoubleType, nullable = false),
    StructField("top_4gram_cov", DoubleType, nullable = false)))

  /** Shared interpreted/codegen kernel. Null array elements are treated
    * as empty strings (the tokenizer/line-splitter never emit them). */
  def compute(lines: ArrayData, toks: ArrayData): InternalRow = {
    // --- line stats: count + char length per distinct line -----------
    val nL = lines.numElements()
    val lineMap = new java.util.HashMap[String, Array[Long]]()
    var totalLineChars = 0L
    var i = 0
    while (i < nL) {
      val u = if (lines.isNullAt(i)) null else lines.getUTF8String(i)
      val s = if (u == null) "" else u.toString
      val c = if (u == null) 0L else u.numChars().toLong
      totalLineChars += c
      val e = lineMap.get(s)
      if (e == null) lineMap.put(s, Array(1L, c)) else e(0) += 1
      i += 1
    }
    var dupChars = 0L
    val it = lineMap.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      dupChars += (e(0) - 1L) * e(1)
    }
    val dupLineFrac =
      if (nL == 0) 0.0
      else (nL - lineMap.size).toDouble / nL.toDouble
    val dupLineCharFrac =
      if (totalLineChars == 0L) 0.0
      else dupChars.toDouble / totalLineChars.toDouble

    // --- gram coverage: prefix char sums + hash counting -------------
    val t = toks.numElements()
    val tokStr = new Array[String](t)
    val charPrefix = new Array[Long](t + 1)
    i = 0
    while (i < t) {
      val u = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      tokStr(i) = if (u == null) "" else u.toString
      charPrefix(i + 1) = charPrefix(i) +
        (if (u == null) 0L else u.numChars().toLong)
      i += 1
    }
    val nChars = charPrefix(t) + math.max(t - 1, 0).toLong

    def topCov(n: Int): Double = {
      if (t < n || nChars == 0L) return 0.0
      val m = new java.util.HashMap[String, Array[Long]]()
      var best = 0L
      var s = 0
      val sb = new java.lang.StringBuilder(64)
      while (s + n <= t) {
        sb.setLength(0)
        var j = s
        while (j < s + n) {
          if (j > s) sb.append(' ')
          sb.append(tokStr(j))
          j += 1
        }
        val key = sb.toString
        var e = m.get(key)
        if (e == null) { e = Array(0L); m.put(key, e) }
        e(0) += 1L
        // gram char length = token chars + (n-1) separators
        val len = charPrefix(s + n) - charPrefix(s) + (n - 1).toLong
        val cov = e(0) * len
        if (cov > best) best = cov
        s += 1
      }
      math.min(best.toDouble / nChars.toDouble, 1.0)
    }

    new GenericInternalRow(Array[Any](
      nL, dupLineFrac, dupLineCharFrac, topCov(2), topCov(3), topCov(4)))
  }

  /** Column API: `repetitionStats(lines, tokens)` — `lines` from
    * [[graft.text.Text.docLines]], `tokens` from
    * [[graft.text.Text.tokenize]]. */
  def repetitionStats(lines: Column, tokens: Column): Column =
    ColumnBridge.column(RepetitionStats(
      ColumnBridge.expression(lines), ColumnBridge.expression(tokens)))
}
