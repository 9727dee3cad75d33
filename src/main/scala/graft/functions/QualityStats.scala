package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass counters behind the quality-feature struct
  * ([[graft.text.Text.qualityFeaturesFromTokens]]) — n_chars, punct
  * count, Σ token length, |distinct tokens|, stopword hits.
  *
  * Why native (measured, round 10): the composed form pays four
  * separate interpreted walks per row — an `aggregate` HOF for the
  * token-length sum, `array_distinct`, a `filter`+`array_contains`
  * HOF chain for stopword hits, and `regexp_count` (RuntimeReplaced
  * into `size(regexp_extract_all(...))`, materializing a one-char
  * match string per punctuation character). This kernel is one walk
  * over the token array plus one byte scan of the text, inside
  * codegen. The RATIO arithmetic stays in plain Columns so the
  * feature struct's values (and its SQL-oracle twins) are
  * byte-identical.
  *
  * Semantics pinned to the composed form:
  *  - `punct` counts `[\p{Punct}]` matches — Java's POSIX class, the
  *    32 ASCII punctuation characters, each match one char (safe as
  *    a byte scan: UTF-8 continuation bytes are ≥ 0x80);
  *  - `distinct_toks` is `size(array_distinct(toks))` — binary
  *    equality on tokens;
  *  - `stop_hits` counts token OCCURRENCES in the stopword set
  *    (`filter` + `array_contains` semantics);
  *  - null tokens are skipped exactly where the composed HOFs skip
  *    them (tokenize never emits nulls).
  */
case class QualityStats(left: Expression, right: Expression,
                        stopwords: Seq[String])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quality_stats requires (array<string>, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = QualityStats.OutputType
  override def prettyName: String = "quality_stats"

  @transient private lazy val stopSet = QualityStats.buildSet(stopwords)

  override def nullSafeEval(toks: Any, text: Any): Any =
    QualityStats.stats(toks.asInstanceOf[ArrayData],
      text.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.QualityStats.stats($t, $s, $setRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QualityStats =
    copy(left = newLeft, right = newRight)
}

object QualityStats {

  val OutputType: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("distinct_toks", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // Java's \p{Punct}: !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~ (ASCII only)
  private val PunctMask: Array[Boolean] = {
    val m = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => m(c) = true)
    m
  }

  /** Shared interpreted/codegen kernel (public static for generated
    * code). */
  def stats(toks: ArrayData, text: UTF8String,
            stopSet: java.util.HashSet[UTF8String]): InternalRow = {
    val n = toks.numElements()
    var sumLen = 0L
    var stops = 0
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        sumLen += t.numChars()
        if (stopSet.contains(t)) stops += 1
        seen.add(t)
      }
      i += 1
    }
    var punct = 0
    val nb = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var b = 0
    while (b < nb) {
      val c = org.apache.spark.unsafe.Platform.getByte(base, off + b)
      if (c >= 0 && c < 128 && PunctMask(c)) punct += 1
      b += 1
    }
    new GenericInternalRow(Array[Any](
      text.numChars(), n, sumLen, punct, seen.size, stops))
  }

  /** Column API. */
  def stats(toks: Column, text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(QualityStats(
      ColumnBridge.expression(toks), ColumnBridge.expression(text),
      stopwords))
}
