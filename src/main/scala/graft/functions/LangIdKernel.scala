package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The WHOLE language-ID decision as one native expression:
  * `lang_id(tokens, text) → string`.
  *
  * Why (the round-14 bench regression): with 16 profiles the composed
  * argmax ladder references the [[LangHits]] struct ~150 times
  * (`greatest` of 16, then a 16-branch shrinking-greatest CASE), and
  * the generated code for queries that ALSO plant text and extract
  * script profiles blows past the JIT/codegen size limits — falling
  * back to interpreted evaluation, where common-subexpression
  * elimination does not apply and the kernel re-runs per reference
  * (q_lang_id 0.48 → 7.26 s, q_lang_script_audit 2.35 → 13.6 s in
  * the first round-14 bench window). One expression, one evaluation,
  * scalar code — no tree for the optimizer to lose.
  *
  * Membership is ONE hash probe per token against a word→bitmask map
  * (a word can belong to several profiles — "de" is es/fr/nl), not
  * one probe per profile; the char-class walk (hangul/kana/CJK
  * counts + code points) rides the same call. The ladder is
  * `Text.langIdFromTokens`'s exactly: hangul > 0.1 → ko, kana >
  * 0.05 → ja, CJK > 0.2 → zh, else argmax of profile hits with
  * first-profile-wins ties, "und" when nothing scores. KernelsSpec
  * pins kernel ≡ composed ladder; every language twin stays
  * hash-green through the swap. */
case class LangId(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lang_id requires (array<string>, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(toks: Any, text: Any): Any =
    LangId.detect(toks.asInstanceOf[ArrayData],
      text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.LangId.detect($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LangId =
    copy(left = newLeft, right = newRight)
}

object LangId {

  /** Char-class thresholds — the single source Text re-exports and
    * the SQL twin generator interpolates. */
  val HangulMinRatio = 0.1
  val KanaMinRatio = 0.05
  val CjkMinRatio = 0.2

  private val langs: Array[UTF8String] =
    LangHits.Profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val Und = UTF8String.fromString("und")
  private val Ko = UTF8String.fromString("ko")
  private val Ja = UTF8String.fromString("ja")
  private val Zh = UTF8String.fromString("zh")

  // word → bitmask of profile memberships (bit i = Profiles(i))
  private val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    LangHits.Profiles.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf(
          (if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  /** Shared interpreted/codegen kernel. */
  def detect(toks: ArrayData, text: UTF8String): UTF8String = {
    // ---- char-class walk (the ScriptHits ranges for hangul/kana/CJK)
    val s = text.toString
    var nChars = 0L
    var hangul = 0L; var kana = 0L; var cjk = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp >= 0xAC00 && cp <= 0xD7AF) hangul += 1
      else if (cp >= 0x3040 && cp <= 0x30FF) kana += 1
      else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
      i += Character.charCount(cp)
    }
    if (nChars > 0) {
      val n = nChars.toDouble
      if (hangul.toDouble / n > HangulMinRatio) return Ko
      if (kana.toDouble / n > KanaMinRatio) return Ja
      if (cjk.toDouble / n > CjkMinRatio) return Zh
    }
    // ---- profile hits: one map probe per token
    val counts = new Array[Int](langs.length)
    val nTok = toks.numElements()
    var t = 0
    while (t < nTok) {
      if (!toks.isNullAt(t)) {
        val m = masks.get(toks.getUTF8String(t))
        if (m != null) {
          var bits = m.intValue()
          while (bits != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(bits)
            counts(b) += 1
            bits &= bits - 1
          }
        }
      }
      t += 1
    }
    // argmax, first profile wins ties (strictly-greater replace)
    var best = 0
    var bestIdx = -1
    var p = 0
    while (p < counts.length) {
      if (counts(p) > best) { best = counts(p); bestIdx = p }
      p += 1
    }
    if (bestIdx < 0) Und else langs(bestIdx)
  }

  /** Column API: `langId(tokens, text)` — the one-call language ID. */
  def langId(toks: Column, text: Column): Column =
    ColumnBridge.column(LangId(
      ColumnBridge.expression(toks), ColumnBridge.expression(text)))
}
