package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd Catalyst expression — the first stage of corpus text
  * normalization: web-crawled text mixes precomposed (`é` U+00E9) and
  * decomposed (`e` + U+0301) forms of the same glyph, which breaks
  * exact dedup, shingling, and vocabulary counting unless canonicalized
  * first (the reference corpora pipelines this engine extends — CCNet,
  * Gopher, Dolma — all NFC/NFKC-normalize before hashing).
  *
  * Why a custom `Expression` (idiom ladder, SURVEY §2.8): Spark ships no
  * Unicode-normalization function, so the alternatives are a Scala UDF
  * (forfeits whole-stage codegen, boxes every row) or nothing. This
  * expression stays inside codegen; `doGenCode` emits one static call.
  *
  * The kernel is scan-cost-aware for the common case: ASCII (which NFC
  * maps to itself) is detected with `numBytes == numChars` (true iff
  * every code point is single-byte) and returned UNCHANGED — no String
  * materialization, no allocation. Only rows containing non-ASCII pay
  * `java.text.Normalizer` (ICU-equivalent, JDK built-in), and of those
  * the already-normalized ones pay only the `isNormalized` quick-check
  * scan. On a 100-TB mostly-ASCII web corpus the normalize pass is
  * effectively a byte-count compare per row.
  *
  * Matches DuckDB's `nfc_normalize` byte-for-byte (both implement
  * Unicode Standard Annex #15 NFC) — hash-gated by `q_normalize_text`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Column API: `nfcNormalize(text)`. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** Interpreted + codegen shared kernel. ASCII fast path returns the
    * input UTF8String itself (zero-copy); non-ASCII already-NFC input
    * pays only the quick-check scan. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // pure ASCII: NFC-invariant
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
