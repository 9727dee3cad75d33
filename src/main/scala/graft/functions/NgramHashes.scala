package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed n-gram feature streams for the LM-scoring / DSIR paths —
  * the n-gram text is a join/count key only there, so these kernels
  * emit the xxhash64 keys directly instead of building a "a b"
  * concat string per bigram inside an interpreted zip_with lambda.
  * Key parity: token keys equal Spark's `xxhash64(token)` and bigram
  * keys equal `xxhash64(concat(a, ' ', b))` (same XXH64, seed 42,
  * over the joined bytes), so kernel-keyed streams and Column-keyed
  * count tables mix freely.
  *
  * Two shapes over the same walk:
  *  - [[NgramHashes.bigramKeyPairs]]: one `struct<a,ab>` per bigram
  *    OCCURRENCE (the bigram-LM query stream — needs the context key
  *    and the pair key side by side);
  *  - [[NgramHashes.featureHashes]]: unigram keys then bigram keys,
  *    one per occurrence (the DSIR unigram+bigram feature multiset).
  * Sub-2-token inputs yield no bigrams; nulls are skipped like the
  * zip_with/explode forms they replace (split never emits nulls).
  */
case class BigramKeyPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_key_pairs requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("ab", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bigram_key_pairs"

  override def nullSafeEval(input: Any): Any =
    NgramHashes.bigramKeyPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramHashes.bigramKeyPairs($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : BigramKeyPairs = copy(child = newChild)
}

case class FeatureHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHashes.featureHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramHashes.featureHashes($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : FeatureHashes = copy(child = newChild)
}

object NgramHashes {

  private val Space = UTF8String.fromString(" ")

  private def hashOf(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  private def nonNull(arr: ArrayData): Array[UTF8String] = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == n) toks else java.util.Arrays.copyOf(toks, m)
  }

  /** Shared interpreted/codegen kernel: (a, ab) key pair per bigram. */
  def bigramKeyPairs(arr: ArrayData): ArrayData = {
    val toks = nonNull(arr)
    val m = toks.length
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - 1)
    var i = 0
    while (i < m - 1) {
      out(i) = new GenericInternalRow(Array[Any](
        hashOf(toks(i)),
        hashOf(UTF8String.concatWs(Space, toks(i), toks(i + 1)))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared interpreted/codegen kernel: unigram keys then bigram
    * keys, one per occurrence. */
  def featureHashes(arr: ArrayData): ArrayData = {
    val toks = nonNull(arr)
    val m = toks.length
    if (m == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val nb = if (m >= 2) m - 1 else 0
    val out = new Array[Long](m + nb)
    var i = 0
    while (i < m) { out(i) = hashOf(toks(i)); i += 1 }
    i = 0
    while (i < nb) {
      out(m + i) = hashOf(UTF8String.concatWs(Space, toks(i), toks(i + 1)))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Column APIs. */
  def bigramKeyPairs(tokens: Column): Column =
    ColumnBridge.column(BigramKeyPairs(ColumnBridge.expression(tokens)))
  def featureHashes(tokens: Column): Column =
    ColumnBridge.column(FeatureHashes(ColumnBridge.expression(tokens)))
}
