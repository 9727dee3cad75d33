package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `array<string>` token column.
  *
  * SimHash (Charikar 2002; the near-dup detector of Manku/Jain/Sarma,
  * WWW'07 "Detecting Near-Duplicates for Web Crawling") folds a token
  * multiset into one 64-bit signature whose Hamming distance tracks
  * cosine similarity of the token vectors: per token a 64-bit hash votes
  * ±1 on each bit lane; the sign of each lane's total is the output bit.
  *
  * Why a custom Catalyst `Expression` instead of composed built-ins or a
  * UDF (the idiom ladder of SURVEY §2.8): the per-row kernel is
  * tokens×64 integer ops — as composed `aggregate`/`transform`
  * expressions that is 64 boxed expression evals per token, and as a
  * Scala UDF it forfeits whole-stage codegen (Row serialization on every
  * call). This expression stays inside codegen — `doGenCode` emits one
  * static call on the raw `ArrayData`, no boxing, no interpreter — so a
  * 100-TB scan pays ~the cost of hashing the bytes once.
  *
  * The token hash is FNV-1a 64 (public-domain constants), fixed here so
  * signatures are stable across Spark versions — never derived from
  * `Object.hashCode`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Column API: `simhash64(tokens)` — tokens is `array<string>`. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Interpreted + codegen shared kernel (called from generated code —
    * must stay public, static-forwardable, and allocation-light). */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** FNV-1a 64-bit (offset 0xcbf29ce484222325, prime 0x100000001b3). */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
