package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-k-shingle kernel: `array<string>` tokens →
  * `array<string>` of space-joined k-grams, first-occurrence order,
  * deduplicated. Documents shorter than k tokens yield their whole
  * token stream as one shingle; empty input yields an empty array —
  * semantics identical to the composed form
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, k))))`.
  *
  * Why native (measured, not guessed): the composed form is a
  * higher-order-function chain — CodegenFallback, and the `slice`
  * inside the lambda re-evaluates its child per window, so an L-token
  * document costs O(L) evaluations of the upstream tokenizer instead of
  * one. On sf0.1 documents (~5.5K docs) the composed shingle build
  * alone measured 12.6 s; this kernel is one pass over the token array
  * per row. doGenCode emits a single static call, keeping the
  * surrounding projection inside whole-stage codegen.
  */
/** [[Shingles]] emitting distinct window xxhash64 HASHES
  * (`array<long>`) instead of the window strings — for consumers
  * that use shingles purely as join/group keys (the inverted-index
  * dedup family): the joined window string never leaves the kernel,
  * and every downstream exchange carries 8-byte longs instead of
  * ~k-word strings. Hash = XXH64(seed 42, same as Spark's
  * `xxhash64`) over the space-joined window bytes; distinctness is
  * over hashes, which equals distinctness over strings up to 64-bit
  * collisions (~|windows|²/2⁶⁵ — the oracle hash gate would surface
  * one). First-occurrence order, same sub-k/empty semantics as
  * [[Shingles]]. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    Shingles.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Shingles.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

/** ALL k-token window xxhash64 keys of a token array, in window
  * order (`array<long>`, index = window start) — the span-dedup
  * window build ([[graft.dedup.Dedup.dropRepeatedSpans]]):
  * `posexplode` over this kernel replaces an interpreted HOF that
  * sliced the token array once per window. Unlike [[ShingleHashes]]
  * this keeps duplicates and positions (span semantics need every
  * occurrence). Fewer than k non-null tokens → empty array. */
case class WindowHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"window size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    Shingles.windowHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Shingles.windowHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : WindowHashes = copy(child = newChild)
}

case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Shingles.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  /** Column API: distinct word k-shingles of an `array<string>`. */
  def shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(tokens), k))

  /** Column API: distinct window xxhash64 keys of an `array<string>`. */
  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))

  /** Column API: ALL window xxhash64 keys, in order (index = start). */
  def windowHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(WindowHashes(ColumnBridge.expression(tokens), k))

  /** Shared interpreted/codegen kernel for [[WindowHashes]]. */
  def windowHashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m < k)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val space = UTF8String.fromString(" ")
    val out = new Array[Long](m - k + 1)
    i = 0
    val window = new Array[UTF8String](k)
    while (i <= m - k) {
      var j = 0
      while (j < k) { window(j) = toks(i + j); j += 1 }
      val s = UTF8String.concatWs(space, window: _*)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Shared interpreted/codegen hash kernel: distinct XXH64(seed 42)
    * of each space-joined k-window, first-occurrence order. */
  def shingleHashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val space = UTF8String.fromString(" ")
    def hashOf(s: UTF8String): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    if (m < k) {
      val whole = UTF8String.concatWs(space, toks.take(m): _*)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array[Long](hashOf(whole)))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]((m - k + 1) * 2)
    i = 0
    val window = new Array[UTF8String](k)
    while (i <= m - k) {
      var j = 0
      while (j < k) { window(j) = toks(i + j); j += 1 }
      seen.add(hashOf(UTF8String.concatWs(space, window: _*)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Shared interpreted/codegen kernel (public static for generated
    * code). Null tokens are skipped, matching concat_ws semantics. */
  def shingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    if (m < k) {
      val whole = UTF8String.concatWs(space, toks.take(m): _*)
      return new GenericArrayData(Array[Any](whole))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]((m - k + 1) * 2)
    i = 0
    val window = new Array[UTF8String](k)
    while (i <= m - k) {
      var j = 0
      while (j < k) { window(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
