package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native dot product over embedding arrays (`array<float>` or
  * `array<double>`) — the inner loop of every similarity-search plan.
  *
  * Why a custom Catalyst `Expression` (idiom ladder, SURVEY §2.8): the
  * composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a
  * higher-order function — Spark evaluates HOF lambdas interpreted,
  * outside whole-stage codegen, allocating a zipped intermediate array
  * per row. On a brute-force scan that's the entire runtime. This
  * expression emits one static call over the raw `ArrayData` pair —
  * no boxing, no intermediate array, stays inside codegen.
  *
  * Semantics are IDENTICAL to the HOF form it replaces (verified by a
  * randomized equivalence spec): elements cast to double BEFORE the
  * multiply, accumulated left-to-right from 0.0 (deterministic fold —
  * no reassociation), null element or length mismatch → null result
  * (zip_with pads the short side with null, which nulls the HOF sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> operands, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotBoxed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorKernels
         |  .dotBoxed($a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer-exact dot product over `array<long>` operands — the inner
  * loop of the hashed-TF similarity path ([[graft.text.TextVectors]]),
  * where TF counts are integers and exactness is what makes the
  * ranking hash-oracleable. Same null semantics as [[DotProduct]]
  * (length mismatch / null element → null); overflow is the caller's
  * contract (TF dots stay far below 2^63). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_long requires array<bigint> operands, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotLongBoxed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.VectorKernels
         |  .dotLongBoxed($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  /** Column API: Σ aᵢ·bᵢ in double precision, codegen'd. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: integer-exact Σ aᵢ·bᵢ over `array<long>`, codegen'd. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Shared interpreted/codegen long kernel (public static for
    * generated code; boxed null encodes mismatch/null-element). */
  def dotLongBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Shared interpreted/codegen kernel (must stay public and
    * allocation-free; called from generated code). Boxed return: null
    * encodes the HOF null semantics (length mismatch / null element). */
  def dotBoxed(a: ArrayData, b: ArrayData, aFloat: Boolean,
               bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}
