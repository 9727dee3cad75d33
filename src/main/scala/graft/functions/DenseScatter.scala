package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native scatter of sparse `(index, value)` entries into a dense
  * `array<long>` of fixed length `d` — the densify step of the
  * hashed-TF vector build ([[graft.text.TextVectors]]).
  *
  * Why native (measured, round 10): the composed form
  * `transform(sequence(0, d-1), i => coalesce(try_element_at(m, i),
  * 0))` probes a `MapData` once per slot, and Spark map lookup is a
  * LINEAR scan — O(d · |entries|) per row, interpreted (HOF). At
  * sf0.1 with d = 512 that one stage owned ~4.6 s of the 7 s query.
  * This kernel is one O(|entries| + d) pass per row inside codegen.
  *
  * Semantics: slots default to 0; entries with index outside [0, d)
  * are ignored; duplicate indices ACCUMULATE (the TF build groups by
  * bucket first, so duplicates don't occur there — accumulation is
  * the natural bag semantic). Null entry structs / null fields are
  * skipped.
  */
case class DenseScatter(child: Expression, d: Int)
    extends UnaryExpression {
  require(d >= 1, s"dense dimension must be >= 1, got $d")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
      if st.length == 2 && st.fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dense_scatter requires array<struct<bigint,bigint>>, got " +
        other.catalogString)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dense_scatter"

  override def nullSafeEval(input: Any): Any =
    DenseScatter.scatter(input.asInstanceOf[ArrayData], d)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DenseScatter.scatter($c, $d)")

  override protected def withNewChildInternal(newChild: Expression)
      : DenseScatter = copy(child = newChild)
}

object DenseScatter {

  /** Column API: dense `array<long>` of length `d` from sparse
    * `array<struct<index: long, value: long>>` entries. */
  def scatter(entries: Column, d: Int): Column =
    ColumnBridge.column(
      DenseScatter(ColumnBridge.expression(entries), d))

  /** Shared interpreted/codegen kernel (public static for generated
    * code). */
  def scatter(entries: ArrayData, d: Int): ArrayData = {
    val out = new Array[Long](d)
    val n = entries.numElements()
    var i = 0
    while (i < n) {
      if (!entries.isNullAt(i)) {
        val e = entries.getStruct(i, 2)
        if (!e.isNullAt(0) && !e.isNullAt(1)) {
          val idx = e.getLong(0)
          if (idx >= 0 && idx < d) out(idx.toInt) += e.getLong(1)
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
