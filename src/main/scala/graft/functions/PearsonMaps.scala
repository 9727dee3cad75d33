package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, MapType, StringType}

/** Native Pearson correlation of two `map<string,double>` value
  * profiles over their COMMON keys — the per-pair kernel of the
  * all-pairs correlation surface (customer_segmentation_2.py:36-38
  * semantics, compact formulation).
  *
  * Why a custom Catalyst `Expression` (idiom ladder, SURVEY §2.8): the
  * composed form is a higher-order `aggregate` over the filtered key
  * intersection with two `element_at` probes per step — interpreted,
  * outside whole-stage codegen, and measured ~10× the total query cost
  * on the 1M-pair bench. This kernel is one static call per pair: scan
  * the (sorted) left key array, probe the right map, accumulate the six
  * running sums, finish with the product-moment formula — all primitive
  * double arithmetic inside codegen.
  *
  * Numerics: accumulation follows the left map's key order (sorted by
  * construction in the caller), so results are deterministic;
  * n·Σxy−ΣxΣy = n·Σ(x−x̄)(y−ȳ) algebraically, i.e. the same corr the
  * co-moment aggregate computes, within ~1e-13 — callers round at 4dp.
  * Returns null when fewer than 2 common keys or either variance is
  * zero (the co-moment aggregate's NaN cases, made explicit).
  */
case class PearsonMaps(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case MapType(StringType, DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pearson_maps requires map<string,double> operands, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pearson_maps"

  override def nullSafeEval(a: Any, b: Any): Any =
    PearsonMaps.corrBoxed(a.asInstanceOf[MapData], b.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.PearsonMaps.corrBoxed($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PearsonMaps =
    copy(left = newLeft, right = newRight)
}

object PearsonMaps {

  /** Column API: Pearson corr over the common keys of two
    * `map<string,double>` columns; null if <2 common keys or zero
    * variance. */
  def pearsonMaps(a: Column, b: Column): Column =
    ColumnBridge.column(
      PearsonMaps(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Shared interpreted/codegen kernel. Left key order drives
    * accumulation; right map is probed by linear scan (profiles are a
    * handful of keys — a hash probe would cost more to build). Null
    * map values are skipped like a missing key. */
  def corrBoxed(ma: MapData, mb: MapData): java.lang.Double = {
    val ka = ma.keyArray(); val va = ma.valueArray()
    val kb = mb.keyArray(); val vb = mb.valueArray()
    val na = ma.numElements(); val nb = mb.numElements()
    var n = 0.0; var sx = 0.0; var sy = 0.0
    var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    var i = 0
    while (i < na) {
      if (!va.isNullAt(i)) {
        val key = ka.getUTF8String(i)
        var j = 0
        var found = false
        while (j < nb && !found) {
          if (!vb.isNullAt(j) && key.equals(kb.getUTF8String(j))) {
            val x = va.getDouble(i)
            val y = vb.getDouble(j)
            n += 1.0; sx += x; sy += y
            sxy += x * y; sxx += x * x; syy += y * y
            found = true
          }
          j += 1
        }
      }
      i += 1
    }
    if (n < 2.0) return null
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    if (denx <= 0.0 || deny <= 0.0) return null
    java.lang.Double.valueOf(
      (n * sxy - sx * sy) / (math.sqrt(denx) * math.sqrt(deny)))
  }
}
