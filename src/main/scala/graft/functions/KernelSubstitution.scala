package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the composed higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * (with or without per-element casts to double) into the native
  * codegen'd [[DotProduct]] kernel. Users writing the idiomatic HOF
  * form — in Scala or raw SQL — get kernel performance without knowing
  * the kernel exists; the substitution is exact (same fold order, same
  * null semantics — the kernel was specified as the HOF's bit-identical
  * replacement and is equivalence-tested in KernelsSpec).
  *
  * This is the Catalyst `Rule[LogicalPlan]` tier of the extension
  * ladder (SURVEY §2.8): session-wired via
  * [[GraftExtensions]]' `injectOptimizerRule` at build time, or
  * `spark.experimental.extraOptimizations` on a live session. The
  * match is deliberately conservative — any deviation from the exact
  * pattern (different zero, reordered operands, a finish lambda that
  * isn't identity) leaves the expression untouched.
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(
              x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add: Add, Seq(
              acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isFloatOrDoubleArray(a) && isFloatOrDoubleArray(b) &&
            // the kernel multiplies in DOUBLE; an uncast float-array form
            // (x*y evaluated in FLOAT, widened afterwards) is numerically
            // different and must be left alone (ADVICE r3)
            mul.dataType == DoubleType &&
            isVar(mul.left, x) && isVar(mul.right, y) &&
            isVar(add.left, acc) && isVar(add.right, v) &&
            isVar(fin, fv) =>
        DotProduct(a, b)
    }
}
