package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Wraps a raw Catalyst `Expression` into a public `Column`.
  *
  * Spark 4 unified `Column` over column nodes and made the
  * expression-backed constructor `private[sql]`
  * (classic/columnNodeSupport.scala), so custom native expressions —
  * graft's codegen'd kernels, e.g. [[graft.functions.SimHash64]] — need
  * this one-line bridge living inside the `org.apache.spark.sql`
  * namespace. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
