package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ↔ Expression bridge. Spark 4's `ExpressionUtils` is
 * `private[sql]`, so this one-file subpackage of `org.apache.spark.sql`
 * re-exports the two conversions the engine needs to expose native Catalyst
 * expressions as user-facing `Column`s (the same technique Spark extension
 * libraries use; no Spark internals are modified).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
