package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst
  * expressions. Spark 4 moved `Column` onto the session-agnostic
  * ColumnNode representation and made the catalyst conversion
  * (`classic.ExpressionUtils`) private[sql], so a library shipping its
  * own `Expression`s needs this one-file shim in the sql package — the
  * same pattern public Spark extension libraries use. No Spark
  * internals are modified; this only re-exports the two conversions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
