package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between [[Column]] (sql-api, ColumnNode-based in Spark 4)
  * and Catalyst [[Expression]]. `ExpressionUtils` is `private[sql]`,
  * so this one-file shim lives under `org.apache.spark.sql` to
  * re-export the two conversions the engine's custom expressions
  * need. No Spark internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
