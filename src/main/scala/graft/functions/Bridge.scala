package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides these conversions behind
  * private[sql] (the unified Column is backed by ColumnNode); this object
  * lives under the org.apache.spark.sql package purely to re-export the
  * two conversions needed to expose custom Catalyst expressions as Columns.
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
