package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column ↔ Expression converters `private[sql]`
  * (columns are ColumnNode-backed); this shim lives under
  * `org.apache.spark.sql` solely to re-export the two converters to the
  * engine — the standard extension-library technique, no Spark internals
  * are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
