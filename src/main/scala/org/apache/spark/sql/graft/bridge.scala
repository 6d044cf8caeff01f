package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression<->Column bridge. Spark 4 split the public Column API from
  * catalyst Expressions and made the converters private[sql]; third-party
  * native expressions still need both directions, so this lives in an
  * org.apache.spark.sql subpackage on purpose (the standard extension
  * seam — same access level the built-in functions use).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
