package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 hides the conversion behind
  * `private[sql] ExpressionUtils` (the Column API became backend-agnostic);
  * custom native expressions still need it, so this lives inside the sql
  * package namespace. Public Spark API surface only — no internal system
  * assumptions beyond the published source tree. */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
