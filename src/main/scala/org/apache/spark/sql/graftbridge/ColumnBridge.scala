package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 hides the Column(Expression) constructor behind
  * `private[sql] ExpressionUtils`; a library shipping custom Catalyst
  * expressions (graft.functions.*) needs exactly that conversion. This
  * one-file package inside `org.apache.spark.sql` re-exposes it — the
  * same approach other Spark-native libraries use. No session state, no
  * extension registration required, so graft Columns work on any session.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
