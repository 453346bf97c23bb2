package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for the `private[sql]` Column <-> Expression bridge. Custom
  * Catalyst expressions (e.g. graft.functions.CosineSimilarity) need this to
  * surface as `Column`s; placing the shim inside `org.apache.spark.sql`
  * scope is the standard pattern for libraries extending Catalyst. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
