package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> catalyst Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`,
  * spark/sql/core columnNodeSupport.scala). Spark 4 moved `Column` onto
  * ColumnNode and made direct Expression wrapping sql-private; a package
  * bridge is the standard extension-library technique for registering
  * custom codegen'd expressions without a session-config hook. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
