package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the session FunctionRegistry (`sessionState` is
  * `private[sql]`): lets the engine register its native expressions on an
  * ALREADY-RUNNING session — the `spark.sql.extensions` config hook only
  * applies at session construction. */
object FunctionRegistryBridge {
  def register(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
