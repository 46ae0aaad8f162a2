package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus drain — the only way to
  * read listener-fed counters (task counts per bench query) at a
  * DETERMINISTIC boundary: listener events are delivered async, so a
  * counter read right after an action can miss the action's own tail
  * events (or swallow the previous query's). Same package-bridge
  * technique as [[org.apache.spark.sql.graft.ColumnBridge]]. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(10000L)
}
