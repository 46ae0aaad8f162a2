package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to rebuild a checkpointed frame's [[LogicalRDD]] leaf WITHOUT
  * its `originStats`/`originConstraints` (both default to `None` in the
  * curried constructor), over the SAME materialized internal RDD.
  *
  * Why not the public route (`createDataFrame(df.rdd, df.schema)`)?
  * That detour decodes every UnsafeRow to an external `Row` and
  * re-encodes it on read — two full row codecs per consumer pass of
  * every checkpoint, ~1.3× on an iterative loop's wall clock (measured
  * on q73's ~12-round label propagation: 1.11s → 1.43s solo min-of-5
  * at sf0.1). Reusing the `LogicalRDD`'s own `rdd` keeps the read path
  * identical to a plain checkpoint — the only change is the dropped
  * origin statistics, which is the entire point (see
  * [[graft.Checkpoints.localCheckpoint]]'s compounding-originStats
  * planner hazard).
  */
object LogicalRDDBridge {

  /** `df` as returned by `Dataset.localCheckpoint`: a fresh frame over
    * the same checkpointed blocks, same output attributes/partitioning/
    * ordering, but stats reset to `defaultSizeInBytes`. Falls back to
    * the public row-codec rebuild if the plan is not a bare
    * [[LogicalRDD]] leaf (never the case for a checkpoint result). */
  def withoutOriginStats(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[Dataset[Row]]
    val session = classic.queryExecution.sparkSession
    classic.queryExecution.analyzed match {
      case l: LogicalRDD =>
        Dataset.ofRows(session, LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(session))
      case _ =>
        session.createDataFrame(classic.toDF().rdd, classic.schema)
    }
  }
}
