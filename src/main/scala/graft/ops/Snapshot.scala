package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot compaction: reduce an append-only change log to the latest
  * row per key — the standard first step when a 100 TB ingest directory
  * holds every historical version of every record (CDC tails, hourly
  * crawls, upsert logs).
  */
object Snapshot {

  /** Keeps, per `keyCols` group, the single row with the highest
    * `version`; version ties break toward the LARGER `idCol` value (the
    * later-written row wins); null versions lose to any non-null one.
    * `idCol` must be unique (it makes the selection total, so results
    * never depend on partitioning).
    *
    * Scale shape: ONE hash aggregate — the candidate row rides inside a
    * `max(struct(version, id, row))`, so there is no join-back and the
    * map-side partial combine ships one candidate per key per partition.
    * The struct comparison never reaches the payload: (version, id) is
    * already unique. Contrast with the window formulation
    * (`row_number over (partition by key order by version desc)`), which
    * shuffles and sorts EVERY version of every row.
    */
  def latestByKey(
      df: DataFrame,
      keyCols: Seq[String],
      version: Column,
      idCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "latestByKey needs at least one key column")
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(version.as("v"), col(idCol).as("i"), payload.as("r"))).as("__m"))
      .select(col("__m.r.*"))
  }
}
