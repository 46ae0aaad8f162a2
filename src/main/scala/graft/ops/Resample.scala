package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization for event streams: fixed-width bucketing to
  * a DENSE per-key grid (empty buckets materialized, not skipped) and
  * forward-filling of the holes — the standard prep for feature windows
  * and gap-tolerant downstream aggregation. The reference has no
  * time-series surface; these extend the engine the same way the join /
  * window operators do (SURVEY.md §2.6).
  */
object Resample {

  /** Bucket `tsCol` (integral epoch units) into `bucketWidth`-sized bins
    * per `keyCol` and aggregate each bin, then densify: every key gets
    * every bucket between the GLOBAL min and max bucket, with null
    * aggregate values in the holes (callers choose fill semantics —
    * `coalesce` for counts, [[forwardFill]] for carried metrics).
    * Bucketing uses integer `div` — exact on longs, no float rounding at
    * nanosecond magnitudes (2^53 < epoch-nanos). `tsCol` must be
    * non-negative (epoch units): `div` truncates toward zero, so a
    * pre-1970 value would bucket differently from floor-division engines
    * (DuckDB `//` floors).
    *
    * Scale shape: one groupBy(key, bucket) shuffle over the events; the
    * grid is |keys| x |buckets| built from a per-key `sequence` explode
    * against a broadcast 1-row bounds frame — never a driver-side
    * collect of the time range; the dense left join shuffles only the
    * (small) aggregated frame, not raw events. */
  def resample(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      bucketWidth: Long,
      aggs: Seq[Column]
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(aggs.nonEmpty, "at least one aggregate required")
    val b = df
      .withColumn("bucket", expr(s"$tsCol div $bucketWidth"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
    // barrier: b feeds the grid keys, the global bounds, and the dense
    // join; without it Catalyst re-aggregates the raw events three times.
    // Eager checkpoint, not persist: the returned lazy frame still
    // references this, so blocks are released by the host's
    // `Checkpoints.freeAll` barrier (ContextCleaner as fallback), never
    // pinned for the session the way persist would.
    val binned = graft.Checkpoints.localCheckpoint(b)
    val bounds = binned.agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val grid = binned.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    grid.join(binned, Seq(keyCol, "bucket"), "left")
  }

  /** Trailing rolling mean over the last `k` rows (current included)
    * within each key, in `orderCol` order — the moving-average smoothing
    * usually applied right after [[resample]]'s densification. Frames
    * shorter than `k` (the first rows of each key) average what exists,
    * the pandas `rolling(k, min_periods=1).mean()` convention.
    *
    * Scale shape: same as [[forwardFill]] — one window per partition key,
    * each key's series sorts independently. */
  def rollingMean(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCol: String,
      valueCol: String,
      k: Int,
      outCol: String = "rolling_mean"
  ): DataFrame = {
    require(k >= 1, "window must span at least one row")
    require(partitionCols.nonEmpty,
      "rollingMean needs partition keys: a global frame would sort everything into one partition")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(-(k - 1).toLong, Window.currentRow)
    df.withColumn(outCol, avg(col(valueCol)).over(w))
  }

  /** Forward-fill nulls in `cols`: each null takes the latest non-null
    * value at or before it within its `partitionCols` group, in `orderCol`
    * order (leading nulls stay null — there is nothing to carry). The
    * pandas `ffill` / SQL `LAST_VALUE IGNORE NULLS` idiom.
    *
    * Scale shape: one window per partition key — each key's series sorts
    * independently (bounded by the bucket count, not the corpus), so no
    * single-partition funnel. */
  def forwardFill(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCol: String,
      cols: Seq[String]
  ): DataFrame = {
    require(partitionCols.nonEmpty,
      "forwardFill needs partition keys: a global fill would sort everything into one partition")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }
}
