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

  /** Release-to-release DIFF between two snapshots keyed by `keyCols`:
    * one row per key that was `added`, `removed`, or `changed` (its
    * `compareCols` tuple differs); unchanged keys produce nothing.
    * The audit a corpus release ships with — "what exactly moved since
    * the last blessed snapshot".
    *
    * Each side reduces to (key, md5 of the value tuple) BEFORE the
    * full-outer join, so the join carries two hashes per key, never the
    * payloads — at 100 TB the diff costs two map-side projections and
    * one key-grain shuffle. The value signature is the engine's
    * portable convention : md5 over the stringified tuple joined on
    * U+0001 with U+0000 null sentinels (an external engine re-derives
    * the same diff via chr(1)/chr(0)).
    * Keys must be unique within each snapshot (compact with
    * [[latestByKey]] first); duplicate keys would cross-multiply in the
    * join. */
  def snapshotDiff(
      prev: DataFrame,
      cur: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    def sig(df: DataFrame, out: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("\u0001",
          compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(out): _*)
    sig(prev, "__old").join(sig(cur, "__new"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") =!= col("__new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  import org.apache.spark.sql.expressions.Window

  /** SCD Type-2 history assembly: collapse a per-key observation stream
    * into validity intervals. Observations are ordered per `keyCols`
    * group by (`ts`, `tieCol`); a new VERSION starts whenever any
    * `valueCols` entry differs from the previous observation
    * (null-safe `<=>`, so null→"x" and "x"→null both open a version).
    * One output row per (key, version) run: the run's values,
    * `version` (1-based), `valid_from` (first ts of the run),
    * `valid_to` (the NEXT run's valid_from — half-open [from, to)
    * intervals; null on the current run), `n_obs`, and `is_current`.
    * The standard lakehouse dimension-history build from a CDC tail or
    * repeated snapshot loads.
    *
    * Null keys / null timestamps are dropped (an interval needs an
    * identity and a position); `tieCol` must be non-null and unique so
    * the run structure is total and partition-independent.
    *
    * Scale shape: one window pass partitioned by key (lag + running sum
    * over the SAME window spec — a single sort per key partition, the
    * [[graft.ops.Sessions.sessionize]] plan shape), a run-grain
    * aggregate riding that same partitioning, then a lead() window at
    * run grain (|versions| rows per key, human-scale). Nothing global,
    * no join — survives a 100 TB change log partitioned by key. */
  def scd2History(
      obs: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      ts: Column,
      tieCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    require(valueCols.nonEmpty, "scd2History needs at least one value column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ts.asc, col(tieCol).asc)
    // first observation of a key opens version 1 (detected via the
    // non-null tie column, NOT a value lag — an all-null first value
    // tuple must still open a version)
    val valueChanged = valueCols.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val flag = when(lag(col(tieCol), 1).over(w).isNull || valueChanged, 1L).otherwise(0L)
    val runs = obs
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) && ts.isNotNull)
      .withColumn("version",
        sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keyCols ++ valueCols).map(col) :+ col("version"): _*)
      .agg(min(ts).as("valid_from"), count(lit(1)).as("n_obs"))
    val wRun = Window.partitionBy(keyCols.map(col): _*).orderBy(col("version").asc)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
