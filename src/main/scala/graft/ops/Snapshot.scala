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
    * intervals; null on the current run), `last_obs` (last ts observed
    * inside the run — the incremental high-water mark [[scd2Apply]]
    * checks arrivals against), `n_obs`, and `is_current`.
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
      .agg(min(ts).as("valid_from"), max(ts).as("last_obs"),
        count(lit(1)).as("n_obs"))
    val wRun = Window.partitionBy(keyCols.map(col): _*).orderBy(col("version").asc)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental [[scd2History]] MAINTENANCE: merge a batch of NEW
    * observations into an existing history frame (a previous
    * `scd2History`/`scd2Apply` output) so the result equals a full
    * rebuild over (old ∪ new) observations — while CLOSED versions pass
    * through untouched. Only each touched key's OPEN run re-enters the
    * window machinery: the current run is replayed as one synthetic
    * run-weight observation (ts = its `valid_from`, weight = its
    * `n_obs`, null tie so it orders first) unioned with the key's new
    * observations, then the exact [[scd2History]] lag-flag / running-sum
    * / run-grain plan runs over that sliver. Cost is the increment:
    * |open runs| + |new obs| rows cross the one window pass; the closed
    * history is a pass-through union branch, never shuffled.
    *
    * Late data refuses loudly: a new observation timestamped AT OR
    * BEFORE its key's current-run `last_obs` cannot be merged
    * append-only (an earlier one may split a closed interval; an
    * equal-ts one would need the original observation's tie value to
    * order against, which the run-compacted history no longer holds) —
    * the raise_error rides the CONSUMED timestamp column, so the guard
    * survives the optimizer; rebuild from the full log instead. The
    * strictly-greater contract is what makes this EXACTLY equal to a
    * full [[scd2History]] rebuild over (old ∪ new).
    */
  def scd2Apply(
      history: DataFrame,
      newObs: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      ts: Column,
      tieCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "scd2Apply needs at least one key column")
    require(valueCols.nonEmpty, "scd2Apply needs at least one value column")
    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current"))

    // guard: per-key append-only contract, checked on the CONSUMED ts
    val hwm = open.select(keyCols.map(col) :+ col("last_obs").as("__hwm")
      :+ (col("version") - lit(1L)).as("__base"): _*)
    val checkedTs = when(col("__hwm").isNotNull && ts <= col("__hwm"),
      raise_error(concat(lit("scd2Apply: observation at ts="), ts.cast("string"),
        lit(" does not strictly follow its key's current-run last_obs="),
        col("__hwm").cast("string"),
        lit(" — late data cannot merge append-only; rebuild with scd2History"))))
      .otherwise(ts)
    val tieType = newObs.schema(tieCol).dataType
    val fresh = newObs
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) && ts.isNotNull)
      .join(hwm, keyCols, "left")
      .select(keyCols.map(col) ++ valueCols.map(col)
        :+ checkedTs.as("__ts") :+ col(tieCol).as("__tie")
        :+ lit(1L).as("__w") :+ ts.as("__last")
        :+ coalesce(col("__base"), lit(0L)).as("__base"): _*)

    // the open run as one synthetic weight-n_obs observation (null tie
    // orders first; carries its own base so lone keys replay exactly)
    val synth = open.select(keyCols.map(col) ++ valueCols.map(col)
      :+ col("valid_from").as("__ts") :+ lit(null).cast(tieType).as("__tie")
      :+ col("n_obs").as("__w") :+ col("last_obs").as("__last")
      :+ (col("version") - lit(1L)).as("__base"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__tie").asc_nulls_first)
    val valueChanged = valueCols.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val flag = when(row_number().over(w) === 1 || valueChanged, 1L).otherwise(0L)
    val tail = synth.unionByName(fresh)
      .withColumn("version", col("__base") +
        sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keyCols ++ valueCols).map(col) :+ col("version"): _*)
      .agg(min(col("__ts")).as("valid_from"), max(col("__last")).as("last_obs"),
        sum(col("__w")).as("n_obs"))
    val wRun = Window.partitionBy(keyCols.map(col): _*).orderBy(col("version").asc)
    val recomputed = tail
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
    closed.unionByName(recomputed.select(closed.columns.map(col): _*))
  }
}
