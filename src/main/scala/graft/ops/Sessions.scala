package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization and ordered-funnel analytics over event logs —
  * the session/conversion layer every product event pipeline needs on top
  * of the raw stream (the reference has no event model; this extends the
  * engine's event-analytics family alongside [[Metrics.retentionCohorts]]
  * and [[Metrics.eventTransitions]]).
  *
  * All arithmetic is integer microsecond math on the normalized `ts`
  * contract ([[graft.io.Tables]]), so every output is exact and
  * engine-mirrorable. Scale shape: one window pass partitioned by user
  * (per-user streams are short; user is the natural shard key), then
  * session-grain aggregates that ride the same (user) partitioning.
  */
object Sessions {

  /** Assign a per-user session ordinal: an event starts a NEW session when
    * it is the user's first event or when the gap since the user's
    * previous event (ordered by `usCol`, ties by `idCol`) strictly
    * exceeds `gapUs`. Adds `session_seq` (1-based long) to the input
    * columns. Null users are dropped — a session needs an identity.
    *
    * One window pass, two frame-local functions (lag + running sum) over
    * the SAME window spec, so Catalyst plans a single sort per user
    * partition — no second shuffle.
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      usCol: Column,
      idCol: String,
      gapUs: Long
  ): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(usCol.asc, col(idCol).asc)
    val prev = lag(usCol, 1).over(w)
    val newSession = when(prev.isNull || usCol - prev > gapUs, 1L).otherwise(0L)
    events
      .filter(col(userCol).isNotNull && usCol.isNotNull)
      .withColumn("session_seq",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per (user, session): event count, start/end/duration in
    * microseconds, and the number of distinct event types touched. The
    * session grain rides the sessionize window's (user) partitioning —
    * the groupBy shuffles on a key the data is already clustered by. */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      usCol: Column,
      idCol: String,
      typeCol: String,
      gapUs: Long
  ): DataFrame =
    sessionize(events, userCol, usCol, idCol, gapUs)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(usCol).as("start_us"),
        max(usCol).as("end_us"),
        (max(usCol) - min(usCol)).as("duration_us"),
        countDistinct(col(typeCol)).as("n_types"))

  /** Ordered-step funnel: for each user, step `i` converts at the
    * earliest event of type `steps(i)` at-or-after the user's step-`i-1`
    * conversion time (micro timestamps make cross-type ties vanishingly
    * rare; `>=` keeps the contract total). Returns one row per step:
    * `step_idx`, `step_type`, `n_users`, `conv_from_first_r`,
    * `conv_from_prev_r`.
    *
    * Scale shape: the step-0 aggregate is one groupBy over the matching
    * slice; each later step joins a |users|-row frame back to the
    * events slice on the user key and re-aggregates — |steps| bounded
    * passes, no window over the raw stream. Each per-step user frame is
    * persisted because it feeds BOTH the next step's join and its own
    * count row (the shared-subtree rule). The final ratio assembly is a
    * |steps|-row frame — window functions there are driver-trivial. */
  /** The funnel's conditional-min chain: frame i holds (user `__u`,
    * `__ti`) — each user's FIRST reach time of step i at-or-after their
    * step-(i−1) reach. Shared by [[funnel]] (counts) and
    * [[funnelStepLatency]] (step-to-step timing). Frames are cached —
    * each feeds the next AND its own consumer. */
  private def firstReachFrames(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      usCol: Column,
      steps: Seq[String]
  ): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct types")
    val ev = graft.Checkpoints.trackCache(events
      .filter(col(userCol).isNotNull && usCol.isNotNull && col(typeCol).isin(steps: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__t"), usCol.as("__us"))
      .persist())
    steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prevOpt, (step, _)) =>
        val slice = ev.filter(col("__t") === step)
        val converted = prevOpt match {
          case None =>
            slice.groupBy(col("__u")).agg(min(col("__us")).as("__ti"))
          case Some(prev) =>
            slice.join(prev.select(col("__u"), col("__ti").as("__tprev")), Seq("__u"))
              .filter(col("__us") >= col("__tprev"))
              .groupBy(col("__u")).agg(min(col("__us")).as("__ti"))
        }
        Some(graft.Checkpoints.trackCache(converted.persist()))
    }.flatten
  }

  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      usCol: Column,
      steps: Seq[String]
  ): DataFrame = {
    val stepFrames = firstReachFrames(events, userCol, typeCol, usCol, steps)
    val counts = stepFrames.zip(steps).zipWithIndex.map { case ((f, step), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step_idx"), lit(step).as("step_type"), col("n_users"))
    }.reduce(_.union(_))
    val w = Window.orderBy(col("step_idx").asc)
    counts
      .withColumn("__first", first(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__prev", coalesce(lag(col("n_users"), 1).over(w), col("n_users")))
      .select(col("step_idx"), col("step_type"), col("n_users"),
        when(col("__first") > 0, round(col("n_users") / col("__first"), 6) + lit(0.0))
          .as("conv_from_first_r"),
        when(col("__prev") > 0, round(col("n_users") / col("__prev"), 6) + lit(0.0))
          .as("conv_from_prev_r"))
  }

  /** Step-to-step funnel TIMING: for each consecutive pair of funnel
    * steps, how long converting users took — `n_users` who reached the
    * later step plus exact order statistics (min/max and interpolated
    * percentiles, the [[conversionLatency]] contract) of `t_{i+1} −
    * t_i` over each user's first-reach chain. The table that turns
    * "40% drop between click and purchase" into "and the survivors
    * took a median 6 minutes" — where the wait, not the drop, is the
    * product problem. Reach times come from the same conditional-min
    * chain as [[funnel]], so the user sets agree with the funnel's
    * counts by construction; deltas are exact integer microseconds,
    * never negative (step i+1's reach is at-or-after step i's).
    *
    * Scale shape: the chain's |steps| keyed aggregates + one
    * user-keyed join and one percentile aggregate per step PAIR —
    * every frame at user grain. Output: (step_idx of the destination,
    * from_type, to_type, n_users, min_us, max_us, p50_us_r, ...). */
  def funnelStepLatency(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      usCol: Column,
      steps: Seq[String],
      pcts: Seq[Double] = Seq(0.5, 0.9)
  ): DataFrame = {
    require(steps.size >= 2, "funnelStepLatency needs at least two steps")
    require(pcts.forall(p => p > 0.0 && p <= 1.0),
      s"funnelStepLatency: pcts must lie in (0, 1], got ${pcts.mkString(", ")}")
    // column names encode round(p*100) — two pcts sharing a rounded label
    // (0.95 vs 0.954) would collide into a duplicate column
    require(pcts.map(p => (p * 100).round).distinct.size == pcts.size,
      "funnelStepLatency: pcts " + pcts.mkString(", ") + " collide after " +
        "rounding to integer percent labels — space them at least 1% apart")
    val frames = firstReachFrames(events, userCol, typeCol, usCol, steps)
    frames.sliding(2).zipWithIndex.map { case (pair, i) =>
      val (prev, next) = (pair.head, pair(1))
      val deltas = next.select(col("__u"), col("__ti"))
        .join(prev.select(col("__u"), col("__ti").as("__tprev")), Seq("__u"))
        .select((col("__ti") - col("__tprev")).as("__d"))
      val pctCols = pcts.map { p =>
        (round(percentile(col("__d"), lit(p)), 6) + lit(0.0))
          .as(s"p${(p * 100).round}_us_r")
      }
      val aggs = Seq(count(lit(1)).as("n_users"),
        min(col("__d")).as("min_us"), max(col("__d")).as("max_us")) ++ pctCols
      deltas.agg(aggs.head, aggs.tail: _*)
        .select(Seq(lit(i + 1L).as("step_idx"),
          lit(steps(i)).as("from_type"), lit(steps(i + 1)).as("to_type")) ++
          (Seq(col("n_users"), col("min_us"), col("max_us")) ++
            pcts.map(p => col(s"p${(p * 100).round}_us_r"))): _*)
    }.reduce(_.unionByName(_))
  }

  /** Per-user conversion latency from the first `fromType` event to the
    * first `toType` event at-or-after it, summarized as one row of exact
    * order statistics: n converted users, min/max, and interpolated
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`) of the
    * latency in microseconds, rounded to 6dp.
    *
    * Scale shape: two |users|-row aggregates joined on the user key,
    * then one global exact-percentile aggregate — swap to
    * `percentile_approx` at the 100 TB corpus like [[graft.StatsAgg]]. */
  def conversionLatency(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      usCol: Column,
      fromType: String,
      toType: String,
      pcts: Seq[Double] = Seq(0.5, 0.9, 0.99)
  ): DataFrame = {
    val ev = events.filter(col(userCol).isNotNull && usCol.isNotNull)
    val from = ev.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("__u")).agg(min(usCol).as("__t0"))
    val to = ev.filter(col(typeCol) === toType)
      .select(col(userCol).as("__u"), usCol.as("__us"))
      .join(from, Seq("__u"))
      .filter(col("__us") >= col("__t0"))
      .groupBy(col("__u")).agg(min(col("__us") - col("__t0")).as("__lat"))
    val pctCols = pcts.zipWithIndex.map { case (p, i) =>
      (round(percentile(col("__lat"), lit(p)), 6) + lit(0.0))
        .as(s"p${(p * 100).round}_us_r")
    }
    val aggCols = Seq(
      count(lit(1)).as("n_converted"),
      min(col("__lat")).as("min_us"),
      max(col("__lat")).as("max_us")) ++ pctCols
    to.agg(aggCols.head, aggCols.tail: _*)
  }

  /** Events-per-user magnitude histogram: users bucketed by the exact
    * base-2 magnitude of their event count (`length(bin(n)) - 1` —
    * integer-exact floor(log2), no FP wobble at power-of-2 boundaries).
    * One |users|-row aggregate, then a ≤64-row bucket aggregate — the
    * power-law diagnostic that sizes skew guards before a per-user join.
    */
  def activityHistogram(events: DataFrame, userCol: String): DataFrame =
    events.filter(col(userCol).isNotNull)
      .groupBy(col(userCol)).agg(count(lit(1)).as("__n"))
      .groupBy((length(bin(col("__n"))) - 1).cast("long").as("log2_bucket"))
      .agg(
        count(lit(1)).as("n_users"),
        min(col("__n")).as("min_events"),
        max(col("__n")).as("max_events"),
        sum(col("__n")).as("sum_events"))

  /** Repeated-session signatures — the bot/replay fingerprint: every
    * session reduces to the md5 of its event-type sequence in
    * (time, id) order (U+0001 joiner, the engine's signature
    * convention; null types are coalesced to a U+0000 sentinel INSIDE
    * the struct, because concat_ws silently skips nulls and would
    * otherwise collapse sequences that differ only in where a null
    * sits), then signatures repeating across >= `minSessions`
    * sessions and >= `minLen` events are reported with how many
    * sessions and distinct users share them. A human clicks in varied
    * orders; a bot replays one script from a thousand accounts — that
    * is exactly a long fingerprint with huge `n_sessions` spread over
    * many users.
    *
    * Scale shape: the sessionize window pass, then ONE aggregate to
    * session grain (the deterministic in-group order comes from
    * `array_sort(collect_list(struct(us, id, type)))` — session event
    * counts are human-scale, the engine-wide bounded-fold convention),
    * then a |signatures|-grain count. Only 16-byte hashes and counts
    * cross the final exchange, never event payloads. */
  def sessionFingerprints(
      events: DataFrame,
      userCol: String,
      usCol: Column,
      idCol: String,
      typeCol: String,
      gapUs: Long,
      minSessions: Long = 2L,
      minLen: Int = 2
  ): DataFrame = {
    val sess = sessionize(events, userCol, usCol, idCol, gapUs)
      .groupBy(col(userCol).as("__u"), col("session_seq"))
      .agg(
        md5(concat_ws("\u0001",
          transform(
            array_sort(collect_list(struct(usCol.as("us"), col(idCol).as("id"),
              coalesce(col(typeCol), lit("\u0000")).as("t")))),
            e => e.getField("t")))).as("fingerprint"),
        count(lit(1)).as("__len"))
      .filter(col("__len") >= minLen)
    sess
      .groupBy(col("fingerprint"), col("__len").as("seq_len"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("__u")).as("n_users"))
      .filter(col("n_sessions") >= minSessions)
  }

  /** Inter-event gap histogram: per-user consecutive-event gaps bucketed
    * by exact base-2 magnitude (`length(bin(gap)) - 1`; zero gaps —
    * same-microsecond events — land in bucket -1). The burst/idle
    * cadence profile that picks the sessionization gap and the
    * watermark delay from data instead of folklore. One window pass per
    * user, then a ≤64-row aggregate. */
  def interEventGaps(
      events: DataFrame,
      userCol: String,
      usCol: Column,
      idCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(usCol.asc, col(idCol).asc)
    events
      .filter(col(userCol).isNotNull && usCol.isNotNull)
      .select((usCol - lag(usCol, 1).over(w)).as("__gap"))
      .filter(col("__gap").isNotNull)
      .groupBy(when(col("__gap") > 0, length(bin(col("__gap"))) - 1)
        .otherwise(-1).cast("long").as("log2_gap_us"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"))
  }

  /** Behavioral motif mining: the top-k most frequent `depth`-step event
    * sequences across all users — the discovery complement of
    * [[funnel]] (funnel counts a KNOWN path; this surfaces the paths
    * worth funneling, and a bot's mechanical loop dominates this table
    * long before any single-step statistic moves). Each user's stream
    * orders by (`orderCol`, `idCol`); a path is `depth` CONSECUTIVE
    * events joined with " > " (windows of the stream, not subsequences
    * — gaps break a motif). Paths shorter than `depth` (stream tails)
    * are excluded.
    *
    * Scale shape: one window pass per user partition (depth−1 `lead`s
    * over the same sort), a path-grain count (map-side combined), and
    * the size-k string heap — no second sort, no driver state. Ties
    * rank toward the binary-smaller path (the [[GroupTopK]] contract).
    * Output: (path, n, rank). */
  def eventPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      orderCol: Column,
      idCol: String,
      depth: Int = 3,
      k: Int = 25
  ): DataFrame = {
    require(depth >= 2, "a path needs at least 2 steps")
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCol.asc, col(idCol).asc)
    val steps = col(typeCol) +: (1 until depth).map(i => lead(col(typeCol), i).over(w))
    val counted = events
      .filter(col(userCol).isNotNull)
      .select(steps.zipWithIndex.map { case (c, i) => c.as(s"__s$i") }: _*)
      .filter((0 until depth).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .groupBy(concat_ws(" > ", (0 until depth).map(i => col(s"__s$i")): _*).as("path"))
      .agg(count(lit(1)).as("n"))
    GroupTopK.topKPerGroupString(
        counted.withColumn("__g", lit(0))
          .withColumn("__n_d", col("n").cast("double")),
        Seq("__g"), "path", "__n_d", k)
      .select(col("path"), col("__n_d").cast("long").as("n"), col("rank"))
  }
}
