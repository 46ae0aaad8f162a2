package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard-competition ranking ("1-2-2-4"), the only ranking the reference
  * uses: pandas `rank(ascending=False, method='min')`
  * (`/root/reference/bid_evaluation/evaluator.py:314-317`,
  * `staged.py:361-364,389`). Equivalent to SQL `RANK()` descending.
  *
  * A naive `rank().over(Window.orderBy(...))` funnels every row through ONE
  * partition — fine for a bid table, fatal at 100 TB. Instead we aggregate to
  * the distinct score values (`groupBy(score).count`), rank that far smaller
  * frame (the only single-partition window runs over |distinct scores| rows),
  * and join the ranks back. AQE turns the join into a broadcast when the
  * distinct-score frame is small, so the big side is never shuffled beyond
  * the groupBy.
  */
object Ranks {

  /** Appends `outCol` = competition rank of `scoreCol` (descending: highest
    * score -> rank 1) as a nullable LongType. Rows with null OR NaN score
    * get a null rank — both map to pandas NaN, which `rank()` excludes from
    * the ranking universe (NaN rank, other ranks unshifted; the reference's
    * subsequent `.astype(int)` would raise, so the engine defines the
    * behavior pandas leaves undefined: NaN ≡ null ≡ unranked).
    */
  def withCompetitionRank(
      df: DataFrame,
      scoreCol: String,
      outCol: String,
      scalable: Boolean = false
  ): DataFrame = {
    // pandas result['ranking'] = ... overwrites; a join would duplicate
    val base = if (df.columns.contains(outCol)) df.drop(outCol) else df
    val counts = base
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(col(scoreCol).as("__graft_score"))
      .agg(count(lit(1)).as("__graft_cnt"))
    val ranks =
      if (scalable) scalableCountRanks(counts, outCol)
      else {
        val w = Window.orderBy(col("__graft_score").desc)
        counts.withColumn(
          outCol,
          (sum("__graft_cnt").over(w) - col("__graft_cnt") + lit(1L)).cast("long"))
      }
    base.join(ranks.select(col("__graft_score"), col(outCol)),
        base(scoreCol) === col("__graft_score"), "left")
      .drop("__graft_score")
  }

  /** Competition ranks from a (score, count) frame WITHOUT a global window:
    * range-partition the distinct scores descending (narrow rows — the only
    * thing persisted), collect one partial count-sum per partition, prefix-
    * sum on the driver, then a per-partition running sum yields
    * `rank = rows-before-score + 1`. Used when the caller knows the input
    * is big enough that |distinct scores| may itself be huge. */
  private def scalableCountRanks(counts: DataFrame, outCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}

    val spark = counts.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Eager checkpoint, not persist: the partial-sum collection and the
    // ranking pass must see the SAME range partitioning
    // (repartitionByRange SAMPLES bounds — a recompute could re-sample
    // differently and silently mis-rank against the collected offsets).
    // Truncated lineage makes a divergent recompute impossible, and the
    // blocks are released at the host's Checkpoints.freeAll barrier
    // instead of pinning the CacheManager for the session.
    // lazy: the partial-sum collection below is a full pass, so the
    // blocks materialize inside it — no separate upfront scan
    val sorted = graft.Checkpoints.localCheckpoint(counts
      .repartitionByRange(n, col("__graft_score").desc)
      .sortWithinPartitions(col("__graft_score").desc), eager = false)

    val partSums = sorted
      .select(spark_partition_id().as("pid"), col("__graft_cnt"))
      .groupBy("pid").agg(sum("__graft_cnt").as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (partSums.isEmpty) -1 else partSums.keys.max
    val offsets = new Array[Long](maxPid + 2)
    var acc = 0L
    for (pid <- 0 to maxPid) {
      offsets(pid) = acc
      acc += partSums.getOrElse(pid, 0L)
    }
    val offsetsB = spark.sparkContext.broadcast(offsets)

    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    sorted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val o = offsetsB.value
      var before = if (pid < o.length) o(pid) else 0L
      rows.map { r =>
        val cnt = r.getLong(1)
        val out = Row.fromSeq(r.toSeq :+ (before + 1L))
        before += cnt
        out
      }
    }(Encoders.row(schema))
  }

  /** Fully distributed competition rank for CONTINUOUS score columns,
    * where distinct-value aggregation degenerates (|distinct| ~ N and the
    * small-frame window above would single-partition N rows).
    *
    * Three steps, none global: (1) range-partition descending on the score
    * (equal values land in one partition, so tie groups never span a
    * boundary); (2) collect the tiny per-partition row counts and prefix-
    * sum them on the driver; (3) per partition, scan rows in sorted order
    * assigning `offset + competition rank within partition`. The only
    * driver data is one long per partition.
    *
    * Null and NaN scores get null rank (excluded from the universe),
    * matching [[withCompetitionRank]].
    */
  def rangePartitionedRank(
      df: DataFrame,
      scoreCol: String,
      outCol: String,
      numPartitions: Int = 0
  ): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}

    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt

    val base = if (df.columns.contains(outCol)) df.drop(outCol) else df
    val nonNull = base.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
    val unranked = base.filter(col(scoreCol).isNull || isnan(col(scoreCol)))

    // Eager checkpoint, not persist: the size-collection job and the
    // ranking pass must see the SAME range partitioning
    // (repartitionByRange SAMPLES bounds — a recompute could re-sample
    // differently and silently mis-rank against the collected offsets).
    // Truncated lineage makes a divergent recompute impossible; blocks
    // release at the host's Checkpoints.freeAll barrier.
    // lazy: the size-collection below is a full pass (see above)
    val sorted = graft.Checkpoints.localCheckpoint(nonNull
      .repartitionByRange(n, col(scoreCol).desc)
      .sortWithinPartitions(col(scoreCol).desc), eager = false)

    // (1 long per partition) -> driver -> prefix offsets
    val partSizes = sorted
      .select(spark_partition_id().as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (partSizes.isEmpty) -1 else partSizes.keys.max
    val offsets = new Array[Long](maxPid + 2)
    var acc = 0L
    for (pid <- 0 to maxPid) {
      offsets(pid) = acc
      acc += partSizes.getOrElse(pid, 0L)
    }

    val scoreIdx = sorted.schema.fieldIndex(scoreCol)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val encoder = Encoders.row(outSchema)
    val offsetsB = spark.sparkContext.broadcast(offsets)

    val ranked = sorted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val base = {
        val o = offsetsB.value
        if (pid < o.length) o(pid) else 0L
      }
      var i = 0L
      var tieStart = 0L
      var prev: Double = Double.NaN
      var first = true
      rows.map { r =>
        val s = r.getDouble(scoreIdx)
        // Double.compare, not !=: NaN != NaN would give each NaN row its own
        // tie group here, while the groupBy strategy (Spark NaN==NaN) ties
        // them — the two strategies must agree on NaN scores.
        if (first || java.lang.Double.compare(s, prev) != 0) {
          tieStart = i; prev = s; first = false
        }
        i += 1
        Row.fromSeq(r.toSeq :+ (base + tieStart + 1L))
      }
    }(encoder)

    // always union: even a non-nullable double column can carry NaN
    ranked.unionByName(unranked.withColumn(outCol, lit(null).cast("long")))
  }
}
