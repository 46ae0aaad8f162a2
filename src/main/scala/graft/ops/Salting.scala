package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the classic salting decomposition as
  * deterministic DataFrame transforms.
  *
  * When to reach for which ([[graft.tools.SkewBench]], 24M rows with half
  * the left side on ONE key, 32 cores, broadcast disabled: plain join
  * 7.6 s with AQE skew splitting off, 4.0 s with it on, salted join
  * 3.7 s):
  *
  *  - JOIN skew: leave it to AQE
  *    (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it splits
  *    oversized partitions at runtime from MEASURED sizes and got within
  *    ~10% of manual salting, with zero code and no 16× build-side
  *    replication. Note its size thresholds
  *    (`skewedPartitionThresholdInBytes`, default 256 MB) are cluster-
  *    scale; tiny local runs must lower them or AQE won't see skew.
  *  - Use [[saltedJoin]] only when AQE's splitter can't help: AQE
  *    disabled (plan-stability requirements, non-adaptive engines), or a
  *    join shape it won't touch. The documented trade is `buckets`×
  *    replication of the build side.
  *  - AGGREGATION skew has no AQE remedy at all — AQE never splits an
  *    aggregation's partitions. [[saltedAggregate]] is the tool when the
  *    per-key state is heavy (collect_set / sketches); plain algebraic
  *    aggregates are already fine (map-side partial combine absorbs the
  *    hot key before the shuffle).
  */
object Salting {

  /** Deterministic pseudo-random salt in [0, buckets) — derived from the
    * row's id-ish expression so replays are stable (no rand()). */
  def salt(of: Column, buckets: Int): Column =
    pmod(xxhash64(of), lit(buckets.toLong)).cast("int")

  /** Skew-safe aggregation: pre-aggregate on (keys, salt), then merge per
    * key. Correct for algebraic aggregates expressed as (partialExpr,
    * mergeExpr) pairs keyed by output name, e.g.
    * {{{
    * saltedAggregate(df, Seq("k"), col("id"), 16,
    *   Map("cnt" -> (count(lit(1)), sum(col("cnt"))),
    *       "total" -> (sum(col("v")), sum(col("total")))))
    * }}}
    * Hash aggregation already does map-side partial combine, so plain
    * sums rarely need this; it pays off when the per-key state is heavy
    * (collect_set/approx sketches) or a downstream window keys the skew. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      buckets: Int,
      aggs: Map[String, (Column, Column)]
  ): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(saltBy, buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2.as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m.as(n) }.toSeq: _*)
  }

  /** Skew-safe equi-join: the (small-ish but not broadcastable) right side
    * is replicated `buckets` times with an explicit salt column; left rows
    * get a deterministic salt, so each hot key's rows spread over `buckets`
    * reducers instead of one. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"
  ): DataFrame = {
    // right/full outer semantics break under replication: each right row is
    // exploded `buckets` times, so every unmatched replica would emit its
    // own null-padded output row
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types, got '$joinType'")
    // the salt must vary WITHIN a key (a key-derived salt would send a
    // hot key to a single bucket again): derive it from row identity
    val saltedLeft = left.withColumn("__salt",
      salt(monotonically_increasing_id(), buckets))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** [[saltedJoin]] that replicates the right side ONLY under the keys
    * that are actually hot: one count pass over the left keys finds
    * every key with ≥ `hotThreshold` rows, both sides split on that
    * (broadcast) hot set, the hot sliver joins salted and the long tail
    * joins plain — so the replication cost is `buckets × |hot keys'
    * right rows|` instead of `buckets × |right|` (q101's full-replica
    * formulation pays 16× on every right row to protect against a
    * handful of keys). Results are identical to the plain join
    * row-for-row — the split is a partition of the key space (hot keys
    * come from left counts, so a cold left key cannot meet a hot right
    * row), and the oracle for the q198 row is the UNSALTED join.
    *
    * `maxHotKeys` bounds the broadcast hot set loudly — a threshold
    * that makes most keys "hot" is not skew, it is a plain join (or
    * [[saltedJoin]] if it truly all melts). Null-keyed rows never match
    * in an equi-join; they ride the cold path and behave exactly as the
    * plain join would. */
  def adaptiveSaltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      hotThreshold: Long,
      joinType: String = "inner",
      maxHotKeys: Int = 10000
  ): DataFrame = {
    require(hotThreshold >= 2, "hotThreshold must be >= 2")
    require(maxHotKeys >= 1, "maxHotKeys must be >= 1")
    val hotFlag = graft.Checkpoints.trackCache(left
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(keys.map(col): _*)
      .limit(maxHotKeys + 1)
      .withColumn("__hot", lit(true))
      .persist())
    require(hotFlag.count() <= maxHotKeys,
      s"adaptiveSaltedJoin found > $maxHotKeys keys at >= $hotThreshold rows — " +
        "that is not a skew sliver; raise hotThreshold, raise maxHotKeys, or " +
        "use saltedJoin/a plain join deliberately")
    def split(df: DataFrame) = {
      val marked = df.join(broadcast(hotFlag), keys, "left")
      (marked.filter(col("__hot") === true).drop("__hot"),
        marked.filter(col("__hot").isNull).drop("__hot"))
    }
    val (lHot, lCold) = split(left)
    val (rHot, rCold) = split(right)
    saltedJoin(lHot, rHot, keys, buckets, joinType)
      .unionByName(lCold.join(rCold, keys, joinType))
  }
}
