package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size-state sketch operators for corpus statistics at scale:
  * KMV (k-minimum-values) distinct counting and a count-min sketch for
  * token frequencies.
  *
  * Why not Spark's own `approx_count_distinct` / datasketches: those are
  * engine-private register layouts whose estimates cannot be replayed by
  * another engine, so results would be unverifiable. Both sketches here
  * derive every hash from md5 arithmetic that DuckDB evaluates
  * bit-identically (the q62/q104 portable-hash convention), making the
  * ESTIMATES themselves oracle-checkable — while keeping the shape that
  * matters at 100 TB: per-group state bounded by the sketch parameter,
  * map-side partial aggregation, shuffles that carry sketch rows instead
  * of data rows.
  *
  * Estimator references (published): Bar-Yossef et al. 2002 (KMV /
  * bottom-k distinct counting), Cormode & Muthukrishnan 2005 (count-min).
  */
object Sketches {

  /** 60-bit nonnegative uniform hash of a string column via md5 — the
    * portable-hash convention: both engines parse the same 15 hex chars. */
  private[graft] def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private val TwoPow60: Double = 1152921504606846976.0 // 2^60, exact in a double

  /** Per-group approximate distinct count of `valueCol` by k minimum
    * values: keep the k smallest distinct 60-bit hashes per group (a k-row
    * heap through [[GroupTopK]] — map-side partials, never a full sort);
    * if fewer than k distinct hashes exist the count is EXACT, else
    * estimate (k-1) / u_k with u_k the k-th smallest hash normalized to
    * [0, 1). Standard error ~ 1/sqrt(k-2).
    *
    * Output: groupCols + `est_distinct` (double, exact when < k). The
    * whole computation — hash, heap, estimator — is deterministic, so the
    * estimate is reproducible run-to-run and engine-to-engine.
    *
    * Scale: the exchange after the map-side partial carries at most
    * k rows per group; no group ever buffers more than k hashes. The
    * pre-aggregation `distinct` on (group, hash) is itself a map-side
    * combine. Union semantics are free: `kmvDistinct(a.union(b), ...)`
    * sketches the union without any merge machinery.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 256
  ): DataFrame = {
    require(k >= 3, "k must be >= 3 (estimator needs k-1 > 1)")
    val hashed = df
      .filter(col(valueCol).isNotNull) // null hashes to null, not a value
      .select((groupCols.map(col) :+ hash60(col(valueCol)).as("__u")): _*)
      .distinct()
    // all-equal scores make the heap's id tiebreak (smaller wins) keep
    // exactly the k SMALLEST hashes — a bottom-k heap without a second
    // aggregator (tie semantics are a tested GroupTopK invariant)
    val kept = GroupTopK.topKPerGroup(
      hashed.withColumn("__zero", lit(0.0)), groupCols, "__u", "__zero", k)
    kept
      .groupBy(groupCols.map(col): _*)
      .agg(max("__u").as("__uk"), count(lit(1)).as("__m"))
      .select((groupCols.map(col) :+
        when(col("__m") < k, col("__m").cast("double"))
          .otherwise(lit((k - 1).toDouble * TwoPow60) / col("__uk").cast("double"))
          .as("est_distinct")): _*)
  }

  /** KMV set-operation cardinalities between two corpora: estimated
    * |A|, |B|, |A ∪ B| and |A ∩ B| (and Jaccard) of the distinct
    * `valueCol` sets, from one bottom-k sketch per side plus the merged
    * bottom-k — never a cross-corpus join. The union estimator is the
    * same (k-1)/u_k on the MERGED bottom-k; intersection follows by
    * inclusion–exclusion (clamped at 0 — IE can go slightly negative at
    * sketch error); all are exact when the respective distinct counts
    * fall below k.
    *
    * This is the ESTIMATE path for what [[Dedup.corpusOverlap]] measures
    * exactly: at 100 TB per side you want three k-row aggregates, not a
    * distinct-set join. One output row:
    * (est_a, est_b, est_union, est_intersection, est_jaccard). */
  def kmvOverlap(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      k: Int = 256
  ): DataFrame = {
    require(k >= 3, "k must be >= 3 (estimator needs k-1 > 1)")
    val one = (df: DataFrame, name: String) =>
      kmvDistinct(df.select(lit(1).as("__g"), col(valueCol)), Seq("__g"), valueCol, k)
        .select(col("est_distinct").as(name))
    val est = one(a, "est_a")
      .crossJoin(one(b, "est_b"))
      .crossJoin(one(a.select(valueCol).unionAll(b.select(valueCol)), "est_union"))
    est.select(col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0))
          .as("est_intersection"))
      .withColumn("est_jaccard",
        when(col("est_union") > 0.0, col("est_intersection") / col("est_union"))
          .otherwise(lit(0.0)))
  }

  /** All-pairs KMV overlap MATRIX across one frame's groups — which
    * sources share content, estimated (the sketched sibling of
    * [[Reports.crossSourceDupMatrix]]'s exact classes, and the matrix
    * form of [[kmvOverlap]]): one bottom-k sketch per group, then every
    * unordered group pair merges its two k-arrays (bottom-k of a union
    * of bottom-k sketches IS the union's bottom-k — the standard KMV
    * merge) and reports estimated |A|, |B|, |A ∪ B|, |A ∩ B|, Jaccard.
    * Exact whenever the respective distinct counts fall below k.
    *
    * Scale shape: the corpus reduces to ≤ k hashes per group ONCE; the
    * pair stage runs on the |groups|-row sketch frame (|groups|²/2
    * array merges of 2k longs — source/corpus cardinality, not data).
    * Output: (source_a, source_b, est_a, est_b, est_union,
    * est_intersection, est_jaccard_r). */
  def kmvOverlapMatrix(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 256
  ): DataFrame = {
    require(k >= 3, "k must be >= 3 (estimator needs k-1 > 1)")
    val hashed = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), hash60(col(valueCol)).as("__u"))
      .distinct()
    val kept = GroupTopK.topKPerGroup(
      hashed.withColumn("__zero", lit(0.0)), Seq("__g"), "__u", "__zero", k)
    val sketches = kept.groupBy("__g")
      .agg(sort_array(collect_list(col("__u"))).as("__sk"))
    def estOf(sk: Column): Column =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble * TwoPow60) / element_at(sk, k).cast("double"))
    val a = sketches.select(col("__g").as("source_a"), col("__sk").as("__ska"))
    val b = sketches.select(col("__g").as("source_b"), col("__sk").as("__skb"))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("__sku",
        slice(array_sort(array_distinct(concat(col("__ska"), col("__skb")))), 1, k))
      .select(col("source_a"), col("source_b"),
        (round(estOf(col("__ska")), 6) + lit(0.0)).as("est_a"),
        (round(estOf(col("__skb")), 6) + lit(0.0)).as("est_b"),
        (round(estOf(col("__sku")), 6) + lit(0.0)).as("est_union"),
        estOf(col("__ska")).as("__ea"), estOf(col("__skb")).as("__eb"),
        estOf(col("__sku")).as("__eu"))
      .withColumn("__ei", greatest(col("__ea") + col("__eb") - col("__eu"), lit(0.0)))
      .withColumn("est_intersection", round(col("__ei"), 6) + lit(0.0))
      .withColumn("est_jaccard_r",
        round(when(col("__eu") > 0.0, col("__ei") / col("__eu")).otherwise(lit(0.0)), 6)
          + lit(0.0))
      .select("source_a", "source_b", "est_a", "est_b", "est_union",
        "est_intersection", "est_jaccard_r")
  }

  /** Count-min sketch of token frequencies: `depth` independent md5 hash
    * rows of `width` counters each. Output: (row, cell, cnt) — at most
    * depth × width rows regardless of corpus size (the fixed-size state a
    * 100-TB frequency service ships to clients). Tokens come from the
    * same native tokenizer as the rest of the text stack, WITH
    * multiplicity (frequencies, not document frequencies).
    *
    * Scale: the explode is depth× on token count, but the hash-groupBy
    * partial-aggregates each map partition down to ≤ depth·width rows
    * before the only shuffle. */
  def cmsSketch(
      df: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    val rows = array((0 until depth).map(lit): _*)
    df
      .select(explode(graft.expressions.WordGrams.wordGramsMulti(col(textCol), 1)).as("__tok"))
      .select(explode(rows).as("row"), col("__tok"))
      .groupBy(col("row"), cmsCell(col("row"), col("__tok"), width).as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The cell a (row, token) pair lands in: md5 of "row:token" keeps the
    * depth hash functions independent while staying engine-portable. */
  private[ops] def cmsCell(row: Column, token: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(row.cast("string"), lit(":"), token)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Per-group quantile ESTIMATES from a deterministic bounded uniform
    * sample: the k rows with the smallest 32-bit md5 unit hash of their id
    * form a without-replacement uniform sample (the bottom-k trick again,
    * this time keeping the ROWS), and the exact linear-interpolation
    * percentile of the sample estimates each requested quantile. The
    * scale-safe complement of the exact per-group `percentile` paths
    * (q93 / winsorize): a degenerate group — one language owning 80% of a
    * 100-TB corpus — costs k heap rows here instead of buffering every
    * value in one aggregation buffer.
    *
    * Everything is engine-replayable: the unit hash is the [[Sampling]]
    * md5 convention (exact in a double), ties break toward the smaller id
    * (the [[GroupTopK]] contract — mirror with `ORDER BY uh, id`), and
    * Spark's exact `percentile` matches DuckDB's `quantile_cont`
    * interpolation bit-for-bit on integer inputs (q93-pinned). Groups
    * with fewer than k rows are sampled exactly (the estimate is the true
    * quantile).
    *
    * Output: groupCols + one double column per requested (name, prob).
    *
    * Scale shape: map-side heap partials bound the exchange at k rows per
    * group; the winner ids join back (AQE broadcasts the sliver) and one
    * ordinary hash aggregate computes all quantiles per group. */
  def sampledQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      quantiles: Seq[(String, Double)],
      k: Int = 1024,
      salt: String = ""
  ): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall(q => q._2 >= 0.0 && q._2 <= 1.0), "probs must be in [0,1]")
    require(k >= 1, "k must be >= 1")
    val scored = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ col(idCol) :+
        (-Sampling.unitHash(col(idCol), salt)).as("__neg_u")): _*)
    val winners = GroupTopK
      .topKPerGroup(scored, groupCols, idCol, "__neg_u", k, rankCol = "__srank")
      .select(groupCols.map(c => col(c).as(s"__w_$c")) :+
        col(idCol).as("__w_id"): _*)
    // NULL-SAFE join-back on the group keys: groupBy keeps a null group
    // through the heap, and a plain equi-join here would silently drop
    // its rows — the exact-percentile paths report a null-group row, so
    // the sampled path must too
    val joinCond = (groupCols.map(c => col(s"__w_$c") <=> col(c)) :+
      (col("__w_id") === col(idCol))).reduce(_ && _)
    val sample = winners.join(
        df.select((groupCols.map(col) :+ col(idCol) :+ col(valueCol)): _*),
        joinCond)
      .drop("__w_id")
      .drop(groupCols.map(c => s"__w_$c"): _*)
    val probs = array(quantiles.map(q => lit(q._2)): _*)
    sample
      .groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), probs).as("__qs"))
      .select((groupCols.map(col) ++
        quantiles.zipWithIndex.map { case ((name, _), i) =>
          col("__qs").getItem(i).as(name)
        }): _*)
  }

  /** Point-query the sketch for each probe token: the estimate is the MIN
    * counter across the depth rows (classic CM upper bound — never
    * undercounts, overcounts bounded by collisions). Missing cells read 0.
    * Output: (token, est_count), one row per probe.
    *
    * `probes` is a driver-side list by design: a frequency lookup against
    * a served sketch is a small-probe operation (the sketch itself is the
    * big-data product; probing it must not launch a corpus job). */
  def cmsEstimate(
      sketch: DataFrame,
      probes: Seq[String],
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(probes.nonEmpty, "need at least one probe token")
    val spark = sketch.sparkSession
    import spark.implicits._
    val probeCells = probes.toDF("token")
      .select(col("token"), explode(array((0 until depth).map(lit): _*)).as("row"))
      .select(col("token"), col("row"), cmsCell(col("row"), col("token"), width).as("cell"))
    probeCells
      .join(sketch, Seq("row", "cell"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
