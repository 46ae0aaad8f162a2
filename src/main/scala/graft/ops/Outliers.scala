package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the standard gate for dropping
  * anomalous documents (absurd lengths, degenerate quality metrics) before
  * training. The reference normalizes scores against group min/max
  * (`bid_evaluation/criteria.py`); this extends the same
  * group-statistics idea to standard-deviation units.
  *
  * The moments are computed as raw sums (`Σx`, `Σx²`, `n`) rather than
  * Spark's streaming `stddev` aggregate: for integral inputs the sums are
  * EXACT (order-independent), so the derived mean/variance/z-score are
  * bit-reproducible across runs, partitionings, and engines — Welford-style
  * incremental variance is arrival-order-dependent and cannot be
  * hash-verified against another engine. For fractional inputs the sums
  * are still far more stable than per-row incremental updates.
  *
  * Scale shape: one groupBy over the data (map-side partial sums), the
  * |groups|-row stats frame broadcast back — no window, no second shuffle
  * of the data.
  */
object Outliers {

  /** Adds `zCol` = (x − mean) / stddev_pop within each `groupCols` group.
    * Degenerate groups (variance 0, e.g. a single row), null values, and
    * NaN values get a null z-score (the engine-wide NaN ≡ null contract —
    * NaN rows are also excluded from the moments, so one bad row cannot
    * poison its whole group's statistics). Population variance is
    * `Σx²/n − mean²`.
    */
  def withGroupZscore(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      zCol: String = "zscore"
  ): DataFrame = {
    require(groupCols.nonEmpty, "withGroupZscore needs group keys")
    val raw = col(valueCol)
    // NaN ≡ null: a NaN input must neither receive a z-score nor
    // contaminate the group sums (sum(NaN) would NaN the whole group)
    val v = when(!isnan(raw.cast("double")), raw)
    // widen BEFORE squaring: an int column's per-row v*v product wraps Int
    // at |v| >= 46341 (realistic web-document char/token counts) with ANSI
    // off, silently corrupting the group variance. Decimal(38,0) keeps the
    // integral moments exact (a long^2 is < 1e38) with no overflow short of
    // a 1e38 sum of squares; fractional inputs stay double (their sums were
    // never exact to begin with).
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    val vw = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => v.cast(DecimalType(38, 0))
      case _ => v.cast("double")
    }
    val stats = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(v).as("__n"),
        sum(vw).as("__sx"),
        sum(vw * vw).as("__sxx"))
    val mean = col("__sx").cast("double") / col("__n")
    val variance = col("__sxx").cast("double") / col("__n") - mean * mean
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(zCol,
        when(variance > 0, (v.cast("double") - mean) / sqrt(variance)))
      .drop("__n", "__sx", "__sxx")
  }

  /** Keeps only rows within `maxAbsZ` standard deviations of their group
    * mean; rows with no z-score (null value, degenerate group) survive —
    * a zero-variance group has no evidence of anomaly.
    */
  def dropOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      maxAbsZ: Double = 3.0
  ): DataFrame = {
    val z = "__graft_z"
    withGroupZscore(df, groupCols, valueCol, z)
      .filter(col(z).isNull || abs(col(z)) <= maxAbsZ)
      .drop(z)
  }

  /** Per-group winsorization: adds `outCol` = `valueCol` clipped into the
    * group's exact [`lower`, `upper`] percentile band — the
    * keep-but-tame alternative to [[dropOutliers]] for heavy-tailed
    * features (char/token counts, scores) where dropping the tail would
    * bias the corpus. Percentiles are Spark's EXACT linear-interpolation
    * `percentile` (== DuckDB `quantile_cont`, the q93-verified pair), so
    * the clip bounds are engine-reproducible. Null and NaN values get a
    * null `outCol` (the engine-wide contract) and are excluded from the
    * percentile computation.
    *
    * Scale shape: one groupBy (exact percentile needs the group's sorted
    * values — the documented cost of exactness, same trade as q93), the
    * |groups|-row bounds frame broadcast back; no window, the data
    * shuffles once. The exact aggregate buffers a GROUP's values in one
    * aggregation buffer — a hazard when one group dominates the corpus
    * (one language = 80% of 100 TB). Session conf
    * `graft.stats.approx=true` (the same switch [[graft.StatsAgg]]
    * honors) swaps in `approx_percentile`'s bounded sketch; the clip
    * bounds are then approximate and no longer oracle-exact, which is
    * the right trade at scale. */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lower: Double = 0.05,
      upper: Double = 0.95,
      outCol: String = "winsorized"
  ): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs group keys")
    require(0.0 <= lower && lower < upper && upper <= 1.0,
      "need 0 <= lower < upper <= 1")
    val raw = col(valueCol)
    val v = when(!isnan(raw.cast("double")), raw) // NaN ≡ null, as in z-score
    val approx = df.sparkSession.conf.get("graft.stats.approx", "false").toBoolean
    def pct(p: Double): Column =
      if (approx) percentile_approx(v, lit(p), lit(10000)).cast("double")
      else percentile(v, lit(p))
    val bounds = df
      .groupBy(groupCols.map(col): _*)
      .agg(pct(lower).as("__lo"), pct(upper).as("__hi"))
    df.join(broadcast(bounds), groupCols, "left")
      .withColumn(outCol,
        when(v.isNotNull,
          least(greatest(v.cast("double"), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Robust (median/MAD) z-scores per group — the outlier detector that
    * survives its own outliers: [[withGroupZscore]]'s mean/σ are
    * dragged by the very tail rows being hunted (one 10⁹-char document
    * inflates σ until nothing else flags), while the median and the
    * median-absolute-deviation have a 50% breakdown point. `robust_z =
    * 0.6744897501960817 · (x − median) ⁄ MAD` (the Φ⁻¹(0.75)
    * consistency constant, so thresholds carry over from the normal
    * z-scale; |z| > 3.5 is the classic Iglewicz–Hoaglin cut).
    *
    * Determinism: medians are EXACT percentiles (Spark `percentile` ≡
    * DuckDB `quantile_cont` at the same interpolation, the q93
    * contract) under `graft.stats.approx=false`, and the z arithmetic
    * is the same IEEE sequence both engines write. A zero MAD (over
    * half the group identical) leaves `robust_z_r` null — undefined,
    * the σ = 0 convention. NaN ≡ null as everywhere.
    *
    * Scale shape: two percentile aggregates (median, then MAD over the
    * deviations) + two broadcast joins back — the exact path sorts
    * each group once per aggregate; flip `graft.stats.approx=true` for
    * the sketched 100 TB variant (the [[winsorize]] switch). */
  def withGroupRobustZscore(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      zCol: String = "robust_z_r"
  ): DataFrame = {
    require(groupCols.nonEmpty, "withGroupRobustZscore needs group keys")
    val raw = col(valueCol)
    val v = when(!isnan(raw.cast("double")), raw.cast("double"))
    val approx = df.sparkSession.conf.get("graft.stats.approx", "false").toBoolean
    def med(c: Column): Column =
      if (approx) percentile_approx(c, lit(0.5), lit(10000)).cast("double")
      else percentile(c, lit(0.5))
    val medians = df.groupBy(groupCols.map(col): _*).agg(med(v).as("__med"))
    val withMed = df.join(broadcast(medians), groupCols, "left")
    val mads = withMed
      .groupBy(groupCols.map(col): _*)
      .agg(med(abs(v - col("__med"))).as("__mad"))
    withMed.join(broadcast(mads), groupCols, "left")
      .withColumn(zCol,
        when(v.isNotNull && col("__mad") > 0.0,
          round(lit(0.6744897501960817) * (v - col("__med")) / col("__mad"), 6)
            + lit(0.0)))
      .withColumn("__med", round(col("__med"), 6) + lit(0.0))
      .withColumn("__mad", round(col("__mad"), 6) + lit(0.0))
      .withColumnRenamed("__med", "median_r")
      .withColumnRenamed("__mad", "mad_r")
  }

  /** Weighted lower quantile per group: the smallest value whose
    * cumulative weight reaches `p` of the group's total — "half the
    * corpus BYTES live in documents shorter than X" (weight = bytes)
    * where the unweighted median answers a question about document
    * COUNTS nobody asked. The LOWER quantile (no interpolation) keeps
    * the result an actual data value and the cross-engine contract
    * trivial: exact integer cumulative weights, one boundary compare.
    * Ties in the value column are safe by construction — the running
    * weight uses a RANGE frame on the value, so every row of an equal
    * value sees the same cumulative weight. Null/NaN values and
    * non-positive weights are refused loudly through the consumed
    * weight (a zero-weight row cannot move the quantile but a negative
    * one silently corrupts it).
    *
    * Scale shape: one window pass per group partition (running sum +
    * the same-spec total), then a min aggregate per group. Output:
    * (groupCols, w_total, wq<p> value column). */
  def weightedQuantile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      p: Double,
      outCol: String = "wq_value"
  ): DataFrame = {
    require(groupCols.nonEmpty, "weightedQuantile needs group keys")
    require(p > 0.0 && p <= 1.0, "p must be in (0, 1]")
    val w = col(weightCol).cast("long")
    val checkedW = when(w.isNull || w <= 0L, raise_error(concat(
      lit("weightedQuantile: weight "),
      coalesce(w.cast("string"), lit("null")),
      lit(" is not a positive integer for value "), col(valueCol).cast("string"),
      lit(" — quantize fractional weights upstream (the integer-moment contract)")))
      .cast("long"))
      .otherwise(w)
    val base = df
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .select(groupCols.map(col) :+ col(valueCol).as("__v") :+ checkedW.as("__w"): _*)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
    val cum = sum(col("__w")).over(
      wOrd.rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
    val tot = sum(col("__w")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*))
    base
      .withColumn("__cum", cum)
      .withColumn("__tot", tot)
      .filter(col("__cum").cast("double") >= lit(p) * col("__tot").cast("double"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("__tot")).as("w_total"), min(col("__v")).as(outCol))
  }

  /** Cross-source QUANTILE NORMALIZATION: map each group's value
    * distribution onto the POOLED distribution, so per-source scores
    * become comparable before a global threshold or mix. (The
    * quality-score calibration step: a classifier's scores on a forum
    * crawl and on an encyclopedia are not on the same scale; after
    * quantile-mapping, "top 20%" means top 20% within every source.)
    *
    * Per row: its within-group quantile `r = (rank−1)/(n−1)` (exact
    * integer arithmetic; a 1-row group maps to r = 0, ties share a
    * rank), then linear interpolation into the pooled exact-percentile
    * GRID of `grid+1` points — so the map is a broadcast array lookup,
    * never a pairwise join against the pooled set. Grid resolution
    * bounds the error at one pooled inter-percentile gap; raise `grid`
    * for finer tails. Under `graft.stats.approx=true` the grid itself
    * comes from the `approx_percentile` sketch (the [[winsorize]]
    * switch) — the 100 TB path, since the exact grid sorts the pooled
    * column. Null and NaN values pass through with a null `outCol`.
    *
    * Scale shape: one window pass per group partition (rank + count —
    * same spec, one sort), one pooled percentile aggregate broadcast
    * back, map-side interpolation. Adds `outCol` (6-decimal). */
  def quantileNormalize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String = "qnorm_r",
      grid: Int = 1000
  ): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize needs group keys")
    require(grid >= 1, "grid must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val raw = col(valueCol)
    val v = when(!isnan(raw.cast("double")), raw.cast("double"))
    val approx = df.sparkSession.conf.get("graft.stats.approx", "false").toBoolean
    val ps = (0 to grid).map(_.toDouble / grid)
    val gridAgg =
      if (approx) percentile_approx(v, typedlit(ps), lit(10000)).cast("array<double>")
      else percentile(v, typedlit(ps))
    val pooled = df.agg(gridAgg.as("__qgrid"))
    // rank among NON-NULL values only: nulls sort first under asc, so a
    // non-null row's raw rank() includes the group's null rows — subtract
    // the null count (rank counts rows through ties, so the first value
    // after j nulls ranks j+1)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(v.asc_nulls_first)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val nNull = count(when(v.isNull, lit(1))).over(wg)
    val n = count(v).over(wg)
    val r = when(n === 1L, lit(0.0))
      .otherwise((rank().over(w) - nNull - lit(1L)).cast("double")
        / (n - lit(1L)).cast("double"))
    val idx = r * lit(grid.toDouble)
    val lo = floor(idx).cast("int")
    val frac = idx - lo.cast("double")
    val atLo = element_at(col("__qgrid"), lo + 1)
    val atHi = element_at(col("__qgrid"), least(lo + 2, lit(grid + 1)))
    df.crossJoin(broadcast(pooled))
      .withColumn(outCol,
        when(v.isNotNull,
          round(atLo + frac * (atHi - atLo), 6) + lit(0.0)))
      .drop("__qgrid")
  }

  /** EMBEDDING-space outlier detection: per vector, the squared distance
    * to its nearest IVF centroid, z-scored within the assigned cell —
    * the curation gate for broken embeddings and out-of-distribution
    * junk that no text heuristic sees (a corrupt encoder output sits far
    * from every centroid; a cell's genuine members cluster tightly).
    *
    * One literal-centroid argmax yields the cell AND its `2·v⋅c − |c|²`
    * maximum in the same expression, so `dist² = |v|² − max` costs no
    * second centroid pass and NO shuffle; the distance is then quantized
    * to integer MICRO-units (`dist_u = round(dist²·1e6)`, the engine's
    * round-6 granularity) so the per-cell moments are exact integral
    * sums and the z-scores are bit-reproducible across engines — the
    * [[withGroupZscore]] contract (double sums would be
    * arrival-order-dependent). Adds `list_id`, `dist_u`, `zCol` (null
    * for degenerate cells). Scale: map-side assignment + one
    * |cells|-row stats broadcast, nothing else.
    */
  def embeddingOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroidSeq: Seq[(Int, Seq[Double], Double)],
      zCol: String = "zscore"
  ): DataFrame = {
    require(centroidSeq.nonEmpty, "need at least one centroid")
    val vd = col(vecCol).cast("array<double>")
    val cells = array(centroidSeq.map { case (i, c, c2) =>
      struct((lit(2.0) * Similarity.dot(vd, typedlit(c)) - lit(c2)).as("neg"),
        lit(-i).as("nlist"))
    }: _*)
    val best = array_max(cells)
    val assigned = df.select(col(idCol),
      (-best.getField("nlist")).cast("int").as("list_id"),
      round((Similarity.dot(vd, vd) - best.getField("neg")) * lit(1e6))
        .cast("long").as("dist_u"))
    withGroupZscore(assigned, Seq("list_id"), "dist_u", zCol)
  }
}
