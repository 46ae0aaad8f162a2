package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — confidence intervals for corpus-level metrics
  * computed in ONE distributed pass (the published streaming-bootstrap
  * recipe: resampling n rows with replacement is approximated by giving
  * each row an independent Poisson(1) multiplicity per replica, which
  * needs no global coordination and no second pass).
  *
  * Determinism: the per-(row, replica) weight is the Poisson(1) inverse
  * CDF applied to a 60-bit md5 unit hash — both steps are constants +
  * double compares, so the same CI comes out of every run, partitioning,
  * and engine (the estimates are DuckDB-oracle-checked). The metric is
  * restricted to INTEGER-valued columns so replica sums are exact bigint
  * arithmetic, never an order-dependent FP fold; only the final
  * mean/percentile steps are FP, and those divide/interpolate identical
  * integers on both engines.
  *
  * Scale shape: a `replicas`-way row explode feeding one hash aggregate —
  * map-side combine reduces every partition to `replicas` partial rows
  * before the only shuffle; the percentile runs over `replicas` rows. */
object Bootstrap {

  /** P(Poisson(1) <= k) for k = 0..7; u >= the last entry draws 8 (the
    * tail above 8 has probability ~1e-6 — negligible for CI purposes and,
    * being deterministic, identically truncated on both engines). */
  private[graft] val PoissonCdf: Array[Double] = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999909967049427)

  private val TwoPow60 = 1152921504606846976.0

  /** Deterministic uniform draw in [0, 1) for (row id, replica) — shared
    * with [[RankEval.compareRuns]]'s paired query resampling. */
  private[graft] def unit(id: Column, replica: Column): Column =
    (conv(substring(md5(concat(id.cast("string"), lit(":"), replica.cast("string"))),
      1, 15), 16, 10).cast("long").cast("double") / lit(TwoPow60))

  /** Poisson(1) multiplicity via inverse CDF over a unit draw. */
  private[graft] def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (t, k)) =>
        Some(acc.fold(when(u < t, k))(_.when(u < t, k)))
      }.get.otherwise(lit(PoissonCdf.length))
      .cast("long")

  /** Bootstrap CI for the MEAN of integer `valueCol` over the frame:
    * one row out — (mean, ci_low, ci_high, replicas). `idCol` must be
    * row-unique (it seeds the draws). Null values are excluded (they
    * contribute to neither numerator nor denominator), matching the
    * engine-wide null-metric convention. Replicas whose total weight is
    * zero (probability ~ e^-n) are dropped rather than dividing by zero. */
  def meanCI(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      replicas: Int = 200,
      low: Double = 0.025,
      high: Double = 0.975
  ): DataFrame =
    groupedMeanCI(df, Nil, idCol, valueCol, replicas, low, high)

  /** [[meanCI]] per group — the per-slice error-bar report (mean length by
    * language, quality by source, ...). Each group resamples its OWN rows
    * (the draws key on the row id alone, so a row's replica weight is
    * identical whether the frame is sliced or whole — per-group CIs and
    * the global CI come from one consistent resampling). Output: groupCols
    * + (mean, ci_low, ci_high, replicas). Scale: the only exchange
    * carries |groups| × replicas partial rows after map-side combine. */
  def groupedMeanCI(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      replicas: Int = 200,
      low: Double = 0.025,
      high: Double = 0.975
  ): DataFrame = {
    require(replicas >= 10, "need at least 10 replicas for a CI")
    require(0.0 < low && low < high && high < 1.0, "need 0 < low < high < 1")
    val gs = groupCols.map(col)
    val rows = df.select(gs :+ col(idCol).as("__id") :+ col(valueCol).as("__x"): _*)
      .filter(col("__x").isNotNull)
    val weighted = rows
      .select(gs :+ col("__id") :+ col("__x") :+
        explode(sequence(lit(0), lit(replicas - 1))).as("__b"): _*)
      .select(gs :+ col("__b") :+ col("__x") :+
        poissonWeight(unit(col("__id"), col("__b"))).as("__w"): _*)
    val perReplica = weighted
      .groupBy(gs :+ col("__b"): _*)
      .agg(sum(col("__w") * col("__x").cast("long")).as("__num"),
        sum(col("__w")).as("__den"))
      .filter(col("__den") > 0L)
      .select(gs :+
        (col("__num").cast("double") / col("__den").cast("double")).as("__mean"): _*)
    val ci = perReplica
      .groupBy(gs: _*)
      .agg(percentile(col("__mean"), array(lit(low), lit(high))).as("__ci"),
        count(lit(1)).as("replicas"))
      .select(gs :+ col("__ci").getItem(0).as("ci_low") :+
        col("__ci").getItem(1).as("ci_high") :+ col("replicas"): _*)
    val base = rows
      .groupBy(gs: _*)
      .agg((sum(col("__x").cast("long")).cast("double") / count(lit(1)).cast("double"))
        .as("mean"))
    if (groupCols.isEmpty) base.crossJoin(ci)
    else base.join(ci, groupCols)
  }
}
