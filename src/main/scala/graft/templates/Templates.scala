package graft.templates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.criteria.Clip._
import graft.model.Stats

/** Parameter metadata for the template registry UI surface
  * (`/root/reference/bid_evaluation/custom_templates.py:170-227`). */
final case class ParamInfo(tpe: String, default: Any, label: String)

final case class TemplateInfo(
    key: String,
    name: String,
    description: String,
    parameters: Seq[(String, ParamInfo)],
    fn: (Column, Stats, Map[String, Any]) => Column
)

/** The six pre-built scoring templates
  * (`/root/reference/bid_evaluation/custom_templates.py`). Each takes the
  * value column, cohort stats, and a parameter map and returns an UNWEIGHTED
  * 0-100 score column — use through `Evaluator.custom` (S6), which applies
  * the weight. All compile to plain Catalyst arithmetic (codegen'd).
  */
object Templates {

  private def dbl(params: Map[String, Any], key: String, default: Double): Double =
    params.get(key) match {
      case Some(v: Number)  => v.doubleValue()
      case Some(b: Boolean) => if (b) 1.0 else 0.0
      case None             => default
      case Some(other) =>
        throw new IllegalArgumentException(s"Parameter $key must be numeric, got $other")
    }
  private def bool(params: Map[String, Any], key: String, default: Boolean): Boolean =
    params.get(key) match {
      case Some(b: Boolean) => b
      case None             => default
      case Some(other) =>
        throw new IllegalArgumentException(s"Parameter $key must be boolean, got $other")
    }

  /** `custom_templates.py:11-25`: ((1 - |v-target|/target) * 100).clip(0,100).
    * target == 0 follows numpy IEEE semantics (x/0 -> inf -> clip 0;
    * 0/0 -> NaN propagates) instead of Spark's null-on-zero-divide. */
  def budgetProximity(v: Column, target: Double): Column =
    if (target == 0.0)
      when(v === lit(0.0), lit(Double.NaN)).otherwise(lit(0.0))
    else
      clip((lit(1.0) - abs(v - lit(target)) / lit(target)) * lit(100.0), 0.0, 100.0)

  /** `custom_templates.py:28-57`: 100 inside [minIdeal,maxIdeal]; linear
    * distance penalty outside, clipped to [0,100]. The above-max branch
    * tests FIRST: the reference assigns the below-mask then overwrites with
    * the above-mask, so above wins if a misconfigured minIdeal > maxIdeal
    * makes them overlap. Zero ideals follow IEEE (x/0 -> inf -> clip 0). */
  def sweetSpotRange(v: Column, minIdeal: Double, maxIdeal: Double): Column = {
    val below =
      if (minIdeal == 0.0) lit(0.0) // (0 - v)/0 with v<0 -> +inf distance -> clip 0
      else clip(lit(100.0) - (lit(minIdeal) - v) / lit(minIdeal) * lit(100.0), 0.0, 100.0)
    val above =
      if (maxIdeal == 0.0) lit(0.0)
      else clip(lit(100.0) - (v - lit(maxIdeal)) / lit(maxIdeal) * lit(100.0), 0.0, 100.0)
    when(v > lit(maxIdeal), above)
      .when(v < lit(minIdeal), below)
      .otherwise(lit(100.0))
  }

  /** `custom_templates.py:60-82`: base - (v-threshold)*perUnit above the
    * threshold, else base; clipped to [0,100]. */
  def penaltyFunction(v: Column, baseScore: Double, threshold: Double,
                      penaltyPerUnit: Double): Column =
    clip(
      when(v > lit(threshold), lit(baseScore) - (v - lit(threshold)) * lit(penaltyPerUnit))
        .otherwise(lit(baseScore)),
      0.0, 100.0)

  /** `custom_templates.py:85-115`: base + cumulative tier bonuses; clipped. */
  def bonusTiers(v: Column, baseScore: Double, tier1Threshold: Double,
                 tier1Bonus: Double, tier2Threshold: Double,
                 tier2Bonus: Double): Column =
    clip(
      lit(baseScore)
        + when(v >= lit(tier1Threshold), lit(tier1Bonus)).otherwise(lit(0.0))
        + when(v >= lit(tier2Threshold), lit(tier2Bonus)).otherwise(lit(0.0)),
      0.0, 100.0)

  /** `custom_templates.py:118-136`: v/max*100 (or min/v*100), clipped.
    * Zero denominators follow numpy IEEE (inf clips to 100, NaN
    * propagates) — Spark's divide would return null instead. */
  def percentageOfBest(v: Column, stats: Stats, higherIsBetter: Boolean): Column =
    if (higherIsBetter) {
      if (stats.max == 0.0)
        clip(v * lit(1.0 / 0.0) * lit(100.0), 0.0, 100.0) // v*inf: IEEE signs/NaN
      else clip(v / lit(stats.max) * lit(100.0), 0.0, 100.0)
    } else {
      val ratio = when(v === lit(0.0), lit(stats.min / 0.0))
        .otherwise(lit(stats.min) / v)
      clip(ratio * lit(100.0), 0.0, 100.0)
    }

  /** `custom_templates.py:139-167`: z-score mapped through (±z+3)/6*100,
    * clipped; all-100 when std == 0. */
  def distanceFromMean(v: Column, stats: Stats, preferAbove: Boolean): Column =
    if (stats.std == 0.0) lit(100.0)
    else {
      val z = (v - lit(stats.mean)) / lit(stats.std)
      val normalized =
        if (preferAbove) (z + lit(3.0)) / lit(6.0)
        else (-z + lit(3.0)) / lit(6.0)
      clip(normalized * lit(100.0), 0.0, 100.0)
    }

  /** Registry (`custom_templates.py:170-227`). */
  val TEMPLATES: Seq[TemplateInfo] = Seq(
    TemplateInfo("budget_proximity", "Budget Proximity",
      "Score based on closeness to target budget",
      Seq("target" -> ParamInfo("float", 100000.0, "Target Value")),
      (v, _, p) => budgetProximity(v, dbl(p, "target", 100000.0))),
    TemplateInfo("sweet_spot_range", "Sweet Spot Range",
      "Highest score within ideal range, drops outside",
      Seq("min_ideal" -> ParamInfo("float", 30.0, "Minimum Ideal"),
        "max_ideal" -> ParamInfo("float", 60.0, "Maximum Ideal")),
      (v, _, p) => sweetSpotRange(v, dbl(p, "min_ideal", 30.0), dbl(p, "max_ideal", 60.0))),
    TemplateInfo("penalty_function", "Penalty Function",
      "Base score minus penalties for exceeding threshold",
      Seq("base_score" -> ParamInfo("float", 100.0, "Base Score"),
        "threshold" -> ParamInfo("float", 50.0, "Penalty Threshold"),
        "penalty_per_unit" -> ParamInfo("float", 2.0, "Penalty Per Unit")),
      (v, _, p) => penaltyFunction(v, dbl(p, "base_score", 100.0),
        dbl(p, "threshold", 50.0), dbl(p, "penalty_per_unit", 2.0))),
    TemplateInfo("bonus_tiers", "Bonus Tiers",
      "Base score plus bonuses for meeting tier thresholds",
      Seq("base_score" -> ParamInfo("float", 50.0, "Base Score"),
        "tier1_threshold" -> ParamInfo("float", 5.0, "Tier 1 Threshold"),
        "tier1_bonus" -> ParamInfo("float", 20.0, "Tier 1 Bonus"),
        "tier2_threshold" -> ParamInfo("float", 10.0, "Tier 2 Threshold"),
        "tier2_bonus" -> ParamInfo("float", 30.0, "Tier 2 Bonus")),
      (v, _, p) => bonusTiers(v, dbl(p, "base_score", 50.0),
        dbl(p, "tier1_threshold", 5.0), dbl(p, "tier1_bonus", 20.0),
        dbl(p, "tier2_threshold", 10.0), dbl(p, "tier2_bonus", 30.0))),
    TemplateInfo("percentage_of_best", "Percentage of Best",
      "Score as percentage relative to the best value",
      Seq("higher_is_better" -> ParamInfo("bool", true, "Higher is Better")),
      (v, s, p) => percentageOfBest(v, s, bool(p, "higher_is_better", true))),
    TemplateInfo("distance_from_mean", "Distance from Mean",
      "Score based on distance from mean",
      Seq("prefer_above" -> ParamInfo("bool", true, "Prefer Above Mean")),
      (v, s, p) => distanceFromMean(v, s, bool(p, "prefer_above", true)))
  )

  private val byKey: Map[String, TemplateInfo] =
    TEMPLATES.map(t => t.key -> t).toMap

  /** `custom_templates.py:230-232` */
  def getTemplateNames: Seq[String] = TEMPLATES.map(_.key)

  /** `custom_templates.py:235-237` */
  def getTemplateInfo(name: String): Option[TemplateInfo] = byKey.get(name)

  /** `custom_templates.py:240-258`: unknown template raises. Returns a
    * `(Column, Stats) => Column` suitable for `Evaluator.custom`. */
  def applyTemplate(
      name: String,
      params: Map[String, Any] = Map.empty
  ): (Column, Stats) => Column = {
    val t = byKey.getOrElse(name,
      throw new IllegalArgumentException(s"Unknown template: $name"))
    (v, s) => t.fn(v, s, params)
  }
}
