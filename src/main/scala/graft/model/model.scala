package graft.model

/** Whole-column (cohort) statistics used to parameterize every scoring
  * criterion.
  *
  * Mirrors the reference statistics kernel
  * (`/root/reference/bid_evaluation/criteria.py:19-29`): pandas `min, max,
  * mean, median, std (ddof=1), quantile(.25), quantile(.75)`. Absent values
  * (empty cohort, single-row std) are represented as `Double.NaN`, matching
  * pandas.
  */
final case class Stats(
    min: Double,
    max: Double,
    mean: Double,
    median: Double,
    std: Double,
    q25: Double,
    q75: Double
) {
  def toMap: Map[String, Double] = Map(
    "min" -> min,
    "max" -> max,
    "mean" -> mean,
    "median" -> median,
    "std" -> std,
    "q25" -> q25,
    "q75" -> q75
  )
}

object Stats {
  val empty: Stats = Stats(
    Double.NaN, Double.NaN, Double.NaN, Double.NaN,
    Double.NaN, Double.NaN, Double.NaN)
}

/** Tie policy for top-N stage filters
  * (`/root/reference/bid_evaluation/staged.py:23,34-37`). */
sealed abstract class TieMode(val key: String)
object TieMode {
  case object Include extends TieMode("include")
  case object Exclude extends TieMode("exclude")
  def fromString(s: String): TieMode = s match {
    case "include" => Include
    case "exclude" => Exclude
    case other =>
      throw new IllegalArgumentException(
        s"on_tie must be 'include' or 'exclude', got: $other")
  }
}

/** Inter-stage filter config, validated like the reference `StageFilter`
  * dataclass (`/root/reference/bid_evaluation/staged.py:16-37`). */
sealed trait StageFilter
object StageFilter {
  final case class ScoreThreshold(threshold: Double) extends StageFilter
  final case class TopN(n: Int, onTie: TieMode = TieMode.Include)
      extends StageFilter

  /** Mirrors `StageFilter.__post_init__` validation: unknown type /
    * missing threshold / missing top_n / bad on_tie each raise. */
  def apply(
      filterType: String,
      threshold: Option[Double],
      topN: Option[Int],
      onTie: String
  ): StageFilter = filterType match {
    case "score_threshold" =>
      TieMode.fromString(onTie) // the reference validates on_tie for EVERY type
      ScoreThreshold(threshold.getOrElse(throw new IllegalArgumentException(
        "threshold is required for score_threshold filter.")))
    case "top_n" =>
      TopN(
        topN.getOrElse(throw new IllegalArgumentException(
          "top_n is required for top_n filter.")),
        TieMode.fromString(onTie))
    case other =>
      throw new IllegalArgumentException(
        s"Unknown filter type: $other. Use 'score_threshold' or 'top_n'.")
  }
}

/** Final-score combination policy for staged evaluation
  * (`/root/reference/bid_evaluation/staged.py:68-79`). */
sealed abstract class FinalScoreMode(val key: String)
object FinalScoreMode {
  case object LastStage extends FinalScoreMode("last_stage")
  case object WeightedCombination extends FinalScoreMode("weighted_combination")
  def fromString(s: String): FinalScoreMode = s match {
    case "last_stage"           => LastStage
    case "weighted_combination" => WeightedCombination
    case other =>
      throw new IllegalArgumentException(
        "final_score_mode must be 'last_stage' or 'weighted_combination', " +
          s"got: $other")
  }
}
