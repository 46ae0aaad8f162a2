package graft.criteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Stats

/** NaN-preserving clip helpers.
  *
  * pandas `Series.clip` leaves NaN untouched; Spark's `least`/`greatest`
  * treat NaN as the largest double, which would silently turn NaN into the
  * upper bound. A `when` chain preserves NaN (every comparison with NaN is
  * false, so NaN falls through to `otherwise(x)`).
  */
object Clip {
  def clip(x: Column, lo: Column, hi: Column): Column =
    when(x < lo, lo).when(x > hi, hi).otherwise(x)
  def clip(x: Column, lo: Double, hi: Double): Column =
    clip(x, lit(lo), lit(hi))
  def clipLower(x: Column, lo: Double): Column =
    when(x < lit(lo), lit(lo)).otherwise(x)
}

/** A scoring criterion: one input column -> one weighted 0-100-ish score.
  *
  * Semantics of each subclass follow the reference operators S1-S6
  * (`/root/reference/bid_evaluation/criteria.py`). The key cross-cutting
  * contract: `expr` returns `score * weight` — per-criterion detail columns
  * hold *weighted* scores (`criteria.py:53,56,74,90,102,151,169`).
  *
  * Unlike the reference (one eager 2-pass per criterion), these compile to
  * Catalyst `Column` trees parameterized by pre-aggregated [[Stats]]
  * literals, so the whole evaluation is a single codegen'd projection.
  */
sealed trait Criterion {
  def name: String
  def weight: Double

  /** Weighted score expression over the (double-cast) value column, given
    * cohort statistics. Arithmetic mirrors the reference op-for-op so that
    * results are bit-identical to an IEEE-754 sequential evaluation. */
  def expr(value: Column, stats: Stats): Column

  /** Reference Python class name, used by `summary()` for parity
    * (`/root/reference/bid_evaluation/evaluator.py:338`). */
  def typeName: String
}

/** S1 — min-max normalization to 0-100
  * (`/root/reference/bid_evaluation/criteria.py:43-56`, `normalize` 36-40).
  * `higherIsBetter = false` normalizes the negated column (identical to the
  * reference's `normalize(-values)`); the degenerate all-equal cohort
  * scores 100 everywhere. */
final case class LinearCriterion(
    name: String,
    weight: Double,
    higherIsBetter: Boolean = true
) extends Criterion {
  def typeName = "LinearCriterion"
  def expr(value: Column, stats: Stats): Column = {
    // All-null cohort: stats come back NaN, and Spark (unlike Python)
    // treats lit(NaN) === lit(NaN) as TRUE — the degenerate all-100 branch
    // would fire. pandas computes NaN scores there; pin that explicitly.
    if (stats.min.isNaN || stats.max.isNaN)
      return lit(Double.NaN) * lit(weight)
    val base =
      if (higherIsBetter) {
        when(lit(stats.max) === lit(stats.min), lit(100.0))
          .otherwise(
            (value - lit(stats.min)) / (lit(stats.max) - lit(stats.min)) *
              lit(100.0))
      } else {
        // normalize(-values): min(-v) = -max, max(-v) = -min
        val negMin = -stats.max
        val negMax = -stats.min
        when(lit(negMax) === lit(negMin), lit(100.0))
          .otherwise(
            (-value - lit(negMin)) / (lit(negMax) - lit(negMin)) * lit(100.0))
      }
    base * lit(weight)
  }
}

/** S2 — banded scoring (`/root/reference/bid_evaluation/criteria.py:59-74`).
  * Each band is `(lowerInclusive, upperExclusive, score)`; unmatched rows
  * score 0; on overlap the *later* band wins (the reference assigns masks
  * sequentially), which the fold below reproduces by letting each band wrap
  * the previous chain as its `otherwise`. */
final case class ThresholdCriterion(
    name: String,
    weight: Double,
    thresholds: Seq[(Double, Double, Double)]
) extends Criterion {
  def typeName = "ThresholdCriterion"
  def expr(value: Column, stats: Stats): Column = {
    val banded = thresholds.foldLeft(lit(0.0)) {
      case (prev, (lo, hi, score)) =>
        when(value >= lit(lo) && value < lit(hi), lit(score)).otherwise(prev)
    }
    banded * lit(weight)
  }
}

/** S3 — pass-through with scale conversion, no clipping
  * (`/root/reference/bid_evaluation/criteria.py:77-90`). When the scales are
  * equal the value passes through unmultiplied (bit-exact parity with the
  * reference's `if input_scale != output_scale` guard). */
final case class DirectScoreCriterion(
    name: String,
    weight: Double,
    inputScale: Double = 100.0,
    outputScale: Double = 100.0
) extends Criterion {
  def typeName = "DirectScoreCriterion"
  def expr(value: Column, stats: Stats): Column = {
    val scaled =
      if (inputScale != outputScale) value * lit(outputScale / inputScale)
      else value
    scaled * lit(weight)
  }
}

/** S4 — `min(values) / value * 100`
  * (`/root/reference/bid_evaluation/criteria.py:93-102`). The lowest value
  * scores 100. `value == 0` yields IEEE Inf/NaN like numpy (Spark's Divide
  * would return null there), pinned with an explicit `when` guard. */
final case class MinimumRatioCriterion(
    name: String,
    weight: Double
) extends Criterion {
  def typeName = "MinimumRatioCriterion"
  def expr(value: Column, stats: Stats): Column = {
    val ratio =
      when(value === lit(0.0), lit(stats.min / 0.0))
        .otherwise(lit(stats.min) / value)
    ratio * lit(100.0) * lit(weight)
  }
}

/** S5 — math-expression criterion
  * (`/root/reference/bid_evaluation/criteria.py:105-151`). The formula
  * string is compiled once to a `Column` tree (see
  * [[graft.formula.FormulaCompiler]]) — names `value/min/max/mean/median/
  * std` plus user variables, functions `abs,min,max,sqrt,log,log10,exp,
  * clip`. Per-row evaluation errors (e.g. division by zero) become 0.0 and
  * the result is clipped to [0,100] before weighting, exactly like the
  * reference (`criteria.py:146-151`). */
final case class FormulaCriterion(
    name: String,
    weight: Double,
    formula: String = "value",
    variables: Map[String, Double] = Map.empty
) extends Criterion {
  def typeName = "FormulaCriterion"
  def expr(value: Column, stats: Stats): Column = {
    // A formula that cannot evaluate for EVERY row in the reference (bad
    // syntax, unknown name, Python-number division by a constant zero)
    // scores 0.0 everywhere; the compiler signals those by throwing.
    // Runtime arithmetic follows numpy scalar semantics (x/0 -> +-inf,
    // clipped below; NaN propagates), and a null input value yields a null
    // score, the Spark analogue of pandas' NaN propagation.
    val raw =
      try graft.formula.FormulaCompiler.compile(formula, value, stats, variables)
      catch { case _: IllegalArgumentException => lit(0.0) }
    Clip.clip(raw, 0.0, 100.0) * lit(weight)
  }
}

/** S6 — arbitrary scoring function `(values, stats) => scores`
  * (`/root/reference/bid_evaluation/criteria.py:154-169`). The idiomatic
  * Spark analogue takes a `Column` and returns a `Column`, so user logic
  * stays inside whole-stage codegen instead of dropping to a UDF. */
final case class CustomCriterion(
    name: String,
    weight: Double,
    fn: (Column, Stats) => Column
) extends Criterion {
  def typeName = "CustomCriterion"
  def expr(value: Column, stats: Stats): Column =
    fn(value, stats) * lit(weight)
}

/** The four built-in custom scoring shortcuts selectable by name via
  * `.custom(col, w, "proximity_to_mean")`
  * (`/root/reference/bid_evaluation/evaluator.py:239-251`). */
object BuiltinCustom {
  import Clip._

  val functions: Map[String, (Column, Stats) => Column] = Map(
    "proximity_to_mean" -> { (v, s) =>
      clipLower(
        lit(100.0) - abs((v - lit(s.mean)) / lit(s.mean)) * lit(100.0), 0.0)
    },
    "proximity_to_median" -> { (v, s) =>
      clipLower(
        lit(100.0) - abs((v - lit(s.median)) / lit(s.median)) * lit(100.0), 0.0)
    },
    "log_scale" -> { (v, s) =>
      log(v + lit(1.0)) / lit(math.log(s.max + 1.0)) * lit(100.0)
    },
    "inverse_squared" -> { (v, s) =>
      pow(lit(s.min) / v, lit(2.0)) * lit(100.0)
    }
  )

  def apply(funcName: String): (Column, Stats) => Column =
    functions.getOrElse(
      funcName,
      throw new IllegalArgumentException(
        s"Unknown built-in function: $funcName. " +
          s"Available: ${functions.keys.toList.sorted.mkString("[", ", ", "]")}"))
}
