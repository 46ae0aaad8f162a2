package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/split operators for training-data pipelines.
  *
  * Assignment is a pure function of a stable row id — the first 8 hex
  * chars of `md5(id || salt)` mapped into [0, 1) — NOT Spark's `sample()`:
  * the split is reproducible across runs, cluster sizes, and
  * repartitioning; adding rows never reassigns existing ones; changing the
  * salt re-rolls every assignment; and any engine can re-derive the exact
  * split (the SQL oracle recomputes it in DuckDB). This is the standard
  * production shape for corpus train/val/test carving at 100 TB, where
  * `sample()`'s per-partition RNG state would silently reshuffle whenever
  * the file layout changes.
  */
object Sampling {

  /** Uniform [0, 1) from a stable key: md5 prefix as a 32-bit integer
    * scaled by 2^-32. Codegen'd column arithmetic, no UDF. */
  def unitHash(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Adds a `split` column assigning each row to the first name whose
    * cumulative fraction exceeds the row's unit hash. Fractions summing
    * to less than 1 leave the remainder unassigned (null split) — useful
    * for carving a subsample out of a larger corpus. Prefer dyadic
    * fractions (0.75/0.125/...) if an external system must reproduce the
    * cuts bit-exactly: their cumulative sums are exact in binary. */
  def withSplit(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      salt: String = ""
  ): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    require(fractions.forall(_._2 >= 0.0), "fractions must be non-negative")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val u = unitHash(col(idCol), salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    val chain = fractions.zip(cuts).foldLeft(Option.empty[Column]) {
      case (None, ((name, _), cut))    => Some(when(u < lit(cut), lit(name)))
      case (Some(w), ((name, _), cut)) => Some(w.when(u < lit(cut), lit(name)))
    }.get.otherwise(lit(null).cast("string"))
    df.withColumn("split", chain)
  }

  /** Per-stratum deterministic sampling: keep each row with its stratum's
    * fraction (rows in unlisted strata use `default`). The distributed
    * `df.sampleBy`, minus the nondeterminism. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0,
      salt: String = ""
  ): DataFrame = {
    val u = unitHash(col(idCol), salt)
    val frac = fractions.foldLeft(lit(default): Column) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(u < frac)
  }

  /** Temperature-based source mixing: sample an epoch so that source `s`
    * with `n_s` rows contributes in proportion to `n_s^alpha` (alpha < 1
    * upweights small sources — the multilingual-LM mixing rule). Each
    * row is kept iff `unitHash(id) < a_s` where
    * `a_s = min(1, target * p_s / n_s)`, `p_s = n_s^alpha / sum_t n_t^alpha`
    * — deterministic, reproducible, engine-independent (same contract as
    * [[withSplit]]).
    *
    * Scale shape: one tiny groupBy(source) agg (|sources| rows) collected
    * to the driver, folded in sorted-source order so the normalizing sum
    * is bit-reproducible by any engine, then broadcast back as a literal
    * CASE chain — the 100-TB side is one codegen'd filter, no shuffle.
    * Acceptance thresholds are bit-reproducible when every step is
    * mirrored in order: sqrt/+/x/÷/min are IEEE-deterministic, so an
    * oracle that folds the SAME sorted list and applies the SAME
    * expression tree lands on the identical threshold (alpha = 0.5 uses
    * IEEE-exact sqrt; other alphas inherit pow's platform rounding — keep
    * alpha in {0.5, 1.0, 2.0} if an external engine must re-derive cuts).
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      targetRows: Long,
      salt: String = ""
  ): DataFrame = {
    require(alpha > 0.0, "alpha must be positive")
    require(targetRows > 0, "targetRows must be positive")
    // null source is a legitimate group: wrap in Option so the sorted
    // fold is total (None sorts first — document order is part of the
    // contract) instead of NPE-ing in Ordering[String]
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
      .sortBy(_._1)
    // alpha = 0.5 goes through sqrt, not pow: sqrt is IEEE correctly
    // rounded (the scaladoc's bit-reproducibility contract), while pow is
    // only 1-ulp accurate and may disagree with an oracle's sqrt
    val powed = counts.map { case (s, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      (s, n, w)
    }
    // fold left in sorted-source order: the oracle mirrors this exact
    // summation order (list_reduce over a sorted list)
    val z = powed.foldLeft(0.0)(_ + _._3)
    val accept = powed.map { case (s, n, w) =>
      // op order is part of the contract (see scaladoc): target * (w/z) / n
      (s, math.min(1.0, targetRows.toDouble * (w / z) / n.toDouble))
    }
    val u = unitHash(col(idCol), salt)
    // null-safe equality: a null source group must match its own rows
    // (plain === never matches null and would silently drop the group)
    val aCol = accept.foldLeft(lit(0.0): Column) {
      case (acc, (s, a)) =>
        when(col(sourceCol) <=> lit(s.orNull).cast("string"), lit(a)).otherwise(acc)
    }
    df.filter(u < aCol)
  }
}
