package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy governance over training corpora: k-anonymity measurement and
  * enforcement on quasi-identifier combinations (Sweeney's model — a row
  * is re-identifiable when its quasi-identifier tuple is shared by fewer
  * than k rows). [[graft.ops.TextCleaning]] redacts DIRECT identifiers
  * (emails, phones, IPs) inside free text; this module handles the
  * STRUCTURED side: the (zip, age-band, segment)-style column
  * combinations that single people out even with direct identifiers
  * gone. The audit is what a release review reads; the suppression gate
  * is what the pipeline enforces.
  */
object Privacy {

  /** Equivalence classes over the `quasiCols` tuple: one row per
    * distinct combination with its occupancy `class_n`. Null is a
    * value (SQL GROUP BY semantics — an all-null tuple is a class like
    * any other; nulls usually mean "suppressed already" and a large
    * null class is the safe outcome). ONE hash aggregate with map-side
    * partial combine; class count ≤ row count, usually orders of
    * magnitude smaller. */
  def kAnonymityClasses(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityClasses needs quasi-identifier columns")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("class_n"))
  }

  /** One-row k-anonymity verdict for the frame under `quasiCols`:
    * total rows / classes, the achieved anonymity (`k_actual` = the
    * smallest class size — the frame IS k_actual-anonymous), how many
    * classes and rows sit below the requested `k`, the at-risk row
    * fraction, and `n_singletons` (classes of exactly one row — the
    * directly re-identifiable core). Aggregates over the CLASS frame,
    * so the second pass costs |classes| rows. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    kAnonymityClasses(df, quasiCols).agg(
      sum(col("class_n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("class_n")).as("k_actual"),
      sum(when(col("class_n") < k, lit(1L)).otherwise(lit(0L))).as("n_classes_below_k"),
      coalesce(sum(when(col("class_n") < k, col("class_n"))), lit(0L))
        .as("n_rows_at_risk"),
      sum(when(col("class_n") === 1L, lit(1L)).otherwise(lit(0L))).as("n_singletons")
    ).withColumn("at_risk_frac_r",
      round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6) + lit(0.0))
  }

  /** Equivalence classes with their SENSITIVE-value diversity: one row
    * per distinct `quasiCols` tuple with its occupancy and the count of
    * distinct `sensitiveCol` values inside it (nulls in the sensitive
    * column don't count as a value — a suppressed secret protects
    * nobody). k-anonymity without this is hollow: a 50-person class
    * that all share one diagnosis re-identifies the ATTRIBUTE even
    * though no row is singled out (Machanavajjhala et al.'s
    * l-diversity). One exact distinct aggregation at class grain. */
  def lDiversityClasses(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityClasses needs quasi-identifier columns")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be one of the quasi-identifiers")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
  }

  /** One-row l-diversity verdict under `quasiCols` for `sensitiveCol`:
    * the achieved diversity (`l_actual` = the least-diverse class —
    * the frame IS l_actual-diverse), classes and rows below the
    * requested `l`, and the homogeneous core (`n_homogeneous` =
    * classes with exactly one sensitive value — attribute disclosure
    * by membership alone). The [[kAnonymityAudit]] shape at the same
    * |classes|-row second-pass cost. */
  def lDiversityAudit(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(l >= 1, "l must be >= 1")
    lDiversityClasses(df, quasiCols, sensitiveCol).agg(
      sum(col("class_n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("n_sensitive")).as("l_actual"),
      sum(when(col("n_sensitive") < l, lit(1L)).otherwise(lit(0L)))
        .as("n_classes_below_l"),
      coalesce(sum(when(col("n_sensitive") < l, col("class_n"))), lit(0L))
        .as("n_rows_at_risk"),
      sum(when(col("n_sensitive") === 1L, lit(1L)).otherwise(lit(0L)))
        .as("n_homogeneous")
    ).withColumn("at_risk_frac_r",
      round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6) + lit(0.0))
  }

  /** Suppression gate: keep only rows whose quasi-identifier class has
    * at least `k` members — the output frame is k-anonymous on
    * `quasiCols` by construction. Implemented as an inner join against
    * the ≥k class keys (null-safe on the quasi tuple, mirroring the
    * class grouping). The join is key-grain on both sides: |classes|
    * rows build-side, one shuffle of the data by the quasi tuple —
    * the exact shape of the exact-dedup family, skew-safe under AQE. */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    if (k == 1) return df // every nonempty class has >= 1 member
    val keep = kAnonymityClasses(df, quasiCols)
      .filter(col("class_n") >= k)
      .select(quasiCols.map(c => col(c).as(s"__qi_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    df.join(keep, cond, "inner").drop(quasiCols.map(c => s"__qi_$c"): _*)
  }
}
