package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a frame — the ingestion
  * gate that runs before any 100 TB pipeline stage: schema-level checks
  * (null rates, domains, ranges) evaluated in ONE pass and reported as a
  * small tidy frame a driver can assert on or publish.
  */
object Expectations {

  /** Evaluates each named boolean expectation and returns one row per
    * check: `check_name`, `n_rows`, `n_violations`, `violation_rate`.
    * A row violates a check when the predicate is not TRUE — a null
    * predicate result (e.g. a comparison against a null column) counts
    * as a violation, matching SQL constraint semantics would-be-unknowns
    * conservatively.
    *
    * Scale shape: a single aggregate over the data computes every check
    * simultaneously (map-side partial combine; one scan, no per-check
    * passes); the long-format explode happens on the one-row result.
    */
  def report(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation required")
    require(checks.map(_._1).distinct.size == checks.size, "check names must be unique")
    // internal columns are INDEX-named: a check name containing '.' or
    // '`' must not break col() resolution (dots would parse as a field path)
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("name"), col(s"__v_$i").as("v"))
    }: _*)
    one
      .select(col("__n"), explode(pairs).as("__c"))
      .select(
        col("__c.name").as("check_name"),
        col("__n").as("n_rows"),
        col("__c.v").as("n_violations"),
        (col("__c.v").cast("double") / col("__n")).as("violation_rate"))
  }

  /** SCHEMA drift between two snapshots: one row per column that was
    * `added`, `removed`, or `type_changed` (by Catalyst SQL type
    * string) — the first alarm when an upstream producer changes its
    * writer. Pure metadata (no data scan; column order is ignored),
    * materialized as a tidy frame so it reports/persists uniformly with
    * [[report]] and [[graft.ops.Snapshot.snapshotDiff]]. */
  def schemaDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val spark = prev.sparkSession
    import spark.implicits._
    val p = prev.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val c = cur.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      (c.keySet -- p.keySet).toSeq.sorted
        .map(n => (n, "added", Option.empty[String], Option(c(n)))) ++
        (p.keySet -- c.keySet).toSeq.sorted
          .map(n => (n, "removed", Option(p(n)), Option.empty[String])) ++
        (p.keySet & c.keySet).filter(n => p(n) != c(n)).toSeq.sorted
          .map(n => (n, "type_changed", Option(p(n)), Option(c(n))))
    rows.toDF("column", "change", "prev_type", "cur_type")
  }

  /** Benford's-law audit of a positive amount column — the classic
    * fabricated-numbers detector (organic magnitudes spread across
    * orders of magnitude follow `P(d) = log₁₀(1 + 1/d)`; invented or
    * template-generated figures don't). One row per leading digit
    * 1–9: observed count, observed fraction, the Benford expectation,
    * and the signed deviation.
    *
    * The leading digit is extracted EXACTLY: the value quantizes to
    * integer cents (`round(x·100)` — the engine's micro-unit
    * convention, so 0.01 ≤ x is auditable), and the first character
    * of the BIGINT's decimal string is the digit — no `log10`
    * boundary wobble at powers of ten, identical in any engine.
    * Null, NaN, and sub-cent values are excluded (reported via the
    * count). ONE scan with map-side combine, a 9-row result. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val cents = round(v * lit(100.0), 0).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df
      .filter(v.isNotNull && !isnan(v) && cents >= 1L)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__tot"))
    val expected = (1 to 9).map(d => (d, math.log10(1.0 + 1.0 / d)))
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expected.toDF("digit", "__p")
    exp.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        (round(coalesce(col("n"), lit(0L)).cast("double") / col("__tot"), 6)
          + lit(0.0)).as("obs_frac_r"),
        (round(col("__p"), 6) + lit(0.0)).as("benford_p_r"),
        (round(coalesce(col("n"), lit(0L)).cast("double") / col("__tot")
          - col("__p"), 6) + lit(0.0)).as("dev_r"))
  }
}
