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
}
