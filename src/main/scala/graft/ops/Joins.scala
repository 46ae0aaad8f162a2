package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference (and stock Spark) lack, shaped
  * for scale from the start.
  *
  * The backward as-of join is THE staple of event/feature alignment
  * ("for each observation, the latest reading at or before it"). The
  * naive formulation — a range join `l.key = r.key AND r.t <= l.t` plus
  * an argmax — explodes to |matches| intermediate rows per left row and
  * dies on dense keys. This implementation uses the union + running-
  * last-value pattern instead: tag both sides, sort within key by
  * (time, side, tiebreak), and carry the most recent right payload
  * forward with an unbounded-preceding `last_value(ignoreNulls)` window.
  * Cost: ONE shuffle of |L|+|R| rows on the key, no pairwise blowup —
  * the plan survives 100 TB with skew handled by the usual salting of
  * hot keys upstream.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `rightTimeCol` <= `leftTimeCol` within the same
    * `keyCol` (ties on time broken toward the larger `rightTieCol`, which
    * also makes the result deterministic when right times repeat).
    * Unmatched left rows keep null right columns (left-outer semantics).
    *
    * @param payloadCols right columns to carry (emitted as `asof_<name>`)
    * @param tolerance   optional max allowed `leftTime - rightTime`; a
    *                    match older than this is dropped (nulls emitted)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    val carry = (rightTimeCol +: payloadCols).distinct
    // right rows: key, time, payload struct; __side=0 sorts BEFORE left
    // rows at equal times, making the join inclusive (at-or-before).
    // Null-KEY right rows can never match under SQL equality semantics
    // (the oracle's `l.key = r.key` never holds for null), and null-TIME
    // right rows can never satisfy `r.t <= l.t` — yet they would sort
    // first (asc nulls-first) and be picked up by last(ignoreNulls).
    // Drop both.
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull)
      .select(
      col(keyCol).as("__key"),
      col(rightTimeCol).cast("long").as("__t"),
      col(rightTieCol).cast("long").as("__tie"),
      struct(carry.map(col): _*).as("__payload"),
      lit(0).as("__side"))
    // left rows carry their full row as a struct so arbitrary schemas
    // survive the union without column-name gymnastics
    val l = left.select(
      col(keyCol).as("__key"),
      col(leftTimeCol).cast("long").as("__t"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__lrow"))

    val unioned = r.withColumn("__lrow",
        lit(null).cast(l.schema("__lrow").dataType))
      .unionByName(l)

    val w = Window.partitionBy("__key").orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = tolerance match {
      case Some(tol) =>
        when(col("__t") - col("__match").getField(rightTimeCol).cast("long") <= lit(tol),
          col("__match"))
      case None => col("__match")
    }
    val leftCols = left.columns.map(n => col("__lrow").getField(n).as(n))
    val rightCols = carry.map(n => withinTol.getField(n).as(s"asof_$n"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Forward as-of join: for every left row, the right row with the
    * SMALLEST `rightTimeCol` at-or-after `leftTimeCol` within the key —
    * [[asofJoinBackward]] on negated times. `tolerance` bounds
    * `rightTime - leftTime`; ties on time still break toward the larger
    * `rightTieCol`. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame =
    asofJoinBackward(
      left.withColumn("__fwd_t", -col(leftTimeCol).cast("long")),
      right.withColumn("__fwd_t", -col(rightTimeCol).cast("long")),
      keyCol, "__fwd_t", "__fwd_t", rightTieCol,
      payloadCols = (rightTimeCol +: payloadCols).distinct,
      tolerance = tolerance)
      .drop("__fwd_t", "asof___fwd_t")

  /** Range (interval) join: every left row paired with every interval row
    * whose `[loCol, hiCol)` contains `valueCol`. Intervals may overlap.
    *
    * The naive plan — a join on `lo <= v AND v < hi` — is a broadcast
    * nested loop (or worse, a cartesian) that dies when neither side is
    * tiny. Here both sides are quantized to a `bucketWidth` grid: each
    * interval explodes into the buckets it covers, the left side hashes to
    * its single bucket, and an ordinary shuffled equi-join on the bucket id
    * does the pairing, with the exact containment filter applied after.
    * Intermediate size is |left| + Σ ceil(span/bucketWidth), so pick
    * `bucketWidth` near the typical interval span: one grid cell per
    * interval and one equi-join probe per left row.
    *
    * Column names of `left` and `intervals` must be disjoint (standard
    * Spark join hygiene; alias beforehand if needed). */
  def rangeJoin(
      left: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Long = 1L << 20
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val loB = floor(col(loCol).cast("double") / w).cast("long")
    val hiB = floor(col(hiCol).cast("double") / w).cast("long")
    // fail FAST and legibly on a stray outlier interval (an open-ended
    // sentinel like hi=1e18 would otherwise ask sequence() for a
    // trillion-element array and abort the job with an opaque error)
    val guardMsg = concat(
      lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval buckets "),
      lit("(lo="), col(loCol).cast("string"), lit(", hi="), col(hiCol).cast("string"),
      lit(s", bucketWidth=$bucketWidth); raise bucketWidth or maxBucketsPerInterval"))
    val hiGuarded = when(hiB - loB > lit(maxBucketsPerInterval),
      raise_error(guardMsg).cast("long")).otherwise(hiB)
    val iv = intervals.withColumn("__bucket", explode(sequence(loB, hiGuarded)))
    val l = left.withColumn("__bucket",
      floor(col(valueCol).cast("double") / w).cast("long"))
    l.join(iv, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Blocked fuzzy (edit-distance) join — the record-linkage staple: all
    * cross-side pairs inside the caller's exact blocking keys whose texts
    * are within Levenshtein distance `maxDist`. Completeness is BY
    * CONTRACT within blocks (pairs split across block keys are never
    * candidates — pick keys the true matches share: language, nation,
    * zip prefix, length-stable attributes).
    *
    * Scale shape: an ordinary shuffled equi-join on the block keys — no
    * cartesian. Two pre-filters keep the verify step off most candidate
    * pairs: a length-difference prune (`|len(a)-len(b)| <= maxDist` is a
    * necessary condition) and the banded threshold Levenshtein
    * (`levenshtein(a, b, maxDist)` is O(len·maxDist) and bails early),
    * so cost per candidate is bounded. A hot block — the degenerate
    * blocking key every linkage job eventually meets — is |block_l|×
    * |block_r| quadratic, so blocks are counted first and any block
    * bigger than `maxBlockRows` on either side fails LOUDLY with the
    * offending key (the [[rangeJoin]] raise_error convention) instead of
    * silently going quadratic.
    *
    * Output: blockCols, `id_a`, `id_b`, `text_a`, `text_b`, `dist`. */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      blockCols: Seq[String],
      idCol: String,
      textCol: String,
      maxDist: Int,
      maxBlockRows: Long = 100000L
  ): DataFrame = {
    require(blockCols.nonEmpty, "editDistanceJoin needs at least one blocking key")
    require(maxDist >= 0, "maxDist must be >= 0")
    def side(df: DataFrame, suffix: String): DataFrame = {
      val base = df
        .filter(blockCols.map(col(_).isNotNull).reduce(_ && _) && col(textCol).isNotNull)
        .select(blockCols.map(col) ++ Seq(
          col(idCol).as(s"id_$suffix"), col(textCol).as(s"text_$suffix")): _*)
      // block-grain counts are map-side combined; the guard rides the
      // join as a validated count column so it cannot be optimized away
      val counts = base.groupBy(blockCols.map(col): _*)
        .agg(count(lit(1)).as(s"__n_$suffix"))
      val guarded = counts.withColumn(s"__n_$suffix",
        when(col(s"__n_$suffix") > maxBlockRows,
          raise_error(concat(
            lit(s"editDistanceJoin: block "),
            concat_ws(",", blockCols.map(c => col(c).cast("string")): _*),
            lit(s" has more than $maxBlockRows rows on side '$suffix'; "),
            lit("refine the blocking keys or raise maxBlockRows"))).cast("long"))
          .otherwise(col(s"__n_$suffix")))
      base.join(guarded, blockCols)
    }
    val lev = levenshtein(col("text_a"), col("text_b"), maxDist)
    side(left, "a").join(side(right, "b"), blockCols)
      .filter(abs(length(col("text_a")) - length(col("text_b"))) <= maxDist)
      .withColumn("dist", lev)
      .filter(col("dist") >= 0)
      .drop("__n_a", "__n_b")
  }

  /** Self variant of [[editDistanceJoin]]: each unordered pair once
    * (`id_a < id_b`), ids must be numeric-comparable. */
  def editDistanceSelfJoin(
      df: DataFrame,
      blockCols: Seq[String],
      idCol: String,
      textCol: String,
      maxDist: Int,
      maxBlockRows: Long = 100000L
  ): DataFrame =
    editDistanceJoin(df, df, blockCols, idCol, textCol, maxDist, maxBlockRows)
      .filter(col("id_a") < col("id_b"))
}
