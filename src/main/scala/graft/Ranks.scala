package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard-competition ranking ("1-2-2-4"), the only ranking the reference
  * uses: pandas `rank(ascending=False, method='min')`
  * (`/root/reference/bid_evaluation/evaluator.py:314-317`,
  * `staged.py:361-364,389`). Equivalent to SQL `RANK()` descending.
  *
  * A naive `rank().over(Window.orderBy(...))` funnels every row through ONE
  * partition — fine for a bid table, fatal at 100 TB. Instead we aggregate to
  * the distinct score values (`groupBy(score).count`), rank that far smaller
  * frame (the only single-partition window runs over |distinct scores| rows),
  * and join the ranks back. AQE turns the join into a broadcast when the
  * distinct-score frame is small, so the big side is never shuffled beyond
  * the groupBy.
  */
object Ranks {

  /** Appends `outCol` = competition rank of `scoreCol` (descending: highest
    * score -> rank 1) as a nullable LongType. Rows with null score get a
    * null rank (they are excluded from the ranking universe, like pandas
    * NaN). NaN scores rank first (Spark orders NaN above all doubles) and
    * NaN==NaN holds in Spark joins, so NaN rows still get a consistent rank.
    */
  def withCompetitionRank(
      df: DataFrame,
      scoreCol: String,
      outCol: String
  ): DataFrame = {
    val counts = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("__graft_score"))
      .agg(count(lit(1)).as("__graft_cnt"))
    val w = Window.orderBy(col("__graft_score").desc)
    val ranks = counts
      .withColumn(
        outCol,
        (sum("__graft_cnt").over(w) - col("__graft_cnt") + lit(1L)).cast("long"))
      .select(col("__graft_score"), col(outCol))
    df.join(ranks, df(scoreCol) === col("__graft_score"), "left")
      .drop("__graft_score")
  }
}
