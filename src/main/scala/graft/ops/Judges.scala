package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble-judge aggregation — the vetting step a synthetic-data /
  * LLM-as-judge pipeline runs over multiple imperfect labelers: raw
  * majority first, then one agreement-weighting round (judges who
  * track the majority get more say, the Dawid–Skene intuition without
  * its EM fragility), then the weighted consensus with per-item
  * support. The reference has no labeling surface; this extends the
  * engine the way the classifier/label-hygiene operators do.
  *
  * Determinism contract (oracle-replayable): vote counts and
  * agreement counts are exact integers; a judge's reliability is one
  * exact-integer division (`n_agree / n_judged`); every weight SUM
  * folds its judges in judge-id order (the q84 sorted-fold
  * convention); and every argmax breaks ties toward the binary-
  * smaller label via `min(struct(-count-or-weight, label))` —
  * negation of a double is exact, so `min(-w)` ≡ `ORDER BY w DESC,
  * label ASC`.
  *
  * Scale shape: three hash aggregations at (item, label) / judge /
  * item grain plus one broadcast-small reliability join — no windows
  * over the vote grain, no driver collects. A judge voting twice on
  * one item refuses loudly through the consumed label column (a
  * silent last-wins would make results arrival-order-dependent).
  */
object Judges {

  /** Consensus over `(itemCol, judgeCol, labelCol)` votes. Output per
    * item: `consensus` (agreement-weighted winner), `n_judges`,
    * `n_agree` (judges matching the final consensus), `support_r`
    * (= n_agree / n_judges, 6dp), `weighted_support_r` (winner weight
    * share of the item's total judge weight, 6dp), and `unanimous`. */
  def judgeConsensus(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String
  ): DataFrame = {
    val votes = graft.Checkpoints.trackCache(df
      .filter(col(itemCol).isNotNull && col(judgeCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(judgeCol).as("__j"))
      .agg(count(lit(1)).as("__c"), min(col(labelCol)).as("__l"))
      .select(col("__i"), col("__j"),
        when(col("__c") > 1, raise_error(concat(
          lit("judgeConsensus: judge '"), col("__j").cast("string"),
          lit("' voted more than once on item '"), col("__i").cast("string"),
          lit("' — dedupe votes upstream (a silent last-wins would be "),
          lit("arrival-order-dependent)")))).otherwise(col("__l")).as("__l"))
      .persist())
    // round 0: raw majority, ties to the binary-smaller label
    val maj = votes.groupBy("__i", "__l").agg(count(lit(1)).as("__n"))
      .groupBy("__i")
      .agg(min(struct((-col("__n")).as("n"), col("__l").as("l"))).as("__m"))
      .select(col("__i"), col("__m.l").as("__maj"))
    // per-judge reliability: exact agreement fraction vs the raw majority
    val rel = votes.join(maj, Seq("__i"))
      .groupBy("__j")
      .agg((sum(when(col("__l") === col("__maj"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("__rel"))
    // weighted vote: judge-ordered weight folds per (item, label) and per
    // item; argmax ties to the binary-smaller label
    val weighted = votes.join(broadcast(rel), Seq("__j"))
    val perLabel = weighted.groupBy("__i", "__l")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__j").as("j"), col("__rel").as("r")))),
        lit(0.0), (acc, x) => acc + x.getField("r")).as("__w"))
    val perItem = weighted.groupBy("__i")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__j").as("j"), col("__rel").as("r")))),
        lit(0.0), (acc, x) => acc + x.getField("r")).as("__wt"),
        count(lit(1)).as("n_judges"))
    val winner = perLabel.groupBy("__i")
      .agg(min(struct((-col("__w")).as("w"), col("__l").as("l"))).as("__m"))
      .select(col("__i"), col("__m.l").as("consensus"), (-col("__m.w")).as("__wwin"))
    val agree = votes.join(winner, Seq("__i"))
      .groupBy("__i")
      .agg(sum(when(col("__l") === col("consensus"), 1L).otherwise(0L)).as("n_agree"))
    winner.join(perItem, Seq("__i")).join(agree, Seq("__i"))
      .select(col("__i").as(itemCol), col("consensus"),
        col("n_judges"), col("n_agree"),
        (round(col("n_agree").cast("double") / col("n_judges").cast("double"), 6)
          + lit(0.0)).as("support_r"),
        (round(col("__wwin") / col("__wt"), 6) + lit(0.0)).as("weighted_support_r"),
        (col("n_agree") === col("n_judges")).as("unanimous"))
  }

  /** Per-judge report card against the weighted consensus: how many
    * items each judge saw and how often it agreed with the final
    * consensus — the labeler-quality audit that decides which judges
    * to retire. Output: `(judgeCol, n_items, n_agree, agree_rate_r)`. */
  def judgeReliability(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String
  ): DataFrame = {
    val consensus = judgeConsensus(df, itemCol, judgeCol, labelCol)
      .select(col(itemCol), col("consensus"))
    df.filter(col(itemCol).isNotNull && col(judgeCol).isNotNull &&
        col(labelCol).isNotNull)
      .join(consensus, Seq(itemCol))
      .groupBy(col(judgeCol))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col(labelCol) === col("consensus"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agree_rate_r",
        round(col("n_agree").cast("double") / col("n_items").cast("double"), 6)
          + lit(0.0))
  }
}
