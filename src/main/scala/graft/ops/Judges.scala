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

  /** The deduped, null-clean `(__i, __j, __l)` vote frame every
    * aggregator here starts from. A judge voting twice on one item
    * refuses loudly through the consumed label column (a silent
    * last-wins would make results arrival-order-dependent). Returned
    * PERSISTED and tracked — callers iterate over it. */
  private def cleanVotes(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      opName: String
  ): DataFrame =
    graft.Checkpoints.trackCache(df
      .filter(col(itemCol).isNotNull && col(judgeCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(judgeCol).as("__j"))
      .agg(count(lit(1)).as("__c"), min(col(labelCol)).as("__l"))
      .select(col("__i"), col("__j"),
        when(col("__c") > 1, raise_error(concat(
          lit(s"$opName: judge '"), col("__j").cast("string"),
          lit("' voted more than once on item '"), col("__i").cast("string"),
          lit("' — dedupe votes upstream (a silent last-wins would be "),
          lit("arrival-order-dependent)")))).otherwise(col("__l")).as("__l"))
      .persist())

  /** Raw per-item majority over a [[cleanVotes]] frame, ties toward the
    * binary-smaller label — round 0 of every aggregator here. Output:
    * `(__i, __t)`. */
  private def rawMajority(votes: DataFrame): DataFrame =
    votes.groupBy("__i", "__l").agg(count(lit(1)).as("__n"))
      .groupBy("__i")
      .agg(min(struct((-col("__n")).as("n"), col("__l").as("l"))).as("__m"))
      .select(col("__i"), col("__m.l").as("__t"))

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
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "judgeConsensus")
    // round 0: raw majority, ties to the binary-smaller label
    val maj = rawMajority(votes).withColumnRenamed("__t", "__maj")
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

  /** One hard Dawid–Skene scoring pass: posterior per (item, candidate
    * label) from a current labeling's class prior and per-judge
    * confusion rows, argmax ties toward the binary-smaller label.
    *
    * Everything is exact-integer counts Laplace-smoothed by `alpha`
    * before ONE double division, ln'd, and folded in judge-id order
    * (the q84 sorted-fold convention) — so the doubles replay
    * identically in the oracle engine. `cur` is `(__i, __t)` labels
    * used to ESTIMATE prior + confusion; when `priorFrom`/`confFrom`
    * differ from the full item set (the gold-anchored mode), pass the
    * restricted frame. Returns the new `(__i, __t, __post)` winners
    * over ALL voted items. */
  private def dsScorePass(
      votes: DataFrame,
      cur: DataFrame,
      labels: DataFrame,
      nLabels: Long,
      alpha: Long
  ): DataFrame = {
    val nEst = cur.count()
    // class prior over the estimation set, every alphabet label smoothed in
    val prior = labels
      .join(cur.groupBy(col("__t")).agg(count(lit(1)).as("__pc")),
        labels("__l") === col("__t"), "left")
      .select(labels("__l").as("__t"),
        ((coalesce(col("__pc"), lit(0L)) + lit(alpha)).cast("double") /
          lit((nEst + alpha * nLabels).toDouble)).as("__pi"))
    // per-judge confusion over the estimation set: numerator at
    // (judge, true, observed) grain, denominator at (judge, true)
    val jt = votes.join(cur, Seq("__i"))
    val denom = jt.groupBy("__j", "__t").agg(count(lit(1)).as("__d"))
    val numer = jt.groupBy("__j", "__t", "__l").agg(count(lit(1)).as("__c"))
    // score every voted item against every alphabet label: ln prior +
    // judge-ordered fold of ln confusion terms (missing (j, t[, o])
    // rows smooth to alpha-floored cells — a judge is maximally
    // uninformative about classes it never judged)
    val cand = votes.crossJoin(broadcast(labels.select(col("__l").as("__t"))))
    val lnc = log(
      (coalesce(col("__c"), lit(0L)) + lit(alpha)).cast("double") /
        (coalesce(col("__d"), lit(0L)) + lit(alpha * nLabels)).cast("double"))
    cand
      .join(broadcast(numer), Seq("__j", "__t", "__l"), "left")
      .join(broadcast(denom), Seq("__j", "__t"), "left")
      .select(col("__i"), col("__t"), col("__j"), lnc.as("__lnc"))
      .groupBy("__i", "__t")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__j").as("j"), col("__lnc").as("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("__s"))
      .join(broadcast(prior), Seq("__t"))
      .select(col("__i"), col("__t"), (log(col("__pi")) + col("__s")).as("__post"))
      .groupBy("__i")
      .agg(min(struct((-col("__post")).as("p"), col("__t").as("t"))).as("__m"))
      .select(col("__i"), col("__m.t").as("__t"), (-col("__m.p")).as("__post"))
  }

  /** The shared output shape: winner + support columns + the winning
    * ln-posterior (6dp) — the oracle re-derives the posterior, so the
    * whole EM arithmetic is hash-checked, not just the argmax. */
  private def dsOutput(
      votes: DataFrame,
      fin: DataFrame,
      itemCol: String
  ): DataFrame =
    votes.join(fin, Seq("__i"))
      .groupBy("__i", "__t", "__post")
      .agg(count(lit(1)).as("n_judges"),
        sum(when(col("__l") === col("__t"), 1L).otherwise(0L)).as("n_agree"))
      .select(col("__i").as(itemCol), col("__t").as("consensus"),
        col("n_judges"), col("n_agree"),
        (round(col("n_agree").cast("double") / col("n_judges").cast("double"), 6)
          + lit(0.0)).as("support_r"),
        (round(col("__post"), 6) + lit(0.0)).as("logpost_r"))

  /** Full (hard-EM) Dawid–Skene consensus — the [[judgeConsensus]]
    * upgrade the one-round agreement weighting cannot reach: per-judge
    * PER-LABEL confusion matrices (not one scalar reliability), class
    * priors, and `iters` bounded re-estimation rounds, so a judge that
    * is precise about one class and noise about another is believed
    * exactly where it earns it, and a reliable minority can outvote
    * correlated mediocre judges wherever the confusion evidence from
    * the rest of the corpus supports them (spec-pinned on a planted
    * corpus; Dawid & Skene 1979, hard-EM variant).
    *
    * Determinism contract (oracle-replayable, the q249 bounded-EM
    * discipline): init = raw majority (ties binary-smaller); each round
    * re-estimates priors and confusions as Laplace-`alpha`-smoothed
    * EXACT integer ratios, scores in ln domain with judge-id-ordered
    * folds, and argmaxes with ties toward the binary-smaller label; the
    * oracle unrolls the same `iters` rounds in SQL. Output per item:
    * `consensus`, `n_judges`, `n_agree`, `support_r`, `logpost_r`.
    *
    * Scale shape: per round, prior and confusion are judge-alphabet-
    * grain aggregates broadcast back; the one data-grain job is the
    * (votes × |labels|) scoring aggregate with map-side partials. The
    * current labeling re-checkpoints each round (the engine's fixpoint
    * convention). Driver state: two scalars (|labels|, |items|) — the
    * alphabet itself never collects. */
  def dawidSkene(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      iters: Int = 2,
      alpha: Long = 1L
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(alpha >= 1, "alpha must be >= 1 (unsmoothed zero cells have no ln)")
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "dawidSkene")
    val labels = graft.Checkpoints.trackCache(
      votes.select(col("__l")).distinct().persist())
    val nLabels = labels.count()
    if (nLabels == 0L) return dsOutput(votes, rawMajority(votes)
      .withColumn("__post", lit(0.0)), itemCol)
    var cur = graft.Checkpoints.localCheckpoint(rawMajority(votes),
      resetStats = true)
    var fin: DataFrame = null
    for (_ <- 1 to iters) {
      val next = graft.Checkpoints.localCheckpoint(
        dsScorePass(votes, cur, labels, nLabels, alpha), resetStats = true)
      graft.Checkpoints.free(cur)
      cur = next.select("__i", "__t")
      fin = next
    }
    dsOutput(votes, fin, itemCol)
  }

  /** GOLD-ANCHORED consensus: when a small trusted label set exists,
    * estimate each judge's per-label confusion (and the class prior)
    * from the GOLD items only — no EM, one scoring pass over all items
    * — so fully-correlated wrong judges are exposed by ground truth
    * instead of hoping the majority basin escapes them (the case even
    * full Dawid–Skene cannot fix when the correlated block IS the
    * majority everywhere). `gold` is `(itemCol, goldLabelCol)`, one row
    * per gold item (duplicates refuse loudly); gold items missing from
    * the votes estimate nothing and gold labels never voted stay in the
    * alphabet via smoothing. Output: the [[dawidSkene]] shape. */
  def goldAnchoredConsensus(
      df: DataFrame,
      gold: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      goldLabelCol: String,
      alpha: Long = 1L
  ): DataFrame = {
    require(alpha >= 1, "alpha must be >= 1")
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "goldAnchoredConsensus")
    val g = gold
      .filter(col(itemCol).isNotNull && col(goldLabelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"))
      .agg(count(lit(1)).as("__c"), min(col(goldLabelCol)).as("__t"))
      .select(col("__i"),
        when(col("__c") > 1, raise_error(concat(
          lit("goldAnchoredConsensus: item '"), col("__i").cast("string"),
          lit("' has more than one gold label — resolve upstream"))))
          .otherwise(col("__t")).as("__t"))
    val labels = graft.Checkpoints.trackCache(
      votes.select(col("__l"))
        .unionByName(g.select(col("__t").as("__l")))
        .distinct().persist())
    val nLabels = labels.count()
    if (nLabels == 0L) return dsOutput(votes, rawMajority(votes)
      .withColumn("__post", lit(0.0)), itemCol)
    // estimation set: gold items only (their label is the gold label)
    val cur = graft.Checkpoints.localCheckpoint(g, resetStats = true)
    dsOutput(votes, dsScorePass(votes, cur, labels, nLabels, alpha), itemCol)
  }
}
