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
    consensusTail(votes, rel, itemCol)
  }

  /** Per-judge EXACT agreement counters vs the per-item raw majority:
    * `(judgeCol, n_judged, n_agree)`. Because majorities are ITEM-LOCAL,
    * counters from disjoint corpus slices merge by plain integer
    * addition into exactly the counters of the union — the property the
    * streaming maintenance loop
    * ([[graft.streaming.StreamingEval.judgeStream]]) rides. The
    * reliability [[judgeConsensus]] uses is one division away:
    * `n_agree / n_judged`. */
  def judgeCounters(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String
  ): DataFrame = {
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "judgeCounters")
    val maj = rawMajority(votes).withColumnRenamed("__t", "__maj")
    votes.join(maj, Seq("__i"))
      .groupBy("__j")
      .agg(count(lit(1)).as("n_judged"),
        sum(when(col("__l") === col("__maj"), 1L).otherwise(0L)).as("n_agree"))
      .select(col("__j").as(judgeCol), col("n_judged"), col("n_agree"))
  }

  /** [[judgeConsensus]] with the reliabilities supplied from OUTSIDE —
    * a [[judgeCounters]] frame accumulated over any corpus (the
    * serving shape: calibrate judges once/incrementally, score every
    * later batch against the standing track record). Reliability =
    * `n_agree / n_judged`, the exact division [[judgeConsensus]]
    * computes internally, so with counters FROM the same votes this is
    * bit-identical to [[judgeConsensus]] (spec-pinned). A judge with
    * no counter row votes at weight 0 — counted in `n_judges`, unable
    * to move the weighted argmax until it earns a track record. */
  def consensusWithCounters(
      df: DataFrame,
      counters: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String
  ): DataFrame = {
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "consensusWithCounters")
    // n_judged = 0 (an externally accumulated counter row with no scored
    // votes yet) must degrade to the documented weight-0 behavior, not
    // 0/0 = NaN — NaN slips past the coalesce(__rel, 0.0) null guard and
    // poisons every fold and argmax the judge touches.
    val rel = counters.select(col(judgeCol).as("__j"),
      when(col("n_judged") > 0,
        col("n_agree").cast("double") / col("n_judged").cast("double"))
        .otherwise(lit(0.0)).as("__rel"))
    consensusTail(votes, rel, itemCol)
  }

  /** The shared weighted-vote tail: judge-ordered weight folds per
    * (item, label) and per item, argmax ties to the binary-smaller
    * label. `rel` is `(__j, __rel)`; judges absent from it weigh 0. */
  private def consensusTail(
      votes: DataFrame,
      rel: DataFrame,
      itemCol: String
  ): DataFrame = {
    val weighted = votes.join(broadcast(rel), Seq("__j"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0.0)))
    // ONE (item, label)-grain aggregate + ONE item-grain window stage.
    // The old shape read `weighted` twice (per-label and per-item folds)
    // and `votes` once more for the agree count, then stitched four
    // frames with item-grain joins — every branch re-ran the weighted
    // join and each join was its own exchange. The per-item total
    // weight stays BIT-EXACT: flattening the per-label (j, rel) lists
    // over the item window and re-sorting yields the same judge-sorted
    // array the old per-item collect_list produced (j is unique per
    // item — the cleanVotes contract), so the fold order is identical.
    val perLabel = weighted.groupBy("__i", "__l")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("__j").as("j"), col("__rel").as("r")))),
          lit(0.0), (acc, x) => acc + x.getField("r")).as("__w"),
        collect_list(struct(col("__j").as("j"), col("__rel").as("r"))).as("__jrs"),
        count(lit(1)).as("__nl"))
    val wI = org.apache.spark.sql.expressions.Window.partitionBy(col("__i"))
    perLabel
      .withColumn("__m",
        min(struct((-col("__w")).as("w"), col("__l").as("l"))).over(wI))
      .withColumn("__wt", aggregate(
        array_sort(flatten(collect_list(col("__jrs")).over(wI))),
        lit(0.0), (acc, x) => acc + x.getField("r")))
      .withColumn("n_judges", sum(col("__nl")).over(wI))
      .filter(col("__l") === col("__m.l")) // exactly one row per item
      .select(col("__i").as(itemCol), col("__l").as("consensus"),
        col("n_judges"), col("__nl").as("n_agree"),
        (round(col("__nl").cast("double") / col("n_judges").cast("double"), 6)
          + lit(0.0)).as("support_r"),
        (round(-col("__m.w") / col("__wt"), 6) + lit(0.0)).as("weighted_support_r"),
        (col("__nl") === col("n_judges")).as("unanimous"))
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

  /** Cohen's kappa (1960) for EVERY judge pair over their co-judged
    * items — the inter-annotator agreement matrix a labeling report
    * leads with: chance-corrected agreement per pair, where consensus
    * agreement rates ([[judgeReliability]]) can't separate "agrees
    * because right" from "agrees because both always say hi".
    *
    * Exact arithmetic: with n co-judged items, `agree` exact matches,
    * and S = Σ over labels of (judge-a count × judge-b count),
    * kappa = (po − pe) / (1 − pe) reduces to the single exact-integer
    * ratio `(agree·n − S) / (n² − S)` — one double division, no
    * ordered-fold machinery needed. A pair whose marginals are both
    * constant (n² = S) has undefined kappa and reports null.
    *
    * Scale shape: the co-judgment self-join is Σ over items of
    * (panel size)² rows — panel-bounded per item, never corpus² — and
    * the output is at most judges²/2 rows; a panel wider than
    * `maxJudges` refuses loudly before the join (one scalar count, the
    * [[guardConfusionCells]] convention). Output per pair (judge_a <
    * judge_b, binary order): `(judge_a, judge_b, n_items, n_agree,
    * kappa_r)`. */
  def pairwiseKappa(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      maxJudges: Long = 1000L
  ): DataFrame = {
    require(maxJudges >= 2, "maxJudges must be >= 2")
    val v = cleanVotes(df, itemCol, judgeCol, labelCol, "pairwiseKappa")
    val nJudges = v.select(col("__j")).distinct().count()
    if (nJudges > maxJudges)
      throw new IllegalArgumentException(
        s"pairwiseKappa: $nJudges distinct judges would emit ~" +
          s"${nJudges * (nJudges - 1) / 2} pairs (and a per-item panel² " +
          s"join) — pool judges upstream or raise maxJudges")
    val co = v.select(col("__i"), col("__j").as("judge_a"), col("__l").as("__la"))
      .join(v.select(col("__i"), col("__j").as("judge_b"), col("__l").as("__lb")),
        Seq("__i"))
      .filter(col("judge_a") < col("judge_b"))
    val counts = co.groupBy("judge_a", "judge_b")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__la") === col("__lb"), 1L).otherwise(0L)).as("n_agree"))
    val ac = co.groupBy(col("judge_a"), col("judge_b"), col("__la").as("__c"))
      .agg(count(lit(1)).as("__ac"))
    val bc = co.groupBy(col("judge_a"), col("judge_b"), col("__lb").as("__c"))
      .agg(count(lit(1)).as("__bc"))
    val s = ac.join(bc, Seq("judge_a", "judge_b", "__c"))
      .groupBy("judge_a", "judge_b")
      .agg(sum(col("__ac") * col("__bc")).as("__s"))
    counts.join(s, Seq("judge_a", "judge_b"), "left")
      .select(col("judge_a"), col("judge_b"), col("n_items"), col("n_agree"),
        when(col("n_items") * col("n_items") === coalesce(col("__s"), lit(0L)),
          lit(null).cast("double"))
          .otherwise(round(
            (col("n_agree") * col("n_items") - coalesce(col("__s"), lit(0L)))
              .cast("double") /
              (col("n_items") * col("n_items") - coalesce(col("__s"), lit(0L)))
                .cast("double"), 6) + lit(0.0)).as("kappa_r"))
  }

  /** Krippendorff's alpha over the whole vote frame — the one-number
    * agreement summary that handles MISSING votes (judges need not
    * co-judge everything, unlike [[pairwiseKappa]]'s pair grain):
    * 1 − observed/expected disagreement over every unit with ≥ 2
    * ratings (Krippendorff 2004's coincidence formulation).
    *
    * `metric = "nominal"` (default) uses δ(a,b) = 1{a≠b};
    * `metric = "interval"` uses δ(a,b) = (a−b)² for NUMERIC graded
    * labels (1–5 quality panels — this family's actual payload), so a
    * near-miss panel (4 vs 5) disagrees less than a full-split one
    * (1 vs 5). Interval labels must be integral and numeric-castable —
    * a UUID-ish or fractional label refuses loudly (the
    * [[graft.ops.Ids.withSurrogateId]] convention); magnitudes up to
    * ~10³ with up to ~10⁹ ratings keep every product exactly inside a
    * long.
    *
    * Exact and engine-portable: with n_u ratings of a unit, the
    * observed-disagreement mass groups by PANEL SIZE m — units sharing
    * m share the 1/(m−1) denominator, so `Do_sum = Σ_m (Σ_{units of
    * size m} S_u) / (m − 1)` is a fold over at most max-panel-size
    * terms, ordered by m, where the per-unit ordered-pair sum S_u is
    * exact integers either way: nominal `Σ_c n_uc(m − n_uc)`, interval
    * `2(m·Σv² − (Σv)²)`. The expected side is pure integers too:
    * nominal `D = n² − Σ_c n_c²`, interval `D = 2(n·Σv² − (Σv)²)` over
    * all ratings. `alpha_r = 1 − Do_sum·(n−1)/D`; all-ratings-one-label
    * (D = 0) reports null. Output one row:
    * `(n_units, n_ratings, n_labels, do_r, de_r, alpha_r)`.
    *
    * Scale shape: two hash aggregations at (unit[, label]) and label
    * grain; the only collected buffer holds ≤ max-panel-size entries. */
  def krippendorffAlpha(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      metric: String = "nominal"
  ): DataFrame = {
    require(metric == "nominal" || metric == "interval",
      s"metric must be 'nominal' or 'interval', got '$metric'")
    val v = cleanVotes(df, itemCol, judgeCol, labelCol, "krippendorffAlpha")
    val nu = v.groupBy("__i").agg(count(lit(1)).as("__nu"))
    val vu = v.join(nu.filter(col("__nu") >= 2), Seq("__i"))
    // per-panel-size observed-disagreement numerators Σ_{units of size
    // m} S_u (exact integers), then ONE ordered fold over ≤
    // max-panel-size terms
    val byM =
      if (metric == "nominal")
        vu.groupBy(col("__i"), col("__nu"), col("__l"))
          .agg(count(lit(1)).as("__nuc"))
          .groupBy(col("__nu").as("__m"))
          .agg(sum(col("__nuc") * (col("__nu") - col("__nuc"))).as("__sm"))
      else {
        val lv = intervalLabel("krippendorffAlpha")
        vu.groupBy(col("__i"), col("__nu"))
          .agg(sum(lv).as("__s"), sum(lv * lv).as("__q"))
          .groupBy(col("__nu").as("__m"))
          .agg(sum(lit(2L) * (col("__nu") * col("__q") - col("__s") * col("__s")))
            .as("__sm"))
      }
    val doSum = byM
      .agg(aggregate(
        array_sort(collect_list(struct(col("__m").as("m"),
          (col("__sm").cast("double") / (col("__m") - 1L).cast("double")).as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t")).as("__dosum"))
    val tot = vu.agg(count(lit(1)).as("n_ratings"),
      countDistinct(col("__i")).as("n_units"))
    // expected-disagreement mass D over ALL ratings — exact integers
    val joined =
      if (metric == "nominal") {
        val lab = vu.groupBy("__l").agg(count(lit(1)).as("__nc"))
          .agg(count(lit(1)).as("n_labels"),
            sum(col("__nc") * col("__nc")).as("__sumc2"))
        tot.crossJoin(lab).crossJoin(doSum)
          .withColumn("__d",
            col("n_ratings") * col("n_ratings") - col("__sumc2"))
      } else {
        val lv = intervalLabel("krippendorffAlpha")
        val lab = vu.agg(countDistinct(col("__l")).as("n_labels"),
            count(lit(1)).as("__n"), sum(lv).as("__gs"), sum(lv * lv).as("__gq"))
          .select(col("n_labels"),
            (lit(2L) * (col("__n") * col("__gq") - col("__gs") * col("__gs")))
              .as("__d"))
        tot.crossJoin(lab).crossJoin(doSum)
      }
    joined
      .select(col("n_units"), col("n_ratings"), col("n_labels"),
        when(col("n_ratings") === 0L, lit(null).cast("double"))
          .otherwise(round(col("__dosum") / col("n_ratings").cast("double"), 6)
            + lit(0.0)).as("do_r"),
        when(col("n_ratings") < 2L, lit(null).cast("double"))
          .otherwise(round(col("__d").cast("double") /
            (col("n_ratings") * (col("n_ratings") - 1L)).cast("double"), 6)
            + lit(0.0)).as("de_r"),
        when(col("n_ratings") < 2L || col("__d") === 0L, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("__dosum") *
            (col("n_ratings") - 1L).cast("double") / col("__d").cast("double"), 6)
            + lit(0.0)).as("alpha_r"))
  }

  /** The interval metric's checked numeric label (riding the consumed
    * column so Catalyst cannot prune the refusal): non-castable or
    * fractional labels raise with the surrogate-id pointer. */
  private def intervalLabel(opName: String): org.apache.spark.sql.Column = {
    val ln = col("__l").cast("long")
    when(col("__l").isNotNull && ln.isNull, raise_error(concat(
        lit(s"$opName(interval): label must be numeric-castable "),
        lit("(route categorical labels through the nominal metric, or "),
        lit("map grades via Ids.withSurrogateId); got: "),
        col("__l").cast("string"))))
      .when(col("__l").cast("double") =!= ln.cast("double"), raise_error(concat(
        lit(s"$opName(interval): label must be integral (a graded "),
        lit("scale); got: "), col("__l").cast("string"))))
      .otherwise(ln)
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
      alpha: Long,
      nEst: Long
  ): DataFrame = {
    // class prior over the estimation set, every alphabet label smoothed
    // in. nEst (the estimation-set size) is caller-supplied: inside the
    // EM loop it is the constant voted-item count — counting it per
    // round was one driver job per round for a number that never moves.
    val prior = labels
      .join(cur.groupBy(col("__t")).agg(count(lit(1)).as("__pc")),
        labels("__l") === col("__t"), "left")
      .select(labels("__l").as("__t"),
        ((coalesce(col("__pc"), lit(0L)) + lit(alpha)).cast("double") /
          lit((nEst + alpha * nLabels).toDouble)).as("__pi"))
    // per-judge confusion over the estimation set, ONE broadcast frame
    // at (judge, true) grain: the per-observed-label numerators ride a
    // map payload next to their denominator, so the scoring pass pays
    // one broadcast build and one join where it paid two of each (and
    // the votes ⋈ cur join underneath ran once per aggregate). Cell
    // counts stay the exact integers; maxConfusionCells bounds the map.
    val conf = votes.join(cur, Seq("__i"))
      .groupBy("__j", "__t", "__l").agg(count(lit(1)).as("__c"))
      .groupBy("__j", "__t").agg(sum(col("__c")).as("__d"),
        map_from_entries(collect_list(struct(col("__l"), col("__c")))).as("__cm"))
    // score every voted item against every alphabet label: ln prior +
    // judge-ordered fold of ln confusion terms (missing (j, t[, o])
    // rows smooth to alpha-floored cells — a judge is maximally
    // uninformative about classes it never judged)
    val cand = votes.crossJoin(broadcast(labels.select(col("__l").as("__t"))))
    val lnc = log(
      (coalesce(element_at(col("__cm"), col("__l")), lit(0L)) + lit(alpha)).cast("double") /
        (coalesce(col("__d"), lit(0L)) + lit(alpha * nLabels)).cast("double"))
    cand
      .join(broadcast(conf), Seq("__j", "__t"), "left")
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
    * grain aggregates broadcast back — |judges|·|labels|² cells, counted
    * against `maxConfusionCells` ONCE up front with a loud refusal (a
    * crowd-label corpus with 10⁵ workers must pool judges or use
    * [[judgeConsensus]], not OOM the driver); the one data-grain job is
    * the (votes × |labels|) scoring aggregate with map-side partials. The
    * current labeling re-checkpoints each round (the engine's fixpoint
    * convention). Driver state: two scalars (|labels|, |items|) — the
    * alphabet itself never collects. */
  def dawidSkene(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      iters: Int = 2,
      alpha: Long = 1L,
      maxConfusionCells: Long = 1L << 20
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(alpha >= 1, "alpha must be >= 1 (unsmoothed zero cells have no ln)")
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "dawidSkene")
    val labels = graft.Checkpoints.trackCache(
      votes.select(col("__l")).distinct().persist())
    val nLabels = labels.count()
    guardConfusionCells(votes, nLabels, maxConfusionCells, "dawidSkene")
    if (nLabels == 0L) return dsOutput(votes, rawMajority(votes)
      .withColumn("__post", lit(0.0)), itemCol)
    var cur = graft.Checkpoints.localCheckpoint(rawMajority(votes),
      resetStats = true)
    // the estimation set is item-grain every round: its size is the
    // voted-item count, constant across the EM loop — count once
    val nEst = cur.count()
    var fin: DataFrame = null
    for (_ <- 1 to iters) {
      val next = graft.Checkpoints.localCheckpoint(
        dsScorePass(votes, cur, labels, nLabels, alpha, nEst), resetStats = true)
      graft.Checkpoints.free(cur)
      cur = next.select("__i", "__t")
      fin = next
    }
    dsOutput(votes, fin, itemCol)
  }

  /** SOFT Dawid–Skene — [[dawidSkene]]'s full per-(item, label)
    * posterior row instead of the hard argmax, for downstream loss
    * weighting (train on every label in proportion to belief, or
    * down-weight items the panel is genuinely split on). Runs the same
    * bounded hard-EM: `iters - 1` labeling updates fix the final
    * round's prior and confusion estimates, then ONE scoring pass emits
    * every candidate label's posterior.
    *
    * Determinism contract: the per-cell terms are the exact
    * Laplace-smoothed rationals of [[dawidSkene]], but combined in the
    * LINEAR domain — a judge-id-ordered multiplicative fold (the q84
    * sorted-fold convention with × for +), never `exp(Σ ln)`, which
    * no two engines round alike. Each label's raw mass divides by the
    * hard winner's mass first (values land in (0, 1], conditioning the
    * sum), then normalizes by the label-ordered sum of those ratios —
    * posteriors sum to 1 per item (6dp), and `is_consensus` marks the
    * [[dawidSkene]] winner row by construction (same estimates, same
    * ln-domain argmax).
    *
    * Panel-size contract: linear products of ~n_judges cell terms
    * underflow for panels of hundreds of extreme-confusion judges
    * (the hard path folds in ln and does not); this operator targets
    * the LLM-judge-panel scale `maxConfusionCells` already enforces.
    *
    * Output: `(itemCol, label, posterior_r, is_consensus)` — one row
    * per voted item × alphabet label.
    *
    * Scale shape: [[dawidSkene]]'s per-round jobs, plus one extra
    * (votes × |labels|) product-fold aggregate and two item-grain
    * joins for the normalization — no new driver state. */
  def dawidSkenePosteriors(
      df: DataFrame,
      itemCol: String,
      judgeCol: String,
      labelCol: String,
      iters: Int = 2,
      alpha: Long = 1L,
      maxConfusionCells: Long = 1L << 20
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(alpha >= 1, "alpha must be >= 1 (unsmoothed zero cells have no ln)")
    val votes = cleanVotes(df, itemCol, judgeCol, labelCol, "dawidSkenePosteriors")
    val labels = graft.Checkpoints.trackCache(
      votes.select(col("__l")).distinct().persist())
    val nLabels = labels.count()
    if (nLabels == 0L) // no votes at all: empty output, right schema
      return votes.select(col("__i").as(itemCol), col("__l").as("label"),
        lit(0.0).as("posterior_r"), lit(true).as("is_consensus"))
    guardConfusionCells(votes, nLabels, maxConfusionCells, "dawidSkenePosteriors")
    var cur = graft.Checkpoints.localCheckpoint(rawMajority(votes),
      resetStats = true)
    // item-grain every round: the estimation-set size is constant
    val nEst = cur.count()
    for (_ <- 1 until iters) {
      val next = graft.Checkpoints.localCheckpoint(
        dsScorePass(votes, cur, labels, nLabels, alpha, nEst).select("__i", "__t"),
        resetStats = true)
      graft.Checkpoints.free(cur)
      cur = next
    }
    // the final round over the same estimates: the ln-domain score (≡
    // dawidSkene's — same sorted fold, same cells) and the linear-domain
    // mass ride ONE votes×labels aggregation (two folds over one
    // collected buffer — the expensive data-grain job runs once, not
    // twice), then the winner argmaxes the ln side exactly as
    // dsScorePass does
    val prior = labels
      .join(cur.groupBy(col("__t")).agg(count(lit(1)).as("__pc")),
        labels("__l") === col("__t"), "left")
      .select(labels("__l").as("__t"),
        ((coalesce(col("__pc"), lit(0L)) + lit(alpha)).cast("double") /
          lit((nEst + alpha * nLabels).toDouble)).as("__pi"))
    // one (judge, true)-grain confusion broadcast with a per-observed-
    // label map payload — the dsScorePass fusion, same exact cells
    val conf = votes.join(cur, Seq("__i"))
      .groupBy("__j", "__t", "__l").agg(count(lit(1)).as("__c"))
      .groupBy("__j", "__t").agg(sum(col("__c")).as("__d"),
        map_from_entries(collect_list(struct(col("__l"), col("__c")))).as("__cm"))
    val cand = votes.crossJoin(broadcast(labels.select(col("__l").as("__t"))))
    val cell = (coalesce(element_at(col("__cm"), col("__l")), lit(0L)) + lit(alpha)).cast("double") /
      (coalesce(col("__d"), lit(0L)) + lit(alpha * nLabels)).cast("double")
    val lnc = log(cell)
    val scored = cand
      .join(broadcast(conf), Seq("__j", "__t"), "left")
      .select(col("__i"), col("__t"), col("__j"),
        lnc.as("__lnc"), cell.as("__r"))
      .groupBy("__i", "__t")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("__j").as("j"), col("__lnc").as("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("__s"),
        aggregate(
          array_sort(collect_list(struct(col("__j").as("j"), col("__r").as("r")))),
          lit(1.0), (acc, x) => acc * x.getField("r")).as("__prod"))
      .join(broadcast(prior), Seq("__t"))
      .select(col("__i"), col("__t"),
        (log(col("__pi")) + col("__s")).as("__post"),
        (col("__pi") * col("__prod")).as("__p"))
    // winner, winner-mass, and the t-ordered normalizer all ride ONE
    // item-grain window stage: the old shape re-joined the persisted
    // `scored` frame four times at __i grain — four exchanges and a
    // persist where one suffices. Arithmetic is unchanged: same argmax
    // struct, same q = p / pwin ratios, same t-sorted fold for z.
    val wI = org.apache.spark.sql.expressions.Window.partitionBy(col("__i"))
    val withWin = scored
      .withColumn("__m", min(struct((-col("__post")).as("p"), col("__t").as("t"))).over(wI))
      .withColumn("__win", col("__m.t"))
    val ratios = withWin
      .withColumn("__pwin", max(when(col("__t") === col("__win"), col("__p"))).over(wI))
      .withColumn("__q", col("__p") / col("__pwin"))
    val z = ratios
      .withColumn("__z", aggregate(
        array_sort(collect_list(struct(col("__t").as("t"), col("__q").as("q"))).over(wI)),
        lit(0.0), (acc, x) => acc + x.getField("q")))
    z.select(col("__i").as(itemCol), col("__t").as("label"),
      (round(col("__q") / col("__z"), 6) + lit(0.0)).as("posterior_r"),
      (col("__t") === col("__win")).as("is_consensus"))
  }

  /** PREFERENCE-PAIR construction — the RLHF/DPO data-prep step after
    * judging: per item (prompt), the best-scored candidate (response)
    * becomes `chosen` and the worst-scored becomes `rejected`, emitted
    * only when the score gap clears `margin` (a pair the judges barely
    * separated teaches noise). Ties break toward the binary-smaller
    * candidate on BOTH ends (`min(struct(±score, cand))` — the
    * engine-wide argmax pin), and an item whose best and worst collapse
    * to the same candidate (single candidate, or all scores equal)
    * emits nothing: a self-pair is never trainable. A candidate scored
    * twice for one item refuses loudly (the [[cleanVotes]] contract —
    * silent last-wins would be arrival-order-dependent).
    *
    * Output: `(itemCol, chosen, rejected, chosen_score, rejected_score,
    * n_candidates)`.
    *
    * Scale shape: one hash aggregation at item grain (both argmaxes and
    * the candidate count ride the same agg) plus a map-side margin
    * filter — no windows, no joins, no driver state. */
  def preferencePairs(
      df: DataFrame,
      itemCol: String,
      candidateCol: String,
      scoreCol: String,
      margin: Double = 0.0
  ): DataFrame = {
    require(margin >= 0.0, "margin must be >= 0")
    val scored = df
      .filter(col(itemCol).isNotNull && col(candidateCol).isNotNull &&
        col(scoreCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(candidateCol).as("__c"))
      .agg(count(lit(1)).as("__n"), min(col(scoreCol)).as("__s"))
      .select(col("__i"), col("__c"),
        when(col("__n") > 1, raise_error(concat(
          lit("preferencePairs: candidate '"), col("__c").cast("string"),
          lit("' scored more than once on item '"), col("__i").cast("string"),
          lit("' — aggregate judge scores upstream (a silent last-wins "),
          lit("would be arrival-order-dependent)")))).otherwise(col("__s")).as("__s"))
    scored
      .groupBy("__i")
      .agg(
        min(struct((-col("__s")).as("s"), col("__c").as("c"))).as("__best"),
        min(struct(col("__s").as("s"), col("__c").as("c"))).as("__worst"),
        count(lit(1)).as("n_candidates"))
      .select(col("__i").as(itemCol),
        col("__best.c").as("chosen"), col("__worst.c").as("rejected"),
        (-col("__best.s")).as("chosen_score"), col("__worst.s").as("rejected_score"),
        col("n_candidates"))
      .filter(col("chosen") =!= col("rejected") &&
        col("chosen_score") - col("rejected_score") >= lit(margin))
  }

  /** BRADLEY–TERRY strength fit over pairwise outcomes — the ranking
    * model behind chatbot-arena-style evaluation: each row is one
    * comparison (`winnerCol` beat `loserCol`), and `iters` bounded
    * minorization-maximization rounds fit a positive strength per
    * player such that P(i beats j) ≈ pᵢ/(pᵢ+pⱼ) (Bradley & Terry 1952;
    * MM update p'ᵢ = Wᵢ / Σⱼ nᵢⱼ/(pᵢ+pⱼ), Hunter 2004). Every observed
    * matchup is smoothed with `alpha` phantom wins EACH WAY (exact
    * integers), so an undefeated or winless player still gets a finite,
    * nonzero strength. An optional `draws` frame (same two columns; a
    * tie between the named players) scores half a win each way — counts
    * run in half-win integer units, which without draws is an exact ×2
    * exponent shift, so the no-draw strengths are bit-identical to
    * whole-win arithmetic (the q264 oracle replays in whole wins). A
    * comparison where winner equals loser refuses loudly through the
    * consumed winner column.
    *
    * Determinism contract (oracle-replayable, the q165/q249 bounded-
    * replay discipline): win and match counts are exact integers; each
    * round's denominator folds a player's opponents in OPPONENT-ID
    * order (the q84 sorted-fold convention); the MM update is scale-
    * invariant, so instead of a global-sum normalization (an ordered
    * fold over ALL players) the reported strength divides by the
    * binary-smallest player's strength — one broadcast scalar, and the
    * oracle unrolls the identical rounds in SQL.
    *
    * Output: `(player, n_matches, n_wins, n_draws, strength_r)` — raw
    * (unsmoothed) match/decisive-win/draw counts, strength normalized
    * to the binary-smallest player = 1.0, rounded 6dp.
    *
    * Scale shape: matchups aggregate once to (i, j) grain; per round,
    * one join of the matchup frame against the player-grain strengths
    * (twice, once per side) and one hash aggregation with an
    * opponent-list fold per player (opponent-count-bounded buffers —
    * the per-group rebuild convention); strengths re-checkpoint each
    * round (the engine's fixpoint convention). No driver state beyond
    * the round counter. */
  def bradleyTerry(
      df: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 4,
      alpha: Long = 1L,
      draws: Option[DataFrame] = None
  ): DataFrame =
    bradleyTerryFromCounts(
      matchupCounts(df, winnerCol, loserCol, draws), iters, alpha)

  /** Directed MATCHUP counts at (player, opponent) grain — the
    * accumulable state behind [[bradleyTerry]], the
    * [[judgeCounters]] treatment for pairwise outcomes: all exact
    * integers, so counts from disjoint match slices merge by plain
    * addition (sum every count column grouped by (player, opponent))
    * into exactly the union's counts — daily arena results roll into a
    * standing table and [[bradleyTerryFromCounts]] re-fits from it,
    * never re-reading old matches. Output per direction: `(player,
    * opponent, win_units, n_comparisons, n_wins, n_draws)` —
    * `win_units` in half-wins (2 per decisive win, 1 per draw),
    * `n_comparisons` the row's matchup count including draws. */
  def matchupCounts(
      df: DataFrame,
      winnerCol: String,
      loserCol: String,
      draws: Option[DataFrame] = None
  ): DataFrame = {
    def cleaned(in: DataFrame, what: String): DataFrame = in
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .select(
        when(col(winnerCol) === col(loserCol), raise_error(concat(
          lit(s"bradleyTerry: player '"), col(winnerCol).cast("string"),
          lit(s"' $what itself — a self-comparison carries no signal; "),
          lit("drop it upstream")))).otherwise(col(winnerCol)).as("__w"),
        col(loserCol).as("__l"))
    val matches = cleaned(df, "beat")
    // counts in HALF-WIN units so a DRAW stays an exact integer (1 unit
    // each way vs 2 for a decisive win; the MM update is jointly scale-
    // invariant in W and n, and doubling is an exact exponent shift, so
    // without draws the strengths are bit-identical to whole-win units
    // — the q264 oracle replays in whole wins and stays hash-green).
    // Directed rows carry (units, decisive-win flag, draw flag).
    val decisive = matches
      .select(col("__w").as("__i"), col("__l").as("__j"),
        lit(2L).as("__u"), lit(1L).as("__dw"), lit(0L).as("__dr"))
      .unionByName(matches.select(col("__l").as("__i"), col("__w").as("__j"),
        lit(0L).as("__u"), lit(0L).as("__dw"), lit(0L).as("__dr")))
    val drawn = draws.map { d =>
      val dd = cleaned(d, "drew with")
      dd.select(col("__w").as("__i"), col("__l").as("__j"),
          lit(1L).as("__u"), lit(0L).as("__dw"), lit(1L).as("__dr"))
        .unionByName(dd.select(col("__l").as("__i"), col("__w").as("__j"),
          lit(1L).as("__u"), lit(0L).as("__dw"), lit(1L).as("__dr")))
    }
    drawn.foldLeft(decisive)(_ unionByName _)
      .groupBy("__i", "__j")
      .agg(sum(col("__u")).as("win_units"), count(lit(1)).as("n_comparisons"),
        sum(col("__dw")).as("n_wins"), sum(col("__dr")).as("n_draws"))
      .select(col("__i").as("player"), col("__j").as("opponent"),
        col("win_units"), col("n_comparisons"), col("n_wins"), col("n_draws"))
  }

  /** [[bradleyTerry]] from ACCUMULATED [[matchupCounts]] — the serving/
    * maintenance entry point: merge standing counts with an increment
    * (integer addition at (player, opponent) grain), re-fit from the
    * players²-bounded table; with counts FROM the same matches this is
    * bit-identical to [[bradleyTerry]] (it IS its tail). */
  def bradleyTerryFromCounts(
      counts: DataFrame,
      iters: Int = 4,
      alpha: Long = 1L
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(alpha >= 1, "alpha must be >= 1 (an unsmoothed undefeated " +
      "player diverges and a winless one pins to zero)")
    // smoothing adds alpha phantom wins each way per OBSERVED matchup
    // (2·alpha half-win units)
    val edges = graft.Checkpoints.trackCache(counts
      .select(col("player").as("__i"), col("opponent").as("__j"),
        col("n_wins").as("__rdw"), col("n_draws").as("__rdr"),
        col("n_comparisons").as("__rc"),
        (col("win_units") + lit(2L * alpha)).as("__wins"),
        (lit(2L) * col("n_comparisons") + lit(4L * alpha)).as("__n"))
      .persist())
    val totals = edges.groupBy("__i")
      .agg(sum(col("__wins")).as("__W"),
        sum(col("__rdw")).as("n_wins"), sum(col("__rdr")).as("n_draws"),
        sum(col("__rc")).as("n_matches"))
    var strengths = graft.Checkpoints.localCheckpoint(
      edges.select(col("__i")).distinct().withColumn("__p", lit(1.0)),
      resetStats = true)
    for (_ <- 1 to iters) {
      val withP = edges
        .join(strengths.select(col("__i"), col("__p").as("__pi")), Seq("__i"))
        .join(strengths.select(col("__i").as("__j"), col("__p").as("__pj")), Seq("__j"))
      val next = graft.Checkpoints.localCheckpoint(
        withP.groupBy("__i")
          .agg(aggregate(
            array_sort(collect_list(struct(col("__j").as("j"),
              (col("__n").cast("double") / (col("__pi") + col("__pj"))).as("d")))),
            lit(0.0), (acc, x) => acc + x.getField("d")).as("__den"))
          .join(totals.select(col("__i"), col("__W")), Seq("__i"))
          .select(col("__i"), (col("__W").cast("double") / col("__den")).as("__p")),
        resetStats = true)
      graft.Checkpoints.free(strengths)
      strengths = next
    }
    // scale-invariance pin: report relative to the binary-smallest
    // player (one broadcast scalar — never an ordered global sum)
    val ref = strengths
      .agg(min(struct(col("__i").as("i"), col("__p").as("p"))).as("__r"))
      .select(col("__r.p").as("__pref"))
    strengths.crossJoin(broadcast(ref))
      .join(totals.select(col("__i"), col("n_wins"), col("n_draws"),
        col("n_matches")), Seq("__i"))
      .select(col("__i").as("player"), col("n_matches"), col("n_wins"),
        col("n_draws"),
        (round(col("__p") / col("__pref"), 6) + lit(0.0)).as("strength_r"))
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
      alpha: Long = 1L,
      maxConfusionCells: Long = 1L << 20
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
    guardConfusionCells(votes, nLabels, maxConfusionCells, "goldAnchoredConsensus")
    // estimation set: gold items only (their label is the gold label)
    val cur = graft.Checkpoints.localCheckpoint(g, resetStats = true)
    dsOutput(votes, dsScorePass(votes, cur, labels, nLabels, alpha, cur.count()),
      itemCol)
  }

  /** The confusion-broadcast ceiling shared by [[dawidSkene]] and
    * [[goldAnchoredConsensus]]: both broadcast (judge, true, observed)-
    * grain confusion tables — |judges|·|labels|² cells. Fine for
    * LLM-judge panels (dozens of judges), silently OOM-prone for
    * crowd-label corpora (10⁵ workers × a wide alphabet), so the
    * degenerate shape refuses LOUDLY before any broadcast, like every
    * comparable contract (`MixMaxSources`, `maxHotKeys`,
    * `maxIncrementNodes`). One scalar action (distinct-judge count). */
  private def guardConfusionCells(
      votes: DataFrame,
      nLabels: Long,
      maxConfusionCells: Long,
      op: String
  ): Unit = {
    require(maxConfusionCells >= 1, "maxConfusionCells must be >= 1")
    val nJudges = votes.select(col("__j")).distinct().count()
    val cells = nJudges * nLabels * nLabels
    if (cells > maxConfusionCells)
      throw new IllegalArgumentException(
        s"$op: $nJudges judges x $nLabels labels^2 = $cells confusion cells " +
          s"exceeds maxConfusionCells=$maxConfusionCells — the per-judge " +
          "confusion tables are broadcast each round and would not fit. " +
          "Aggregate judges upstream (pool workers into cohorts) or use " +
          "judgeConsensus (scalar reliability, judge-grain only); raise " +
          "maxConfusionCells only if the driver can hold the table")
  }
}
