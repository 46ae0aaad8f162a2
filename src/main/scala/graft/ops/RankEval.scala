package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RANKING-QUALITY evaluation for the retrieval family — the offline
  * eval loop a RAG / search pipeline runs after every index or model
  * change: score a RUN (the system's ranked results per query, e.g.
  * [[Retrieval.bm25Search]] / [[Similarity.ivfTopKPreassigned]] output)
  * against graded RELEVANCE JUDGMENTS (qrels), per query and
  * macro-averaged. The reference has no retrieval surface; this extends
  * the engine the way [[Similarity.recallAtK]] does for ANN, adding the
  * graded metrics a lexical/RAG stack reports (TREC's vocabulary:
  * MRR, P@k, recall@k, nDCG@k).
  *
  * Determinism contract (oracle-replayable): hit counts and relevance
  * gains are exact integers; MRR is one division off the integer first
  * hit rank; DCG folds its terms in RANK order and iDCG in
  * (gain DESC, doc ASC) order TRUNCATED at k (the TREC nDCG@k ideal:
  * only the k best judged gains enter the denominator) — both as
  * ordered folds over collected
  * struct arrays (the q84 sorted-fold convention), and the log2 in the
  * discount is spelled `ln(x) / ln(2)` so both engines run the same
  * libm calls (the BM25/PSI `ln` portability precedent). Ratios round
  * 6dp through Spark's `round` (+0.0 normalizes -0).
  *
  * Scale shape: one equi-join of the run's top-k rows against the
  * qrels at (query, doc) grain, then ONE hash aggregation per query
  * with k-bounded collect buffers (k is the evaluation cutoff — tens,
  * never the corpus), plus a qrels-side aggregation at query grain for
  * the recall denominator and ideal DCG. No windows over the run, no
  * driver state; |queries| rows out.
  */
object RankEval {

  /** Per-query ranking metrics of `run` against `qrels`.
    *
    * @param run   ranked results: one row per (query, doc) with a
    *              1-based rank column (ties/gaps are the caller's
    *              contract — [[graft.ops.GroupTopK]] emits dense ranks).
    *              A null rank, or the same (query, doc) retrieved at
    *              two ranks within top-k, refuses loudly
    * @param qrels graded judgments: one row per (query, doc) with an
    *              integer relevance gain; gain <= 0 rows are ignored
    *              (TREC convention: judged non-relevant). A (query,
    *              doc) judged twice refuses loudly.
    * @param k     evaluation cutoff: run rows with rank > k are ignored
    *
    * Output per query (queries present in EITHER side):
    * `(queryCol, n_judged, n_retrieved, n_hits, mrr_r, precision_r,
    * recall_r, ndcg_r, map_r)` — a query with no positive judgments
    * reports null rate metrics (nothing to find) and its retrieved
    * count; a judged query the run never answered reports zeros.
    * `map_r` is average precision at k under the TREC convention:
    * Σ over hits of (hit index / rank), divided by n_judged (ALL
    * judged positives, not min(R, k)) — binary relevance (gain > 0),
    * terms folded in rank order. */
  def rankingMetrics(
      run: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ln2 = math.log(2.0)
    // clean graded judgments; duplicate (query, doc) refuses loudly —
    // a silent last-wins would move every metric of the query
    val g0 = qrels
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(relCol).isNotNull)
      .groupBy(col(queryCol).as("__q"), col(docCol).as("__d"))
      .agg(count(lit(1)).as("__c"), min(col(relCol).cast("long")).as("__g"))
      .select(col("__q"), col("__d"),
        when(col("__c") > 1, raise_error(concat(
          lit("rankingMetrics: document '"), col("__d").cast("string"),
          lit("' judged more than once for query '"), col("__q").cast("string"),
          lit("' — resolve judgments upstream")))).otherwise(col("__g")).as("__g"))
      .filter(col("__g") > 0)
    // the cleaned judgments feed BOTH the ideal-DCG aggregate and the
    // run join: when qrels is itself a derivation (the q278/q282 shape
    // scans the corpus to synthesize judgments) each consumer re-runs
    // it — barrier deep inputs once at judged-(query, doc) grain
    val g = graft.Checkpoints.localCheckpointIfDeep(g0)
    // per-query judgment-side totals: recall denominator + ideal DCG
    // (gains folded best-first, doc ASC on ties — engine-portable).
    // The ideal is TRUNCATED at k (TREC nDCG@k: iDCG = DCG of the best
    // possible top-k page) — the fold keeps counting judged positives
    // for n_judged but stops accumulating discount terms at rank k, so
    // a perfect top-k run scores ndcg_r = 1.0 even with surplus
    // positives.
    val ideal = g.groupBy("__q")
      .agg(count(lit(1)).as("n_judged"),
        aggregate(
          array_sort(collect_list(struct((-col("__g")).as("ng"), col("__d").as("d")))),
          struct(lit(0.0).as("s"), lit(0L).as("i")),
          (acc, x) => struct(
            when(acc.getField("i") < lit(k.toLong),
              acc.getField("s") + (-x.getField("ng")).cast("double") /
                (log((acc.getField("i") + 2L).cast("double")) / lit(ln2)))
              .otherwise(acc.getField("s")).as("s"),
            (acc.getField("i") + 1L).as("i")),
          acc => acc.getField("s")).as("__idcg"))
    // the run's top-k rows joined to the positive judgments. A null
    // rank refuses loudly (mirrors the qrels-side dup discipline — a
    // malformed run must not silently shrink n_retrieved), and so does
    // the same (query, doc) retrieved at two ranks within top-k (it
    // would double-count n_hits/DCG; recall could exceed 1).
    val topk = run
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull)
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        when(col(rankCol).isNull, raise_error(concat(
          lit("rankingMetrics: null rank for query '"),
          col(queryCol).cast("string"), lit("', document '"),
          col(docCol).cast("string"),
          lit("' — every run row must carry a rank"))))
          .otherwise(col(rankCol).cast("long")).as("__r"))
      .filter(col("__r") <= k)
      .groupBy("__q", "__d")
      .agg(count(lit(1)).as("__c"), min(col("__r")).as("__r"))
      .select(col("__q"), col("__d"),
        when(col("__c") > 1, raise_error(concat(
          lit("rankingMetrics: document '"), col("__d").cast("string"),
          lit("' retrieved more than once within top-k for query '"),
          col("__q").cast("string"),
          lit("' — dedup the run upstream")))).otherwise(col("__r")).as("__r"))
    val scored = topk.join(g, Seq("__q", "__d"), "left")
      .groupBy("__q")
      .agg(count(lit(1)).as("n_retrieved"),
        sum(when(col("__g").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        min(when(col("__g").isNotNull, col("__r"))).as("__first"),
        // DCG folds hit contributions in rank order: gain / log2(rank+1)
        aggregate(
          array_sort(collect_list(struct(col("__r").as("r"),
            coalesce(col("__g"), lit(0L)).as("g")))),
          lit(0.0),
          (acc, x) => acc + x.getField("g").cast("double") /
            (log((x.getField("r") + 1L).cast("double")) / lit(ln2))).as("__dcg"),
        // average-precision numerator folds P@r at each hit in rank
        // order, carrying the running hit count (binary relevance)
        aggregate(
          array_sort(collect_list(struct(col("__r").as("r"),
            coalesce(col("__g"), lit(0L)).as("g")))),
          struct(lit(0.0).as("s"), lit(0L).as("h")),
          (acc, x) => struct(
            when(x.getField("g") > 0L,
              acc.getField("s") + (acc.getField("h") + 1L).cast("double") /
                x.getField("r").cast("double"))
              .otherwise(acc.getField("s")).as("s"),
            when(x.getField("g") > 0L, acc.getField("h") + 1L)
              .otherwise(acc.getField("h")).as("h")),
          acc => acc.getField("s")).as("__apnum"))
    scored.join(ideal, Seq("__q"), "full")
      .select(col("__q").as(queryCol),
        coalesce(col("n_judged"), lit(0L)).as("n_judged"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_judged").isNull, lit(null).cast("double"))
          .otherwise(coalesce(
            round(lit(1.0) / col("__first").cast("double"), 6) + lit(0.0),
            lit(0.0))).as("mrr_r"),
        (round(coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          + lit(0.0)).as("precision_r"),
        when(col("n_judged").isNull, lit(null).cast("double"))
          .otherwise(round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_judged").cast("double"), 6) + lit(0.0)).as("recall_r"),
        when(col("n_judged").isNull, lit(null).cast("double"))
          .otherwise(round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6)
            + lit(0.0)).as("ndcg_r"),
        when(col("n_judged").isNull, lit(null).cast("double"))
          .otherwise(round(coalesce(col("__apnum"), lit(0.0)) /
            col("n_judged").cast("double"), 6) + lit(0.0)).as("map_r"))
  }

  /** Macro-average of [[rankingMetrics]] over the JUDGED queries (the
    * TREC convention: unjudged queries can't score), each metric a
    * query-ordered fold divided by the judged-query count — one summary
    * row: `(n_queries, mrr_r, precision_r, recall_r, ndcg_r, map_r)`
    * (`map_r` here IS the classic MAP: the mean of per-query average
    * precision). */
  def rankingSummary(
      run: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relCol: String,
      k: Int
  ): DataFrame = {
    val per = rankingMetrics(run, qrels, queryCol, docCol, rankCol, relCol, k)
      .filter(col("n_judged") > 0)
    def foldAvg(c: String) = (round(
      aggregate(
        array_sort(collect_list(struct(col(queryCol).as("q"), col(c).as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v")) /
        count(lit(1)).cast("double"), 6) + lit(0.0)).as(c)
    per.agg(count(lit(1)).as("n_queries"),
      foldAvg("mrr_r"), foldAvg("precision_r"), foldAvg("recall_r"),
      foldAvg("ndcg_r"), foldAvg("map_r"))
  }

  /** Paired A/B comparison of two runs on the SAME qrels — the eval
    * loop's real question after an index or model change: is run B
    * better than run A, and is the difference distinguishable from
    * query-sampling noise? Per judged query, [[rankingMetrics]] scores
    * both runs; the per-query metric DELTAS (B − A) are paired (the
    * qrels-side difficulty cancels), and a deterministic Poisson
    * bootstrap over QUERIES ([[Bootstrap]]'s md5-seeded one-pass
    * resampling, keyed on the query id so both the CI and every
    * re-run agree bit for bit) puts a percentile CI on the mean delta.
    * A CI excluding 0 is a detectable change at the chosen level.
    *
    * Output: one row per metric (`metric`, `n_queries`, `mean_a_r`,
    * `mean_b_r`, `delta_r`, `ci_low_r`, `ci_high_r`, `replicas`).
    * Means and deltas are query-ordered folds of the ROUNDED per-query
    * values (the [[rankingSummary]] convention); replica means fold
    * `w · delta` in query order and divide by the exact integer weight
    * sum; the CI interpolates with Spark's exact `percentile` (DuckDB
    * `quantile_cont`-portable). Scale shape: two [[rankingMetrics]]
    * passes, one |queries|-grain join, then a replicas-way explode into
    * one metric-grain aggregation — the collect buffers hold |judged
    * queries| entries, the evaluation grain (thousands), never corpus
    * rows.
    *
    * Qrels that judge NO queries still emit one row per metric with
    * `n_queries = 0`, `replicas = 0`, and null means/deltas/CI (the
    * [[rankingSummary]] zero-count convention) — callers gating on the
    * CI row see an explicit zero-count signal, never a silently empty
    * frame. */
  def compareRuns(
      runA: DataFrame,
      runB: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relCol: String,
      k: Int,
      replicas: Int = 200,
      low: Double = 0.025,
      high: Double = 0.975
  ): DataFrame = {
    require(replicas >= 10, "need at least 10 replicas for a CI")
    require(0.0 < low && low < high && high < 1.0, "need 0 < low < high < 1")
    val ms = Seq("mrr_r", "precision_r", "recall_r", "ndcg_r", "map_r")
    def judged(run: DataFrame, tag: String) =
      rankingMetrics(run, qrels, queryCol, docCol, rankCol, relCol, k)
        .filter(col("n_judged") > 0)
        .select(col(queryCol).as("__q") +: ms.map(m => col(m).as(s"${tag}_$m")): _*)
    // same qrels ⇒ identical judged-query sets on both sides (a judged
    // query the run never answered still scores — zeros), so the inner
    // join IS the full pairing
    val paired = judged(runA, "__a").join(judged(runB, "__b"), Seq("__q"))
    // `long` feeds BOTH the base means and the replica bootstrap: without
    // a barrier each branch re-evaluates the full A and B metric
    // pipelines (runA/runB are typically whole retrieval stacks — q282
    // pays four BM25 corpus passes instead of two). Deep inputs
    // checkpoint once at judged-query grain — k-bounded rows, tiny.
    val long0 = paired
      .select(col("__q"), explode(array(ms.map(m => struct(
        lit(m).as("metric"), col(s"__a_$m").as("va"),
        col(s"__b_$m").as("vb"))): _*)).as("__x"))
      .select(col("__q"), col("__x.metric").as("metric"),
        col("__x.va").as("__va"), col("__x.vb").as("__vb"),
        (col("__x.vb") - col("__x.va")).as("__d"))
    val long = graft.Checkpoints.localCheckpointIfDeep(long0)
    def foldAvg(c: String, out: String) = (round(
      aggregate(
        array_sort(collect_list(struct(col("__q").as("q"), col(c).as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v")) /
        count(lit(1)).cast("double"), 6) + lit(0.0)).as(out)
    val base = long.groupBy("metric").agg(
      count(lit(1)).as("n_queries"),
      foldAvg("__va", "mean_a_r"), foldAvg("__vb", "mean_b_r"),
      foldAvg("__d", "delta_r"))
    val weighted = long
      .select(col("metric"), col("__q"), col("__d"),
        explode(sequence(lit(0), lit(replicas - 1))).as("__b"))
      .withColumn("__w",
        Bootstrap.poissonWeight(Bootstrap.unit(col("__q"), col("__b"))))
    val perReplica = weighted
      .groupBy("metric", "__b")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("__q").as("q"),
            (col("__w").cast("double") * col("__d")).as("wd")))),
          lit(0.0), (acc, x) => acc + x.getField("wd")).as("__num"),
        sum(col("__w")).as("__den"))
      .filter(col("__den") > 0L)
      .select(col("metric"), (col("__num") / col("__den").cast("double")).as("__m"))
    val ci = perReplica.groupBy("metric").agg(
      percentile(col("__m"), array(lit(low), lit(high))).as("__ci"),
      count(lit(1)).as("replicas"))
      .select(col("metric"),
        (round(col("__ci").getItem(0), 6) + lit(0.0)).as("ci_low_r"),
        (round(col("__ci").getItem(1), 6) + lit(0.0)).as("ci_high_r"),
        col("replicas"))
    val computed = base.join(ci, Seq("metric"))
      .select(col("metric"), col("n_queries"), col("mean_a_r"),
        col("mean_b_r"), col("delta_r"), col("ci_low_r"), col("ci_high_r"),
        col("replicas"))
    // no-judged-queries contract: emit an explicit n_queries = 0 row
    // per metric (nulls for means/CI) instead of an empty frame — the
    // skeleton anti-joins against the computed rows, so any judged
    // query at all leaves the output byte-identical to `computed`
    // (every judged query scores all five metrics)
    import runA.sparkSession.implicits._
    val skeleton = ms.toDF("metric").select(
      col("metric"), lit(0L).as("n_queries"),
      lit(null).cast("double").as("mean_a_r"),
      lit(null).cast("double").as("mean_b_r"),
      lit(null).cast("double").as("delta_r"),
      lit(null).cast("double").as("ci_low_r"),
      lit(null).cast("double").as("ci_high_r"),
      lit(0L).as("replicas"))
    computed.unionByName(
      skeleton.join(computed.select("metric"), Seq("metric"), "left_anti"))
  }

  /** TREC-STYLE JUDGING POOL — the step between running retrieval
    * systems and paying annotators: the union of every run's top
    * `poolDepth` results per query, one row per (query, doc) with its
    * provenance — how many systems surfaced it (`n_runs`), the best
    * rank any gave it (`best_rank`), the contributing system names
    * (`systems`, comma-joined in name order), and — when existing
    * judgments are passed — whether it is already `judged` (the
    * annotation queue is the `judged = false` slice). Duplicate
    * (run, query, doc) rows within the depth collapse (provenance
    * counts SYSTEMS, not rows); null ranks are ignored.
    *
    * Scale shape: one hash aggregation at pool grain
    * (≤ |queries| · |systems| · depth rows — an evaluation page, never
    * a corpus) + one left join against the judgments at (query, doc)
    * grain. No windows, no driver state. */
  def pooledJudgingSet(
      runs: DataFrame,
      queryCol: String,
      docCol: String,
      systemCol: String,
      rankCol: String,
      poolDepth: Int = 10,
      qrels: Option[DataFrame] = None
  ): DataFrame = {
    require(poolDepth >= 1, "poolDepth must be >= 1")
    val pool = runs
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(rankCol).isNotNull && col(rankCol).cast("long") <= poolDepth)
      .groupBy(col(queryCol), col(docCol))
      .agg(
        countDistinct(col(systemCol)).as("n_runs"),
        min(col(rankCol).cast("long")).as("best_rank"),
        concat_ws(",", array_sort(collect_set(col(systemCol).cast("string"))))
          .as("systems"))
    qrels match {
      case None => pool
      case Some(j) =>
        val judged = j.select(col(queryCol), col(docCol)).distinct()
          .withColumn("__judged", lit(true))
        pool.join(judged, Seq(queryCol, docCol), "left")
          .withColumn("judged", coalesce(col("__judged"), lit(false)))
          .drop("__judged")
    }
  }

  /** TEAM-DRAFT INTERLEAVING (Radlinski–Kurup–Joachims) — the online
    * A/B for rankers: two systems' lists merge into ONE page, each
    * position owned by the team that picked it, and clicks credit the
    * owning team ([[interleaveCredit]]). Per query and step the team
    * with fewer picks drafts its best not-yet-shown document; a tied
    * count flips a DETERMINISTIC coin (md5 over (query, step) — the
    * [[compareRuns]] bootstrap convention, so replays and the oracle
    * agree); a team whose list is exhausted cedes the pick. `runs`
    * must carry EXACTLY two distinct system names (refused loudly
    * otherwise — interleaving is pairwise); team "a" is the
    * lexicographically smaller name. Duplicate (system, query, doc)
    * rows refuse loudly (the draft's remove-by-id would silently drop
    * both). Output: `(queryCol, pos, docCol, team)` — `pos` 1-based,
    * `team` the drafting system's name.
    *
    * Scale shape: the per-query draft is a sequential greedy by
    * nature; it runs as an ordered fold over the two collected
    * k-bounded lists (the [[Retrieval.mmrRerank]] HOF convention) —
    * per-query state only, no driver loop, no window over the runs.
    * Feed top-k pages (rank ≤ `maxRunLength` enforced loudly), never
    * corpora. */
  def teamDraftInterleave(
      runs: DataFrame,
      queryCol: String,
      docCol: String,
      systemCol: String,
      rankCol: String,
      k: Int = 10,
      maxRunLength: Int = 1024
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRunLength >= 1, "maxRunLength must be >= 1")
    val spark = runs.sparkSession
    val sys2 = runs.select(col(systemCol).cast("string")).distinct()
      .orderBy(col(systemCol)).collect().map(_.getString(0)).toSeq
    require(sys2.length == 2,
      s"teamDraftInterleave is pairwise: need exactly 2 systems, got $sys2")
    val Seq(nameA, nameB) = sys2
    val clean = runs
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(rankCol).isNotNull)
      .groupBy(col(queryCol).as("__q"), col(systemCol).cast("string").as("__s"),
        col(docCol).as("__d"))
      .agg(count(lit(1)).as("__c"), min(col(rankCol).cast("long")).as("__r"))
      .select(col("__q"), col("__s"), col("__d"),
        when(col("__c") > 1, raise_error(concat(
          lit("teamDraftInterleave: document '"), col("__d").cast("string"),
          lit("' appears twice in system '"), col("__s"),
          lit("' for query '"), col("__q").cast("string"),
          lit("' — dedupe the runs upstream")))).otherwise(col("__r")).as("__r"))
      .select(col("__q"), col("__s"), col("__d"),
        when(col("__r") > maxRunLength, raise_error(concat(
          lit(s"teamDraftInterleave: rank beyond maxRunLength=$maxRunLength "),
          lit("for query '"), col("__q").cast("string"),
          lit("' — feed top-k pages, not corpora")))).otherwise(col("__r"))
          .as("__r"))
    def listOf(s: String) = array_sort(collect_list(
      when(col("__s") === s, struct(col("__r").as("r"), col("__d").as("doc")))))
    val grouped = clean.groupBy("__q").agg(
      listOf(nameA).as("__la"), listOf(nameB).as("__lb"))
    // the draft fold: accumulator (sel: picked structs, na, nb); each
    // step resolves the drafting team (counts, then the md5 coin),
    // takes that team's best unpicked doc, cedes to the other team on
    // an exhausted list, and stops (acc unchanged) when both are dry
    val docsOf = (sel: Column) => transform(sel, p => p.getField("doc"))
    def headAvail(lst: Column, sel: Column): Column =
      element_at(filter(lst,
        c => !array_contains(docsOf(sel), c.getField("doc"))), 1)
    val zero = struct(
      slice(transform(col("__la"), c => struct(c.getField("doc").as("doc"),
        lit("").as("team"))), 1, 0).as("sel"),
      lit(0L).as("na"), lit(0L).as("nb"))
    val folded = aggregate(
      sequence(lit(1), lit(k)), zero,
      (acc, step) => {
        val sel = acc.getField("sel")
        val pa = headAvail(col("__la"), sel)
        val pb = headAvail(col("__lb"), sel)
        val coinA = Bootstrap.unit(col("__q"), step) < 0.5
        val wantA = (acc.getField("na") < acc.getField("nb")) ||
          ((acc.getField("na") === acc.getField("nb")) && coinA)
        val pickA = (wantA && pa.isNotNull) || (!wantA && pb.isNull && pa.isNotNull)
        val pickB = !pickA && pb.isNotNull
        val pick = when(pickA, struct(pa.getField("doc").as("doc"),
            lit(nameA).as("team")))
          .when(pickB, struct(pb.getField("doc").as("doc"), lit(nameB).as("team")))
        when(pick.isNull, acc).otherwise(struct(
          concat(sel, array(pick)).as("sel"),
          (acc.getField("na") + when(pickA, 1L).otherwise(0L)).as("na"),
          (acc.getField("nb") + when(pickB, 1L).otherwise(0L)).as("nb")))
      },
      acc => acc.getField("sel"))
    grouped.select(col("__q"), posexplode(folded))
      .select(col("__q").as(queryCol), (col("pos") + 1).cast("int").as("pos"),
        col("col.doc").as(docCol), col("col.team").as("team"))
  }

  /** TEAM-DRAFT MULTILEAVING — [[teamDraftInterleave]] generalized to
    * k ≥ 2 systems (one page from ALL rankers under comparison, the
    * multileaved online eval): per step the ELIGIBLE teams (list not
    * yet exhausted) with the fewest picks tie-break through the same
    * md5 coin — the draw indexes into the tied teams in name order
    * (`floor(u · |tied|)`), so two systems reproduce
    * [[teamDraftInterleave]] draw for draw (spec-pinned). Same dup
    * refusal, same `maxRunLength` ceiling, same output shape:
    * `(queryCol, pos, docCol, team)`.
    *
    * Scale shape: the draft folds over k collected k-bounded lists at
    * evaluation grain — the accumulator adds a per-team pick-count
    * array, nothing else grows with k. */
  def teamDraftMultileave(
      runs: DataFrame,
      queryCol: String,
      docCol: String,
      systemCol: String,
      rankCol: String,
      k: Int = 10,
      maxRunLength: Int = 1024
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRunLength >= 1, "maxRunLength must be >= 1")
    val names = runs.select(col(systemCol).cast("string")).distinct()
      .orderBy(col(systemCol)).collect().map(_.getString(0)).toSeq
    require(names.length >= 2,
      s"teamDraftMultileave compares k >= 2 systems, got $names")
    val n = names.length
    val clean = runs
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(rankCol).isNotNull)
      .groupBy(col(queryCol).as("__q"), col(systemCol).cast("string").as("__s"),
        col(docCol).as("__d"))
      .agg(count(lit(1)).as("__c"), min(col(rankCol).cast("long")).as("__r"))
      .select(col("__q"), col("__s"), col("__d"),
        when(col("__c") > 1, raise_error(concat(
          lit("teamDraftMultileave: document '"), col("__d").cast("string"),
          lit("' appears twice in system '"), col("__s"),
          lit("' for query '"), col("__q").cast("string"),
          lit("' — dedupe the runs upstream"))))
          .when(col("__r") > maxRunLength, raise_error(concat(
            lit(s"teamDraftMultileave: rank beyond maxRunLength=$maxRunLength "),
            lit("for query '"), col("__q").cast("string"),
            lit("' — feed top-k pages, not corpora"))))
          .otherwise(col("__r")).as("__r"))
    def listOf(s: String) = array_sort(collect_list(
      when(col("__s") === s, struct(col("__r").as("r"), col("__d").as("doc")))))
    val grouped = clean.groupBy("__q")
      .agg(array(names.map(listOf): _*).as("__lists"))
    val teamNames = array(names.map(lit): _*)
    val docsOf = (sel: Column) => transform(sel, p => p.getField("doc"))
    def headAvail(lst: Column, sel: Column): Column =
      element_at(filter(lst,
        c => !array_contains(docsOf(sel), c.getField("doc"))), 1)
    val zero = struct(
      slice(transform(element_at(col("__lists"), 1),
        c => struct(c.getField("doc").as("doc"), lit("").as("team"))), 1, 0)
        .as("sel"),
      transform(sequence(lit(1), lit(n)), _ => lit(0L)).as("cnts"))
    val folded = aggregate(
      sequence(lit(1), lit(k)), zero,
      (acc, step) => {
        val sel = acc.getField("sel")
        val cnts = acc.getField("cnts")
        // per-team head of the unpicked remainder (null = exhausted)
        val heads = transform(sequence(lit(1), lit(n)),
          t => headAvail(element_at(col("__lists"), t), sel))
        val eligCnts = zip_with(cnts, heads,
          (c, h) => when(h.isNotNull, c))
        val minCnt = array_min(eligCnts)
        val tied = filter(sequence(lit(0), lit(n - 1)),
          t => element_at(heads, t + 1).isNotNull &&
            element_at(cnts, t + 1) === minCnt)
        val u = Bootstrap.unit(col("__q"), step)
        val idx = least(floor(u * size(tied)).cast("int"), size(tied) - 1)
        val ti = element_at(tied, idx + 1) // 0-based winning team index
        val pick = struct(
          element_at(heads, ti + 1).getField("doc").as("doc"),
          element_at(teamNames, ti + 1).as("team"))
        when(size(tied) === 0, acc).otherwise(struct(
          concat(sel, array(pick)).as("sel"),
          zip_with(cnts, sequence(lit(0), lit(n - 1)),
            (c, t) => c + when(t === ti, 1L).otherwise(0L)).as("cnts")))
      },
      acc => acc.getField("sel"))
    grouped.select(col("__q"), posexplode(folded))
      .select(col("__q").as(queryCol), (col("pos") + 1).cast("int").as("pos"),
        col("col.doc").as(docCol), col("col.team").as("team"))
  }

  /** Click credit for a [[teamDraftMultileave]] page in LONG format:
    * one row per (query, team) with its click count and an
    * `is_winner` flag (the strict maximum — a tied top reports no
    * winner, the pairwise [[interleaveCredit]] convention). Teams that
    * drafted no position for a query report zero clicks for it. */
  def multileaveCredit(
      interleaved: DataFrame,
      clicks: DataFrame,
      queryCol: String,
      posCol: String
  ): DataFrame = {
    val clicked = clicks.select(col(queryCol), col(posCol).cast("int").as("pos"))
      .distinct().withColumn("__clicked", lit(1L))
    // ONE linear pipeline: the per-team counts feed two stacked windows
    // over the same query partitioning (the max, then the count of rows
    // AT the max — a window expression cannot reference a sibling
    // window, so they sequence, but share one exchange + sort). The old
    // shape read perTeam from THREE branches (max join, count-of-max,
    // final join): each consumer re-ran the multileave page fold under
    // it — q313 measured 3 page evaluations per run — which forced a
    // checkpoint barrier; with single consumption the barrier itself
    // is unnecessary and the draft runs exactly once in-plan.
    val wQ = org.apache.spark.sql.expressions.Window.partitionBy(col(queryCol))
    interleaved
      .join(clicked, Seq(queryCol, "pos"), "left")
      .groupBy(col(queryCol), col("team"))
      .agg(coalesce(sum(col("__clicked")), lit(0L)).as("clicks"))
      .withColumn("__mx", max(col("clicks")).over(wQ))
      .withColumn("__nmx",
        sum(when(col("clicks") === col("__mx"), 1L).otherwise(0L)).over(wQ))
      .withColumn("is_winner",
        col("clicks") === col("__mx") && col("__nmx") === 1)
      .drop("__mx", "__nmx")
  }

  /** PAIRWISE PREFERENCE MATRIX over a [[teamDraftMultileave]] credit
    * readout — who beats whom: for every unordered system pair, the
    * number of queries where each side drew strictly more clicks (ties
    * counted separately; queries where a side drafted nothing score it
    * zero — [[multileaveCredit]] already emits the zero rows for teams
    * ON the page, and a team absent from a query's page entirely is
    * treated as zero clicks here too). Output one row per pair:
    * `(team_a, team_b, wins_a, wins_b, ties)` with `team_a` the
    * lexicographically smaller name. One self-join of the per-query
    * credit at query grain + one pair-grain aggregation. */
  def multileavePreference(
      credit: DataFrame,
      queryCol: String
  ): DataFrame = {
    // the credit frame is read FIVE times below (team alphabet, query
    // set, densify join, both self-join sides): when it is itself a
    // composed multileave readout (page fold + credit joins), repeating
    // that subtree per consumer multiplies a huge plan — q314 measured
    // minutes at sf0.001 on plan/codegen repetition alone. One barrier
    // makes every consumer read materialized rows (r9 discipline:
    // shallow spec inputs skip the checkpoint and keep their exchange).
    val credit0 = graft.Checkpoints.localCheckpointIfDeep(credit)
    val teams = credit0.select(col("team").cast("string")).distinct()
    val queries = credit0.select(col(queryCol)).distinct()
    // densify: every (query, team) cell, absent ones at zero clicks
    val dense = queries.crossJoin(broadcast(teams))
      .join(credit0.select(col(queryCol), col("team"),
        col("clicks").cast("long").as("clicks")), Seq(queryCol, "team"), "left")
      .withColumn("clicks", coalesce(col("clicks"), lit(0L)))
    val a = dense.select(col(queryCol), col("team").as("team_a"),
      col("clicks").as("__ca"))
    val b = dense.select(col(queryCol), col("team").as("team_b"),
      col("clicks").as("__cb"))
    a.join(b, Seq(queryCol))
      .filter(col("team_a") < col("team_b"))
      .groupBy(col("team_a"), col("team_b"))
      .agg(
        coalesce(sum(when(col("__ca") > col("__cb"), 1L)), lit(0L)).as("wins_a"),
        coalesce(sum(when(col("__cb") > col("__ca"), 1L)), lit(0L)).as("wins_b"),
        coalesce(sum(when(col("__ca") === col("__cb"), 1L)), lit(0L)).as("ties"))
  }

  /** Click credit for a [[teamDraftInterleave]] page: clicks join the
    * interleaved page at (query, pos) grain and credit the position's
    * OWNING team; per query the higher credit wins. Output one row per
    * interleaved query: `(queryCol, clicks_a, clicks_b, winner)` —
    * `winner` is the winning system's name or null on a tie (including
    * the all-zero no-click query, which still reports: silence is
    * signal in an interleaving readout). Team "a" is the
    * lexicographically smaller system name, matching the interleave.
    * One broadcast-size join + one aggregation at query grain. */
  def interleaveCredit(
      interleaved: DataFrame,
      clicks: DataFrame,
      queryCol: String,
      posCol: String
  ): DataFrame = {
    val sys2 = interleaved.select(col("team")).distinct()
      .orderBy(col("team")).collect().map(_.getString(0)).toSeq
    require(sys2.nonEmpty && sys2.length <= 2,
      s"interleaveCredit: expected 1-2 team names, got $sys2")
    val nameA = sys2.head
    val nameB = if (sys2.length == 2) sys2(1) else sys2.head
    val clicked = clicks.select(col(queryCol), col(posCol).cast("int").as("pos"))
      .distinct().withColumn("__clicked", lit(1L))
    interleaved
      .join(clicked, Seq(queryCol, "pos"), "left")
      .groupBy(col(queryCol))
      .agg(
        coalesce(sum(when(col("team") === nameA, col("__clicked"))), lit(0L))
          .as("clicks_a"),
        coalesce(sum(when(col("team") === nameB && lit(sys2.length == 2),
          col("__clicked"))), lit(0L)).as("clicks_b"))
      .withColumn("winner",
        when(col("clicks_a") > col("clicks_b"), lit(nameA))
          .when(col("clicks_b") > col("clicks_a"), lit(nameB))
          .otherwise(lit(null).cast("string")))
  }
}
