package graft.ops

import org.apache.spark.sql.DataFrame
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
    * recall_r, ndcg_r)` — a query with no positive judgments reports
    * null mrr/recall/ndcg (nothing to find) and its retrieved count; a
    * judged query the run never answered reports zeros. */
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
    val g = qrels
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
            (log((x.getField("r") + 1L).cast("double")) / lit(ln2))).as("__dcg"))
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
            + lit(0.0)).as("ndcg_r"))
  }

  /** Macro-average of [[rankingMetrics]] over the JUDGED queries (the
    * TREC convention: unjudged queries can't score), each metric a
    * query-ordered fold divided by the judged-query count — one summary
    * row: `(n_queries, mrr_r, precision_r, recall_r, ndcg_r)`. */
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
      foldAvg("ndcg_r"))
  }
}
