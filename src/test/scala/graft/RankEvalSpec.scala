package graft

import org.apache.spark.sql.functions._

import graft.ops.RankEval

/** Graded ranking-quality evaluation (MRR / P@k / recall@k / nDCG@k). */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  // run: q1 misses at rank 1, hits at 2 and 3; q2 retrieves only
  // non-relevant; q4 is retrieved but never judged
  private val run = Seq(
    (1L, 50L, 1), (1L, 10L, 2), (1L, 20L, 3),
    (2L, 60L, 1), (2L, 61L, 2),
    (4L, 70L, 1)
  ).toDF("qid", "doc", "rank")

  // qrels: q1 has grades 3/1 retrieved + grade 2 never retrieved + a
  // zero judgment (ignored); q2 judged all-zero (no positives); q3
  // judged positive but never answered
  private val qrels = Seq(
    (1L, 10L, 3), (1L, 20L, 1), (1L, 90L, 2), (1L, 50L, 0),
    (2L, 60L, 0),
    (3L, 80L, 2)
  ).toDF("qid", "doc", "rel")

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("rankingMetrics: hand-computed MRR/P/recall/nDCG, null and zero conventions") {
    val got = byKey(RankEval.rankingMetrics(
      run, qrels, "qid", "doc", "rank", "rel", k = 3), "qid")
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    val q1 = got(1L)
    assert(q1.getAs[Long]("n_judged") == 3L)
    assert(q1.getAs[Long]("n_retrieved") == 3L && q1.getAs[Long]("n_hits") == 2L)
    assert(q1.getAs[Double]("mrr_r") == 0.5) // first hit at rank 2
    assert(q1.getAs[Double]("precision_r") == 0.666667) // 2 of k=3
    assert(q1.getAs[Double]("recall_r") == 0.666667) // 2 of 3 judged
    val dcg = 3.0 / log2(3.0) + 1.0 / log2(4.0) // hits at ranks 2, 3
    val idcg = 3.0 / log2(2.0) + 2.0 / log2(3.0) + 1.0 / log2(4.0)
    val wantNdcg = BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("ndcg_r") == wantNdcg, s"ndcg ${q1.getAs[Double]("ndcg_r")}")
    // AP@3: hits at ranks 2 (1st hit) and 3 (2nd hit) over 3 judged
    val wantMap = BigDecimal((1.0 / 2.0 + 2.0 / 3.0) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("map_r") == wantMap, s"map ${q1.getAs[Double]("map_r")}")
    // q2: judged but zero positives -> nothing to find, null rate metrics
    val q2 = got(2L)
    assert(q2.getAs[Long]("n_judged") == 0L && q2.getAs[Long]("n_retrieved") == 2L)
    assert(q2.isNullAt(q2.fieldIndex("mrr_r")) &&
      q2.isNullAt(q2.fieldIndex("recall_r")) && q2.isNullAt(q2.fieldIndex("ndcg_r")))
    assert(q2.getAs[Double]("precision_r") == 0.0)
    // q3: judged, never answered -> zeros
    val q3 = got(3L)
    assert(q3.getAs[Long]("n_judged") == 1L && q3.getAs[Long]("n_retrieved") == 0L)
    assert(q3.getAs[Double]("mrr_r") == 0.0 && q3.getAs[Double]("recall_r") == 0.0 &&
      q3.getAs[Double]("ndcg_r") == 0.0)
    // q4: retrieved, never judged -> null rate metrics, counts carried
    val q4 = got(4L)
    assert(q4.getAs[Long]("n_judged") == 0L && q4.getAs[Long]("n_retrieved") == 1L)
    assert(q4.isNullAt(q4.fieldIndex("ndcg_r")))
  }

  test("rankingMetrics: cutoff k drops deep hits; perfect run scores 1.0; dup judgment refuses") {
    // k = 1: only the rank-1 miss of q1 counts
    val k1 = byKey(RankEval.rankingMetrics(
      run, qrels, "qid", "doc", "rank", "rel", k = 1), "qid")(1L)
    assert(k1.getAs[Long]("n_hits") == 0L && k1.getAs[Double]("mrr_r") == 0.0 &&
      k1.getAs[Double]("ndcg_r") == 0.0)
    // a run that returns the judged docs best-first is a 1.0 across the board
    val perfect = Seq((1L, 10L, 1), (1L, 90L, 2), (1L, 20L, 3)).toDF("qid", "doc", "rank")
    val p = byKey(RankEval.rankingMetrics(
      perfect, qrels, "qid", "doc", "rank", "rel", k = 3), "qid")(1L)
    assert(p.getAs[Double]("mrr_r") == 1.0 && p.getAs[Double]("recall_r") == 1.0 &&
      p.getAs[Double]("ndcg_r") == 1.0 && p.getAs[Double]("precision_r") == 1.0 &&
      p.getAs[Double]("map_r") == 1.0)
    // duplicate (query, doc) judgment refuses loudly
    val dup = qrels.unionByName(Seq((1L, 10L, 2)).toDF("qid", "doc", "rel"))
    val e = intercept[Exception] {
      RankEval.rankingMetrics(run, dup, "qid", "doc", "rank", "rel", k = 3).collect()
    }
    assert(e.getMessage.contains("judged more than once"), e.getMessage)
  }

  test("rankingMetrics: nDCG ideal truncates at k (TREC) — surplus positives don't deflate") {
    // 5 judged positives, k = 2: the ideal is the best possible top-2
    // page (grades 5 and 4), NOT all five judged gains
    val manyQrels = Seq(
      (9L, 1L, 5), (9L, 2L, 4), (9L, 3L, 3), (9L, 4L, 2), (9L, 5L, 1)
    ).toDF("qid", "doc", "rel")
    // run hits grade 4 at rank 1 and grade 3 at rank 2
    val run2 = Seq((9L, 2L, 1), (9L, 3L, 2)).toDF("qid", "doc", "rank")
    val r = byKey(RankEval.rankingMetrics(
      run2, manyQrels, "qid", "doc", "rank", "rel", k = 2), "qid")(9L)
    val dcg = 4.0 / log2(2.0) + 3.0 / log2(3.0)
    val idcg = 5.0 / log2(2.0) + 4.0 / log2(3.0) // truncated at k = 2
    val want = BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ndcg_r") == want, s"ndcg ${r.getAs[Double]("ndcg_r")}")
    assert(r.getAs[Long]("n_judged") == 5L) // recall denominator untruncated
    assert(r.getAs[Double]("recall_r") == 0.4)
    // AP@2: hits at ranks 1 and 2, over ALL 5 judged (TREC divides by R)
    assert(r.getAs[Double]("map_r") == 0.4, s"map ${r.getAs[Double]("map_r")}")
    // a PERFECT top-k page scores exactly 1.0 even with surplus positives
    val perfect = Seq((9L, 1L, 1), (9L, 2L, 2)).toDF("qid", "doc", "rank")
    val p = byKey(RankEval.rankingMetrics(
      perfect, manyQrels, "qid", "doc", "rank", "rel", k = 2), "qid")(9L)
    assert(p.getAs[Double]("ndcg_r") == 1.0 && p.getAs[Double]("precision_r") == 1.0)
  }

  test("rankingMetrics: run-side duplicate within top-k and null rank refuse loudly") {
    val dupRun = run.unionByName(Seq((1L, 10L, 3)).toDF("qid", "doc", "rank"))
    val e = intercept[Exception] {
      RankEval.rankingMetrics(dupRun, qrels, "qid", "doc", "rank", "rel", k = 3).collect()
    }
    assert(e.getMessage.contains("retrieved more than once"), e.getMessage)
    // the same duplicate BEYOND the cutoff is fine (never double-counts)
    val deepDup = run.unionByName(Seq((1L, 10L, 9)).toDF("qid", "doc", "rank"))
    val ok = byKey(RankEval.rankingMetrics(
      deepDup, qrels, "qid", "doc", "rank", "rel", k = 3), "qid")(1L)
    assert(ok.getAs[Long]("n_hits") == 2L)
    val nullRun = run.select(col("qid"), col("doc"),
      when(col("doc") === 61L, lit(null)).otherwise(col("rank")).as("rank"))
    val e2 = intercept[Exception] {
      RankEval.rankingMetrics(nullRun, qrels, "qid", "doc", "rank", "rel", k = 3).collect()
    }
    assert(e2.getMessage.contains("null rank"), e2.getMessage)
  }

  test("compareRuns: planted improvement excludes 0, balanced noise doesn't, paired zeros stay zero") {
    // 40 queries, one relevant doc each
    val qrels40 = (1L to 40L).map(q => (q, 1L, 1)).toDF("qid", "doc", "rel")
    def runAt(rank: Long => Int) =
      (1L to 40L).map(q => (q, 1L, rank(q))).toDF("qid", "doc", "rank")
    // A hits at rank 2 everywhere, B at rank 1: a uniform +0.5 MRR lift
    val up = byKey(RankEval.compareRuns(
      runAt(_ => 2), runAt(_ => 1), qrels40,
      "qid", "doc", "rank", "rel", k = 3), "metric")
    val mrr = up("mrr_r")
    assert(mrr.getAs[Long]("n_queries") == 40L)
    assert(mrr.getAs[Double]("mean_a_r") == 0.5 && mrr.getAs[Double]("mean_b_r") == 1.0)
    assert(mrr.getAs[Double]("delta_r") == 0.5)
    assert(mrr.getAs[Double]("ci_low_r") > 0.0,
      s"uniform improvement must exclude 0: $mrr")
    assert(mrr.getAs[Double]("ci_low_r") == 0.5 && mrr.getAs[Double]("ci_high_r") == 0.5)
    // the SAME doc set both sides: precision/recall deltas are exactly 0
    assert(up("precision_r").getAs[Double]("delta_r") == 0.0 &&
      up("precision_r").getAs[Double]("ci_low_r") == 0.0 &&
      up("precision_r").getAs[Double]("ci_high_r") == 0.0)
    assert(up("recall_r").getAs[Double]("delta_r") == 0.0)
    assert(up("ndcg_r").getAs[Double]("ci_low_r") > 0.0)
    // balanced noise: half the queries improve, half regress by the same
    // amount — the paired CI must straddle 0
    val noise = byKey(RankEval.compareRuns(
      runAt(q => if (q % 2 == 0) 2 else 1), runAt(q => if (q % 2 == 0) 1 else 2),
      qrels40, "qid", "doc", "rank", "rel", k = 3), "metric")("mrr_r")
    assert(noise.getAs[Double]("ci_low_r") < 0.0 && noise.getAs[Double]("ci_high_r") > 0.0,
      s"balanced noise must include 0: $noise")
    // determinism under partitioning
    val a = RankEval.compareRuns(runAt(_ => 2), runAt(_ => 1), qrels40,
      "qid", "doc", "rank", "rel", 3).collect().map(_.toSeq).toSet
    val b = RankEval.compareRuns(runAt(_ => 2).repartition(7),
      runAt(_ => 1).repartition(3), qrels40.repartition(5),
      "qid", "doc", "rank", "rel", 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("compareRuns: qrels judging no queries emit explicit zero-count rows, not an empty frame") {
    val qrels40 = (1L to 40L).map(q => (q, 1L, 1)).toDF("qid", "doc", "rel")
    def runAt(rank: Long => Int) =
      (1L to 40L).map(q => (q, 1L, rank(q))).toDF("qid", "doc", "rank")
    // qrels with NO positive judgment anywhere (rel = 0 throughout):
    // every query has n_judged = 0, so nothing scores
    val none = RankEval.compareRuns(
      runAt(_ => 1), runAt(_ => 2),
      (100L to 110L).map(q => (q, 1L, 0)).toDF("qid", "doc", "rel"),
      "qid", "doc", "rank", "rel", k = 3)
    val rows = byKey(none, "metric")
    assert(rows.keySet == Set("mrr_r", "precision_r", "recall_r", "ndcg_r", "map_r"),
      s"one row per metric even with nothing judged: ${rows.keySet}")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 0L && r.getAs[Long]("replicas") == 0L)
      assert(r.isNullAt(r.fieldIndex("delta_r")) &&
        r.isNullAt(r.fieldIndex("ci_low_r")) && r.isNullAt(r.fieldIndex("ci_high_r")),
        s"zero-count rows carry null means/CI: $r")
    }
    // with anything judged, the skeleton must leave the output untouched
    val normal = byKey(RankEval.compareRuns(
      runAt(_ => 2), runAt(_ => 1), qrels40,
      "qid", "doc", "rank", "rel", k = 3), "metric")
    assert(normal.size == 5 && normal.values.forall(_.getAs[Long]("n_queries") == 40L))
  }

  test("rankingSummary: macro-average over judged queries only; partition invariance") {
    val s = RankEval.rankingSummary(run, qrels, "qid", "doc", "rank", "rel", k = 3)
      .head()
    // judged queries with positives: q1 and q3 (q2/q4 have none)
    assert(s.getAs[Long]("n_queries") == 2L)
    val per = byKey(RankEval.rankingMetrics(
      run, qrels, "qid", "doc", "rank", "rel", k = 3), "qid")
    def avg(c: String) = BigDecimal(
      (per(1L).getAs[Double](c) + per(3L).getAs[Double](c)) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getAs[Double]("mrr_r") == avg("mrr_r"))
    assert(s.getAs[Double]("ndcg_r") == avg("ndcg_r"))
    val a = RankEval.rankingMetrics(run, qrels, "qid", "doc", "rank", "rel", 3)
      .collect().map(_.toSeq).toSet
    val b = RankEval.rankingMetrics(run.repartition(7), qrels.repartition(5),
      "qid", "doc", "rank", "rel", 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
