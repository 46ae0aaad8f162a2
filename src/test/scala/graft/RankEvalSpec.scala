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

  test("pooledJudgingSet: union of top-depth with provenance; dup rows collapse; judged flag") {
    val runs = Seq(
      (1L, 10L, "A", 1), (1L, 11L, "A", 2), (1L, 12L, "A", 3),
      (1L, 10L, "A", 2), // dup (run, q, doc): collapses, best rank kept
      (1L, 11L, "B", 1), (1L, 13L, "B", 2),
      (2L, 20L, "A", 1)
    ).toDF("qid", "doc", "system", "rank")
    val pool = RankEval.pooledJudgingSet(runs, "qid", "doc", "system", "rank",
        poolDepth = 2)
      .orderBy("qid", "doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // doc 12 is below depth; doc 10's dup collapses to one system
    assert(pool.toSeq == Seq(
      (1L, 10L, 1L, 1L, "A"), (1L, 11L, 2L, 1L, "A,B"),
      (1L, 13L, 1L, 2L, "B"), (2L, 20L, 1L, 1L, "A")), pool.mkString(", "))
    // judged flag: (1, 11) already judged -> the annotation queue is
    // everything else
    val j = Seq((1L, 11L, 2)).toDF("qid", "doc", "rel")
    val flagged = RankEval.pooledJudgingSet(runs, "qid", "doc", "system",
        "rank", poolDepth = 2, qrels = Some(j))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Boolean]("judged"))).toSet
    assert(flagged == Set((1L, 10L, false), (1L, 11L, true),
      (1L, 13L, false), (2L, 20L, false)))
    // partition invariance
    val x = RankEval.pooledJudgingSet(runs, "qid", "doc", "system", "rank", 2)
      .collect().map(_.toSeq).toSet
    val y = RankEval.pooledJudgingSet(runs.repartition(5), "qid", "doc",
      "system", "rank", 2).collect().map(_.toSeq).toSet
    assert(x == y)
  }

  test("teamDraftInterleave: differential vs a plain-Scala draft with the same coin; invariants") {
    // two systems over 3 queries with different overlaps and lengths
    // (q3's B list is short: exhaustion cedes picks to A)
    val runs = Seq(
      (1L, 10L, "sysA", 1), (1L, 11L, "sysA", 2), (1L, 12L, "sysA", 3),
      (1L, 13L, "sysA", 4),
      (1L, 11L, "sysB", 1), (1L, 14L, "sysB", 2), (1L, 10L, "sysB", 3),
      (1L, 15L, "sysB", 4),
      (2L, 20L, "sysA", 1), (2L, 21L, "sysA", 2),
      (2L, 21L, "sysB", 1), (2L, 20L, "sysB", 2),
      (3L, 30L, "sysA", 1), (3L, 31L, "sysA", 2), (3L, 32L, "sysA", 3),
      (3L, 33L, "sysB", 1)
    ).toDF("qid", "doc", "system", "rank")
    val out = RankEval.teamDraftInterleave(runs, "qid", "doc", "system",
        "rank", k = 4)
      .orderBy("qid", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3)))
    // the coin the operator uses, evaluated through the same expression
    def coin(q: Long, step: Int): Boolean =
      spark.range(1).select(
        (graft.ops.Bootstrap.unit(lit(q), lit(step)) < 0.5).as("c"))
        .head().getBoolean(0)
    // plain-Scala team draft with that coin
    val lists = Seq(1L, 2L, 3L).map { q =>
      val rows = runs.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getInt(3))).filter(_._1 == q)
      q -> (rows.filter(_._3 == "sysA").sortBy(_._4).map(_._2).toList,
        rows.filter(_._3 == "sysB").sortBy(_._4).map(_._2).toList)
    }.toMap
    val want = lists.toSeq.sortBy(_._1).flatMap { case (q, (la, lb)) =>
      var (sel, na, nb) = (List.empty[(Long, String)], 0, 0)
      for (step <- 1 to 4) {
        val pa = la.find(d => !sel.exists(_._1 == d))
        val pb = lb.find(d => !sel.exists(_._1 == d))
        val wantA = na < nb || (na == nb && coin(q, step))
        val pickA = (wantA && pa.isDefined) || (!wantA && pb.isEmpty && pa.isDefined)
        if (pickA) { sel :+= ((pa.get, "sysA")); na += 1 }
        else if (pb.isDefined) { sel :+= ((pb.get, "sysB")); nb += 1 }
      }
      sel.zipWithIndex.map { case ((d, t), i) => (q, i + 1, d, t) }
    }
    assert(out.toSeq == want, s"\nout=${out.toSeq}\nwant=$want")
    // invariants: no dup docs per query; team counts within 1 while
    // both lists live; each team's picks follow its own rank order
    for (q <- Seq(1L, 2L)) {
      val page = out.filter(_._1 == q)
      assert(page.map(_._3).distinct.length == page.length)
      val (ca, cb) = (page.count(_._4 == "sysA"), page.count(_._4 == "sysB"))
      assert(math.abs(ca - cb) <= 1, s"q$q counts $ca/$cb")
    }
    // q3: B exhausts after 1 doc, A cedes the rest
    assert(out.filter(_._1 == 3L).count(_._4 == "sysB") == 1)
    assert(out.filter(_._1 == 3L).length == 4)
    // three systems refuse loudly
    val e = intercept[Exception] {
      RankEval.teamDraftInterleave(
        runs.unionByName(Seq((1L, 99L, "sysC", 1))
          .toDF("qid", "doc", "system", "rank")),
        "qid", "doc", "system", "rank", k = 4)
    }
    assert(e.getMessage.contains("pairwise"))
    // dup (system, query, doc) refuses loudly
    val e2 = intercept[Exception] {
      RankEval.teamDraftInterleave(
        runs.unionByName(Seq((1L, 10L, "sysA", 9))
          .toDF("qid", "doc", "system", "rank")),
        "qid", "doc", "system", "rank", k = 4).collect()
    }
    assert(e2.getMessage.contains("appears twice"))
    // partition invariance
    val p2 = RankEval.teamDraftInterleave(runs.repartition(7), "qid", "doc",
        "system", "rank", k = 4)
      .collect().map(_.toSeq).toSet
    assert(p2 == out.map(x => Seq[Any](x._1, x._2, x._3, x._4)).toSet)
  }

  test("teamDraftMultileave: two systems reproduce the pairwise draft; k=3 page valid; credit long format") {
    val runs2 = Seq(
      (1L, 10L, "sysA", 1), (1L, 11L, "sysA", 2), (1L, 12L, "sysA", 3),
      (1L, 13L, "sysA", 4),
      (1L, 11L, "sysB", 1), (1L, 14L, "sysB", 2), (1L, 10L, "sysB", 3),
      (1L, 15L, "sysB", 4),
      (2L, 20L, "sysA", 1), (2L, 21L, "sysA", 2),
      (2L, 21L, "sysB", 1), (2L, 20L, "sysB", 2)
    ).toDF("qid", "doc", "system", "rank")
    // with exactly two systems the multileave IS the pairwise draft —
    // same coin, same ceding, row for row
    val pair = RankEval.teamDraftInterleave(runs2, "qid", "doc", "system",
      "rank", k = 4).collect().map(_.toSeq).toSet
    val multi = RankEval.teamDraftMultileave(runs2, "qid", "doc", "system",
      "rank", k = 4).collect().map(_.toSeq).toSet
    assert(multi == pair, s"\nmulti=$multi\npair=$pair")
    // three systems: no dup docs, picks follow each team's own order,
    // balanced counts while no list is exhausted
    val runs3 = runs2.unionByName(Seq(
      (1L, 40L, "sysC", 1), (1L, 41L, "sysC", 2), (1L, 42L, "sysC", 3),
      (2L, 50L, "sysC", 1)).toDF("qid", "doc", "system", "rank"))
    val out = RankEval.teamDraftMultileave(runs3, "qid", "doc", "system",
        "rank", k = 6)
      .orderBy("qid", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3)))
    val page1 = out.filter(_._1 == 1L)
    assert(page1.map(_._3).distinct.length == page1.length, "dup doc on page")
    assert(page1.length == 6)
    val byTeam = page1.groupBy(_._4).view.mapValues(_.map(_._3).toList).toMap
    // each team's picks appear in its own rank order
    assert(byTeam.getOrElse("sysC", Nil) ==
      byTeam.getOrElse("sysC", Nil).sorted)
    val cs = Seq("sysA", "sysB", "sysC").map(t => page1.count(_._4 == t))
    assert(cs.max - cs.min <= 1, s"unbalanced draft: $cs")
    // determinism + partition invariance
    val out2 = RankEval.teamDraftMultileave(runs3.repartition(7), "qid",
        "doc", "system", "rank", k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3))).toSet
    assert(out2 == out.toSet)
    // one system refuses
    val e = intercept[IllegalArgumentException] {
      RankEval.teamDraftMultileave(runs3.filter(col("system") === "sysA"),
        "qid", "doc", "system", "rank")
    }
    assert(e.getMessage.contains("k >= 2"))
    // long-format credit with the strict-max winner flag
    val page = Seq(
      (1L, 1, 10L, "sysA"), (1L, 2, 11L, "sysB"), (1L, 3, 12L, "sysC"),
      (1L, 4, 13L, "sysA")
    ).toDF("qid", "pos", "doc", "team")
    val clicks = Seq((1L, 1), (1L, 4), (1L, 2)).toDF("qid", "pos")
    val credit = RankEval.multileaveCredit(page, clicks, "qid", "pos")
      .orderBy("team")
      .collect().map(r => (r.getString(1), r.getLong(2),
        r.getAs[Boolean]("is_winner")))
    assert(credit.toSeq == Seq(("sysA", 2L, true), ("sysB", 1L, false),
      ("sysC", 0L, false)), credit.mkString(", "))
    // a tied top reports NO winner
    val credit2 = RankEval.multileaveCredit(page,
        Seq((1L, 1), (1L, 2)).toDF("qid", "pos"), "qid", "pos")
      .collect().map(r => r.getAs[Boolean]("is_winner"))
    assert(credit2.forall(!_))
  }

  test("multileavePreference: pairwise wins/ties from credit, absent teams at zero") {
    val credit = Seq(
      (1L, "A", 3L), (1L, "B", 1L), (1L, "C", 1L),
      (2L, "A", 0L), (2L, "B", 2L), // C absent from q2's page -> zero
      (3L, "A", 1L), (3L, "B", 1L)
    ).toDF("qid", "team", "clicks")
    val r = RankEval.multileavePreference(credit, "qid")
      .orderBy("team_a", "team_b")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      ("A", "B", 1L, 1L, 1L),
      ("A", "C", 2L, 0L, 1L),
      ("B", "C", 2L, 0L, 1L)), r.mkString(", "))
    // partition invariance
    val a = RankEval.multileavePreference(credit, "qid")
      .collect().map(_.toSeq).toSet
    val b = RankEval.multileavePreference(credit.repartition(5), "qid")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("interleaveCredit: clicks credit the owning team; silent queries report; dup clicks collapse") {
    val page = Seq(
      (1L, 1, 10L, "sysA"), (1L, 2, 11L, "sysB"), (1L, 3, 12L, "sysA"),
      (2L, 1, 20L, "sysB"), (2L, 2, 21L, "sysA")
    ).toDF("qid", "pos", "doc", "team")
    val clicks = Seq((1L, 1), (1L, 3), (1L, 3), (9L, 1))
      .toDF("qid", "pos") // dup click collapses; unknown query ignored
    val r = RankEval.interleaveCredit(page, clicks, "qid", "pos")
      .orderBy("qid")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getString(3)))
    assert(r.toSeq == Seq((1L, 2L, 0L, "sysA"), (2L, 0L, 0L, null)),
      r.mkString(", "))
  }
}
