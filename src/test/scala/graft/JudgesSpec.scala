package graft

import org.apache.spark.sql.functions._

import graft.ops.Judges

/** Ensemble-judge consensus (agreement-weighted voting). */
class JudgesSpec extends SparkSpec {
  import spark.implicits._

  private val votes = Seq(
    // items 1-6: judges a,b,c always label "good"; judge d is a coin
    // flipper that disagrees on 1-4 (reliability 2/6 = 0.333)
    (1L, "a", "good"), (1L, "b", "good"), (1L, "c", "good"), (1L, "d", "bad"),
    (2L, "a", "good"), (2L, "b", "good"), (2L, "c", "good"), (2L, "d", "bad"),
    (3L, "a", "good"), (3L, "b", "good"), (3L, "c", "good"), (3L, "d", "bad"),
    (4L, "a", "good"), (4L, "b", "good"), (4L, "c", "good"), (4L, "d", "bad"),
    (5L, "a", "good"), (5L, "b", "good"), (5L, "c", "good"), (5L, "d", "good"),
    (6L, "a", "good"), (6L, "b", "good"), (6L, "c", "good"), (6L, "d", "good"),
    // item 7: raw 1-1 split between judge c ("bad") and judge d ("good")
    // — raw majority ties to the binary-smaller "bad", and the WEIGHTED
    // vote keeps "bad" because c (reliability 1.0) outweighs d (0.333...
    // over items 1-6; on 7, c agrees with the tied-majority too)
    (7L, "c", "bad"), (7L, "d", "good")
  ).toDF("item", "judge", "label")

  test("agreement weighting: reliable judges outvote the flipper; ties go binary-smaller") {
    val got = byKey(Judges.judgeConsensus(votes, "item", "judge", "label"), "item")
    (1L to 6L).foreach { i =>
      assert(got(i).getAs[String]("consensus") == "good", s"item $i")
    }
    assert(got(5L).getAs[Boolean]("unanimous"))
    assert(!got(1L).getAs[Boolean]("unanimous"))
    assert(got(1L).getAs[Long]("n_judges") == 4L && got(1L).getAs[Long]("n_agree") == 3L)
    assert(got(1L).getAs[Double]("support_r") == 0.75)
    // item 7: weighted consensus follows the reliable judge
    assert(got(7L).getAs[String]("consensus") == "bad")
    assert(got(7L).getAs[Long]("n_agree") == 1L)
    // weighted share: rel(c)=1.0 (agrees with majority on all 7 of its
    // items), rel(d) = 3/7 (agrees on 5,6,7: d's "good" vs item-7 raw
    // majority "bad" -> 2/7... recompute from the op's own report below)
    val rels = byKey(Judges.judgeReliability(votes, "item", "judge", "label"), "judge")
    assert(rels("a").getAs[Double]("agree_rate_r") == 1.0)
    assert(rels("d").getAs[Double]("agree_rate_r") < 0.5)
  }

  test("pure majority when all judges are equally reliable; exact shares") {
    val v = Seq(
      (1L, "x", "A"), (1L, "y", "A"), (1L, "z", "B"),
      (2L, "x", "B"), (2L, "y", "B"), (2L, "z", "B")
    ).toDF("item", "judge", "label")
    val got = byKey(Judges.judgeConsensus(v, "item", "judge", "label"), "item")
    assert(got(1L).getAs[String]("consensus") == "A")
    assert(got(2L).getAs[String]("consensus") == "B" && got(2L).getAs[Boolean]("unanimous"))
    assertNear(got(1L).getAs[Double]("support_r"), 0.666667, 1e-9)
  }

  test("duplicate vote by one judge on one item refuses loudly") {
    val dup = Seq((1L, "a", "good"), (1L, "a", "bad"), (1L, "b", "good"))
      .toDF("item", "judge", "label")
    val err = intercept[Exception] {
      Judges.judgeConsensus(dup, "item", "judge", "label").collect()
    }
    assert(err.getMessage.contains("voted more than once"), err.getMessage)
  }

  test("consensus is partition-invariant") {
    val a = Judges.judgeConsensus(votes, "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    val b = Judges.judgeConsensus(votes.repartition(7), "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // ------------------------------------------------ Dawid–Skene (hard EM)

  /** 30 items, truth: 1–24 "g", 25–30 "b". Judge A is a rare-class
    * specialist, wrong on g-items 1–13 (votes "b"); B is perfect; D and
    * E rubber-stamp "g" everywhere. The raw majority is the TRUTH (the
    * 2–2 ties on 25–30 break toward the binary-smaller "b"), but the
    * SCALAR agreement weighting scores A at 17/30 ≈ 0.567 vs the
    * rubber-stampers' 0.8 each, so the weighted revote flips every
    * b-item to "g" — the failure per-label confusion fixes: DS sees A
    * is perfect ON CLASS b and the stampers are 1/8 there. */
  private val rareClassVotes = (1L to 30L).flatMap { i =>
    val truth = if (i <= 24) "g" else "b"
    Seq(
      (i, "A", if (i <= 13) "b" else truth),
      (i, "B", truth),
      (i, "D", "g"),
      (i, "E", "g"))
  }.toDF("item", "judge", "label")

  test("dawidSkene: per-label confusion defends the rare class where scalar weighting flips it") {
    val truth = (1L to 30L).map(i => i -> (if (i <= 24) "g" else "b")).toMap
    val ds = byKey(Judges.dawidSkene(rareClassVotes, "item", "judge", "label"), "item")
    (1L to 30L).foreach { i =>
      assert(ds(i).getAs[String]("consensus") == truth(i),
        s"DS item $i: got ${ds(i).getAs[String]("consensus")}, want ${truth(i)}")
    }
    // ...and the documented judgeConsensus failure mode: the scalar
    // weighted revote hands the b-items to the rubber-stampers
    val jc = byKey(Judges.judgeConsensus(rareClassVotes, "item", "judge", "label"), "item")
    (25L to 30L).foreach { i =>
      assert(jc(i).getAs[String]("consensus") == "g",
        "scalar weighting was expected to flip the rare class — " +
          "if this starts passing, the planted corpus no longer " +
          "separates the two aggregators")
    }
    // support columns ride the final consensus
    assert(ds(25L).getAs[Long]("n_judges") == 4L &&
      ds(25L).getAs[Long]("n_agree") == 2L &&
      ds(25L).getAs[Double]("support_r") == 0.5)
    assert(!ds(1L).getAs[Double]("logpost_r").isNaN)
  }

  test("dawidSkene: partition-invariant, bounded iters, validation") {
    val a = Judges.dawidSkene(rareClassVotes, "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    val b = Judges.dawidSkene(rareClassVotes.repartition(13), "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // one more round changes nothing on this corpus (the fixpoint holds)
    val c = Judges.dawidSkene(rareClassVotes, "item", "judge", "label", iters = 3)
      .collect().map(_.toSeq).toSet
    assert(c == a)
    intercept[IllegalArgumentException] {
      Judges.dawidSkene(rareClassVotes, "item", "judge", "label", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Judges.dawidSkene(rareClassVotes, "item", "judge", "label", alpha = 0)
    }
    val dup = Seq((1L, "a", "x"), (1L, "a", "y")).toDF("item", "judge", "label")
    val err = intercept[Exception] {
      Judges.dawidSkene(dup, "item", "judge", "label").collect()
    }
    assert(err.getMessage.contains("voted more than once"))
  }

  /** Truth: 1–20 "g", 21–30 "b". A and B are perfect; C, D, E
    * rubber-stamp "g" — a fully-correlated wrong MAJORITY on every
    * b-item, the basin no unsupervised method escapes (the raw
    * majority, the weighted vote, and EM-from-majority all say "g"
    * there). Four gold labels expose the stampers' b-class confusion
    * and the gold-anchored scoring recovers every b-item, gold or
    * not. */
  private val correlatedVotes = (1L to 30L).flatMap { i =>
    val truth = if (i <= 20) "g" else "b"
    Seq((i, "A", truth), (i, "B", truth),
      (i, "C", "g"), (i, "D", "g"), (i, "E", "g"))
  }.toDF("item", "judge", "label")

  test("goldAnchoredConsensus: gold exposes a fully-correlated wrong majority EM cannot escape") {
    val truth = (1L to 30L).map(i => i -> (if (i <= 20) "g" else "b")).toMap
    // the basin, documented: plain DS stays with the correlated majority
    val ds = byKey(Judges.dawidSkene(correlatedVotes, "item", "judge", "label"), "item")
    (21L to 30L).foreach { i =>
      assert(ds(i).getAs[String]("consensus") == "g",
        "EM-from-majority was expected to stay in the correlated basin — " +
          "if this starts passing, the planted corpus no longer shows " +
          "why gold anchoring exists")
    }
    // four gold items (two per class) anchor the confusions
    val gold = Seq((1L, "g"), (2L, "g"), (21L, "b"), (22L, "b"))
      .toDF("item", "gold")
    val ga = byKey(Judges.goldAnchoredConsensus(
      correlatedVotes, gold, "item", "judge", "label", "gold"), "item")
    (1L to 30L).foreach { i =>
      assert(ga(i).getAs[String]("consensus") == truth(i),
        s"gold-anchored item $i: got ${ga(i).getAs[String]("consensus")}")
    }
    // duplicate gold refuses loudly
    val dupGold = Seq((1L, "g"), (1L, "b")).toDF("item", "gold")
    val err = intercept[Exception] {
      Judges.goldAnchoredConsensus(
        correlatedVotes, dupGold, "item", "judge", "label", "gold").collect()
    }
    assert(err.getMessage.contains("more than one gold label"), err.getMessage)
  }

  test("consensusWithCounters: bit-identical to judgeConsensus from its own counters") {
    val counters = Judges.judgeCounters(votes, "item", "judge", "label")
    val got = Judges.consensusWithCounters(
        votes, counters, "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    val ref = Judges.judgeConsensus(votes, "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    assert(got == ref, "external counters from the same votes must replay exactly")
    // counters merge by addition: split + re-sum equals the union's counters
    val half1 = votes.filter(col("item") <= 3L)
    val half2 = votes.filter(col("item") > 3L)
    val merged = Judges.judgeCounters(half1, "item", "judge", "label")
      .unionByName(Judges.judgeCounters(half2, "item", "judge", "label"))
      .groupBy("judge")
      .agg(sum("n_judged").as("n_judged"), sum("n_agree").as("n_agree"))
      .collect().map(_.toSeq).toSet
    assert(merged == counters.collect().map(_.toSeq).toSet,
      "item-local majorities make counters additive across slices")
    // a judge with no track record weighs 0 but still counts in n_judges
    val known = counters.filter(col("judge") =!= "d")
    val res = byKey(Judges.consensusWithCounters(
      votes, known, "item", "judge", "label"), "item")
    assert(res(1L).getAs[Long]("n_judges") == 4L,
      "the weightless judge still counts as present")
    assert(res(1L).getAs[String]("consensus") == "good")
  }

  test("preferencePairs: best-vs-worst per item, margin gate, pinned ties") {
    val scored = Seq(
      // item 1: clear spread — (10, 50, 90) -> chosen 93, rejected 91
      (1L, 91L, 10.0), (1L, 92L, 50.0), (1L, 93L, 90.0),
      // item 2: gap 30 < margin 40 -> dropped
      (2L, 94L, 10.0), (2L, 95L, 40.0),
      // item 3: single candidate -> self-pair, dropped
      (3L, 96L, 70.0),
      // item 4: all equal -> best and worst collapse to 97, dropped
      (4L, 97L, 5.0), (4L, 98L, 5.0),
      // item 5: best-score tie between 90 and 91 -> binary-smaller 90
      (5L, 90L, 80.0), (5L, 91L, 80.0), (5L, 99L, 0.0)
    ).toDF("item", "cand", "score")
    val got = byKey(Judges.preferencePairs(
      scored, "item", "cand", "score", margin = 40.0), "item")
    assert(got.keySet == Set(1L, 5L))
    assert(got(1L).getAs[Long]("chosen") == 93L &&
      got(1L).getAs[Long]("rejected") == 91L)
    assert(got(1L).getAs[Double]("chosen_score") == 90.0 &&
      got(1L).getAs[Double]("rejected_score") == 10.0)
    assert(got(1L).getAs[Long]("n_candidates") == 3L)
    assert(got(5L).getAs[Long]("chosen") == 90L &&
      got(5L).getAs[Long]("rejected") == 99L)
    // a candidate scored twice on one item refuses loudly
    val dup = Seq((1L, 7L, 1.0), (1L, 7L, 2.0)).toDF("item", "cand", "score")
    val err = intercept[Exception] {
      Judges.preferencePairs(dup, "item", "cand", "score").collect()
    }
    assert(err.getMessage.contains("scored more than once"), err.getMessage)
  }

  test("bradleyTerry: planted dominance ordering and exact in-memory MM replay") {
    // A beats B 8/2, B beats C 8/2, A beats C 9/1 — strengths must
    // order A > B > C
    val duels = (
      Seq.fill(8)(("A", "B")) ++ Seq.fill(2)(("B", "A")) ++
      Seq.fill(8)(("B", "C")) ++ Seq.fill(2)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A"))
    ).toDF("winner", "loser")
    val got = byKey(Judges.bradleyTerry(duels, "winner", "loser",
      iters = 4, alpha = 1L), "player")
    val sA = got("A").getAs[Double]("strength_r")
    val sB = got("B").getAs[Double]("strength_r")
    val sC = got("C").getAs[Double]("strength_r")
    assert(sA > sB && sB > sC, s"expected A > B > C, got $sA / $sB / $sC")
    assert(sA == 1.0, "strengths are normalized to the binary-smallest player")
    assert(got("A").getAs[Long]("n_wins") == 17L &&
      got("A").getAs[Long]("n_matches") == 20L)
    // exact replay: the same MM rounds in memory, same fold order
    // (opponent-id ascending), same smoothing — strengths must match
    // the engine's doubles at the 6dp rounding exactly
    val players = Seq("A", "B", "C")
    val raw = Map(("A", "B") -> 8L, ("B", "A") -> 2L, ("B", "C") -> 8L,
      ("C", "B") -> 2L, ("A", "C") -> 9L, ("C", "A") -> 1L)
    val n = raw.keys.map { case (i, j) =>
      (i, j) -> (raw(i -> j) + raw(j -> i) + 2L)
    }.toMap
    val wins = raw.map { case ((i, j), w) => (i, j) -> (w + 1L) }
    val bigW = players.map(i =>
      i -> players.filter(_ != i).map(j => wins(i -> j)).sum).toMap
    var p = players.map(_ -> 1.0).toMap
    for (_ <- 1 to 4) {
      p = players.map { i =>
        val den = players.filter(_ != i).sorted
          .foldLeft(0.0)((acc, j) => acc + n(i -> j).toDouble / (p(i) + p(j)))
        i -> bigW(i).toDouble / den
      }.toMap
    }
    players.foreach { i =>
      val expect = BigDecimal(p(i) / p("A"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(i).getAs[Double]("strength_r") == expect,
        s"player $i: engine ${got(i).getAs[Double]("strength_r")} vs replay $expect")
    }
  }

  test("matchupCounts are additive: standing + increment re-fit equals the full fit") {
    val season1 = (Seq.fill(6)(("A", "B")) ++ Seq.fill(4)(("B", "C")) ++
      Seq.fill(2)(("C", "A"))).toDF("winner", "loser")
    val season2 = (Seq.fill(3)(("B", "A")) ++ Seq.fill(5)(("A", "C")))
      .toDF("winner", "loser")
    val standing = Judges.matchupCounts(season1, "winner", "loser")
    val inc = Judges.matchupCounts(season2, "winner", "loser")
    val merged = standing.unionByName(inc)
      .groupBy("player", "opponent")
      .agg(sum("win_units").as("win_units"),
        sum("n_comparisons").as("n_comparisons"),
        sum("n_wins").as("n_wins"), sum("n_draws").as("n_draws"))
    val incremental = Judges.bradleyTerryFromCounts(merged)
      .collect().map(_.toSeq).toSet
    val full = Judges.bradleyTerry(
        season1.unionByName(season2), "winner", "loser")
      .collect().map(_.toSeq).toSet
    assert(incremental == full,
      "merged standing+increment counts must re-fit to the full fit exactly")
  }

  test("bradleyTerry draws: half-wins pull strengths together, counts stay exact") {
    val decisive = (Seq.fill(8)(("A", "B")) ++ Seq.fill(2)(("B", "A")))
      .toDF("winner", "loser")
    val noDraws = byKey(Judges.bradleyTerry(decisive, "winner", "loser"), "player")
    // ten draws on top of the same decisive record: B gains ground
    val draws = Seq.fill(10)(("A", "B")).toDF("winner", "loser")
    val withDraws = byKey(Judges.bradleyTerry(decisive, "winner", "loser",
      draws = Some(draws)), "player")
    assert(withDraws("B").getAs[Double]("strength_r") >
      noDraws("B").getAs[Double]("strength_r"),
      "draws against a stronger player must raise the weaker one")
    assert(withDraws("A").getAs[Long]("n_draws") == 10L &&
      withDraws("A").getAs[Long]("n_wins") == 8L &&
      withDraws("A").getAs[Long]("n_matches") == 20L)
    // an all-draw pair lands dead even
    val even = byKey(Judges.bradleyTerry(
      Seq(("X", "Y")).toDF("winner", "loser"), "winner", "loser",
      draws = Some(Seq.fill(6)(("X", "Y")).toDF("winner", "loser"))), "player")
    // one decisive X win + 6 draws: X ahead but near even; draws-only is
    // degenerate (no decisive rows needed though): verify a pure-draw
    // matchup through a third player pair
    assert(even("X").getAs[Double]("strength_r") >
      even("Y").getAs[Double]("strength_r"))
    val pure = byKey(Judges.bradleyTerry(
      Seq(("P", "Q")).toDF("winner", "loser"), "winner", "loser",
      draws = Some(Seq.fill(50)(("R", "S")).toDF("winner", "loser"))), "player")
    assert(pure("R").getAs[Double]("strength_r") ==
      pure("S").getAs[Double]("strength_r"),
      "a pure-draw matchup must land exactly even")
    // self-draw refuses loudly
    val err = intercept[Exception] {
      Judges.bradleyTerry(decisive, "winner", "loser",
        draws = Some(Seq(("A", "A")).toDF("winner", "loser"))).collect()
    }
    assert(err.getMessage.contains("drew with itself"), err.getMessage)
  }

  test("bradleyTerry: partition-invariant, smoothing bounds extremes, self-duel refuses") {
    val duels = (
      Seq.fill(5)(("A", "B")) ++ Seq.fill(3)(("B", "C")) ++
      Seq.fill(2)(("C", "A")) ++ Seq.fill(4)(("A", "C"))
    ).toDF("winner", "loser")
    val one = Judges.bradleyTerry(duels.coalesce(1), "winner", "loser")
      .collect().map(_.toSeq).toSet
    val many = Judges.bradleyTerry(duels.repartition(13), "winner", "loser")
      .collect().map(_.toSeq).toSet
    assert(one == many, "strengths must not depend on partitioning")
    // an undefeated player stays finite and a winless one stays nonzero
    val sweep = Seq.fill(6)(("X", "Y")).toDF("winner", "loser")
    val s = byKey(Judges.bradleyTerry(sweep, "winner", "loser"), "player")
    assert(s("X").getAs[Double]("strength_r") > 0.0 &&
      !s("X").getAs[Double]("strength_r").isInfinite)
    assert(s("Y").getAs[Double]("strength_r") > 0.0)
    val err = intercept[Exception] {
      Judges.bradleyTerry(Seq(("A", "A")).toDF("winner", "loser"),
        "winner", "loser").collect()
    }
    assert(err.getMessage.contains("beat itself"), err.getMessage)
    val bad = intercept[IllegalArgumentException] {
      Judges.bradleyTerry(duels, "winner", "loser", alpha = 0L)
    }
    assert(bad.getMessage.contains("alpha"), bad.getMessage)
  }

  test("dawidSkenePosteriors: sum to 1 per item, argmax row ≡ hard output") {
    val post = Judges.dawidSkenePosteriors(rareClassVotes, "item", "judge", "label")
      .collect()
    val hard = byKey(Judges.dawidSkene(rareClassVotes, "item", "judge", "label"), "item")
    val byItem = post.groupBy(_.getAs[Long]("item"))
    assert(byItem.keySet == (1L to 30L).toSet)
    byItem.foreach { case (item, rows) =>
      // one row per alphabet label, posteriors sum to 1 at 6dp
      assert(rows.map(_.getAs[String]("label")).sorted.toSeq == Seq("b", "g"))
      val s = rows.map(_.getAs[Double]("posterior_r")).sum
      assert(math.abs(s - 1.0) <= 2e-6, s"item $item posteriors sum to $s")
      // exactly the hard winner's row is marked, and it carries the max
      val marked = rows.filter(_.getAs[Boolean]("is_consensus"))
      assert(marked.length == 1)
      assert(marked.head.getAs[String]("label") ==
        hard(item).getAs[String]("consensus"))
      assert(marked.head.getAs[Double]("posterior_r") ==
        rows.map(_.getAs[Double]("posterior_r")).max)
    }
    // partition invariance (the ordered folds are partition-free)
    val again = Judges.dawidSkenePosteriors(
      rareClassVotes.repartition(13), "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    assert(again == post.map(_.toSeq).toSet)
  }

  test("maxConfusionCells: a wide judge set refuses loudly, a panel passes") {
    // 600 judges x 2 labels^2 = 2400 cells > 1000 → loud refusal BEFORE
    // any broadcast; the same corpus passes with the ceiling raised
    val wide = (1 to 600).flatMap(j =>
      Seq((1L, s"j$j", "good"), (2L, s"j$j", "bad"))).toDF("item", "judge", "label")
    val e = intercept[IllegalArgumentException] {
      Judges.dawidSkene(wide, "item", "judge", "label", maxConfusionCells = 1000L)
    }
    assert(e.getMessage.contains("confusion cells") &&
      e.getMessage.contains("judgeConsensus"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Judges.goldAnchoredConsensus(wide, Seq((1L, "good")).toDF("item", "gold"),
        "item", "judge", "label", "gold", maxConfusionCells = 1000L)
    }
    assert(e2.getMessage.contains("confusion cells"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Judges.dawidSkenePosteriors(wide, "item", "judge", "label",
        maxConfusionCells = 1000L)
    }
    assert(e3.getMessage.contains("confusion cells"), e3.getMessage)
    // panel-sized passes under the same explicit ceiling
    assert(Judges.dawidSkene(rareClassVotes, "item", "judge", "label",
      maxConfusionCells = 1000L).count() == 30L)
  }

  test("pairwiseKappa: hand-computed kappa, degenerate null, dup refusal, judge ceiling") {
    // 4 items, judges a/b agree on 3 of 4 with mixed marginals:
    // a: hi,hi,lo,lo  b: hi,hi,lo,hi  -> agree=3, S = 2*3 + 2*1 = 8,
    // kappa = (3*4 - 8) / (16 - 8) = 0.5
    val votes = Seq(
      (1L, "a", "hi"), (2L, "a", "hi"), (3L, "a", "lo"), (4L, "a", "lo"),
      (1L, "b", "hi"), (2L, "b", "hi"), (3L, "b", "lo"), (4L, "b", "hi"),
      // judge c is CONSTANT hi: against any constant-hi-marginal pair,
      // kappa is undefined (n^2 == S) -> null
      (1L, "c", "hi"), (2L, "c", "hi"), (3L, "c", "hi"), (4L, "c", "hi")
    ).toDF("item", "judge", "label")
    val got = Judges.pairwiseKappa(votes, "item", "judge", "label").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("n_agree"),
          Option(r.getAs[java.lang.Double]("kappa_r"))))).toMap
    assert(got.size == 3)
    assert(got(("a", "b")) == ((4L, 3L, Some(0.5))))
    // c vs a: c constant -> S = 4 * (2 + 2)?? c marginals: hi=4; a: hi=2,lo=2
    // S = 2*4 = 8 (only 'hi' shared), n^2 = 16, agree = 2:
    // kappa = (8 - 8)/(16 - 8) = 0
    assert(got(("a", "c")) == ((4L, 2L, Some(0.0))))
    // b vs c share 3 'hi'; b: hi=3,lo=1; c: hi=4 -> S = 12, agree = 3,
    // kappa = (12-12)/(16-12) = 0
    assert(got(("b", "c")) == ((4L, 3L, Some(0.0))))
    // two constant judges with the SAME constant: n^2 == S -> null
    val both = Seq((1L, "x", "hi"), (2L, "x", "hi"),
      (1L, "y", "hi"), (2L, "y", "hi")).toDF("item", "judge", "label")
    val kNull = Judges.pairwiseKappa(both, "item", "judge", "label").collect().head
    assert(kNull.isNullAt(kNull.fieldIndex("kappa_r")))
    // dup vote refuses; too many judges refuses loudly before the join
    val e = intercept[Exception] {
      Judges.pairwiseKappa(votes.unionByName(
        Seq((1L, "a", "lo")).toDF("item", "judge", "label")),
        "item", "judge", "label").collect()
    }
    assert(e.getMessage.contains("voted more than once"), e.getMessage)
    val wide = (1 to 40).map(j => (1L, s"j$j", "hi")).toDF("item", "judge", "label")
    val e2 = intercept[IllegalArgumentException] {
      Judges.pairwiseKappa(wide, "item", "judge", "label", maxJudges = 10L)
    }
    assert(e2.getMessage.contains("pairs"), e2.getMessage)
    // partition invariance
    val a1 = Judges.pairwiseKappa(votes, "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    val a2 = Judges.pairwiseKappa(votes.repartition(7), "item", "judge", "label")
      .collect().map(_.toSeq).toSet
    assert(a1 == a2)
  }

  test("krippendorffAlpha: hand-computed alpha with missing votes, degenerate cases") {
    // Krippendorff's own worked shape: units with 2-3 ratings, one
    // abstention. Units: u1 (a,b,c)=hi,hi,hi; u2 (a,b)=hi,lo;
    // u3 (b,c)=lo,lo; u4 only a -> dropped (n_u < 2).
    val votes = Seq(
      (1L, "a", "hi"), (1L, "b", "hi"), (1L, "c", "hi"),
      (2L, "a", "hi"), (2L, "b", "lo"),
      (3L, "b", "lo"), (3L, "c", "lo"),
      (4L, "a", "hi")
    ).toDF("item", "judge", "label")
    val r = Judges.krippendorffAlpha(votes, "item", "judge", "label").head()
    assert(r.getAs[Long]("n_units") == 3L && r.getAs[Long]("n_ratings") == 7L)
    assert(r.getAs[Long]("n_labels") == 2L)
    // Do_sum: u1 contributes 0 (3 hi, m=3); u2: both labels 1*(2-1)=1
    // each -> 2, m=2; u3: 0. byM: m=2 -> 2, m=3 -> 0.
    // Do_sum = 2/1 + 0/2 = 2.0; Do = 2/7
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("do_r") == r6(2.0 / 7.0))
    // labels over kept units: hi=4, lo=3 -> D = 49 - (16+9) = 24;
    // De = 24/42; alpha = 1 - 2.0*6/24 = 0.5
    assert(r.getAs[Double]("de_r") == r6(24.0 / 42.0))
    assert(r.getAs[Double]("alpha_r") == 0.5, s"alpha ${r.getAs[Double]("alpha_r")}")
    // all-same-label corpus: expected disagreement 0 -> alpha null
    val same = Seq((1L, "a", "hi"), (1L, "b", "hi")).toDF("item", "judge", "label")
    val s0 = Judges.krippendorffAlpha(same, "item", "judge", "label").head()
    assert(s0.isNullAt(s0.fieldIndex("alpha_r")) && s0.getAs[Double]("do_r") == 0.0)
    // nothing co-judged: one null row, zero counts
    val lone = Seq((1L, "a", "hi"), (2L, "b", "lo")).toDF("item", "judge", "label")
    val l0 = Judges.krippendorffAlpha(lone, "item", "judge", "label").head()
    assert(l0.getAs[Long]("n_units") == 0L &&
      l0.isNullAt(l0.fieldIndex("alpha_r")))
    // partition invariance
    assert(Judges.krippendorffAlpha(votes.repartition(5), "item", "judge", "label")
      .head().toSeq == r.toSeq)
  }

  test("krippendorffAlpha interval: near-miss panels score above full splits; guards refuse") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def alpha(votes: org.apache.spark.sql.DataFrame): Double =
      Judges.krippendorffAlpha(votes, "item", "judge", "label",
        metric = "interval").head().getAs[Double]("alpha_r")
    // same marginal label SETS, different pairings: the near-miss panel
    // (4 vs 5 within units) must score ABOVE the full-split panel
    // (1 vs 5 within units) — exactly what nominal alpha cannot see
    val nearMiss = Seq(
      (1L, "a", 4L), (1L, "b", 5L),
      (2L, "a", 1L), (2L, "b", 1L),
      (3L, "a", 5L), (3L, "b", 4L)
    ).toDF("item", "judge", "label")
    val fullSplit = Seq(
      (1L, "a", 1L), (1L, "b", 5L),
      (2L, "a", 4L), (2L, "b", 4L),
      (3L, "a", 5L), (3L, "b", 1L)
    ).toDF("item", "judge", "label")
    assert(alpha(nearMiss) > alpha(fullSplit),
      s"near-miss ${alpha(nearMiss)} must beat full-split ${alpha(fullSplit)}")
    // hand-computed: units (1,2), (1,1), m=2 each.
    // S_u: 2*(2*(1+4) - 9) = 2; 2*(2*2 - 4) = 0 -> Do_sum = 2/1 = 2
    // global: n=4, Σv=5, Σv²=7 -> D = 2*(28-25) = 6
    // alpha = 1 - 2*3/6 = 0.0; de = 6/12 = 0.5; do = 2/4 = 0.5
    val hand = Seq(
      (1L, "a", 1L), (1L, "b", 2L),
      (2L, "a", 1L), (2L, "b", 1L)
    ).toDF("item", "judge", "label")
    val h = Judges.krippendorffAlpha(hand, "item", "judge", "label",
      metric = "interval").head()
    assert(h.getAs[Double]("alpha_r") == 0.0 &&
      h.getAs[Double]("do_r") == r6(0.5) && h.getAs[Double]("de_r") == r6(0.5),
      h.toString)
    // perfect graded agreement: Do = 0 -> alpha = 1
    val perfect = Seq(
      (1L, "a", 2L), (1L, "b", 2L),
      (2L, "a", 5L), (2L, "b", 5L)
    ).toDF("item", "judge", "label")
    assert(alpha(perfect) == 1.0)
    // non-numeric labels refuse loudly; fractional grades refuse loudly
    val bad = Seq((1L, "a", "good"), (1L, "b", "bad")).toDF("item", "judge", "label")
    val e1 = intercept[Exception] {
      Judges.krippendorffAlpha(bad, "item", "judge", "label",
        metric = "interval").collect()
    }
    assert(e1.getMessage.contains("numeric-castable"), e1.getMessage)
    val frac = Seq((1L, "a", 1.5), (1L, "b", 2.0)).toDF("item", "judge", "label")
    val e2 = intercept[Exception] {
      Judges.krippendorffAlpha(frac, "item", "judge", "label",
        metric = "interval").collect()
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    // nominal stays the default and unchanged
    val nom = Judges.krippendorffAlpha(nearMiss, "item", "judge", "label").head()
    assert(nom.getAs[Long]("n_ratings") == 6L)
    // partition invariance
    assert(Judges.krippendorffAlpha(nearMiss.repartition(5), "item", "judge",
        "label", metric = "interval").head().toSeq ==
      Judges.krippendorffAlpha(nearMiss, "item", "judge", "label",
        metric = "interval").head().toSeq)
  }
}
