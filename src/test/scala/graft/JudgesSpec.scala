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
}
