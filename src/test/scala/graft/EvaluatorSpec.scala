package graft

import org.apache.spark.sql.DataFrame

/** Port of `/root/reference/tests/test_criteria.py` plus the README
  * flagship query (FIXTURES.md F1/F4): same literal fixtures, same
  * hand-computed expectations. */
class EvaluatorSpec extends SparkSpec {

  import spark.implicits._

  /** F1 fixture (`tests/test_criteria.py:10-18`). */
  def sampleBids: DataFrame =
    Seq(
      ("A", 10L, 85L, 100000L),
      ("B", 5L, 90L, 95000L),
      ("C", 8L, 75L, 110000L)
    ).toDF("vendor", "experience", "methodology", "bid_amount")

  test("linear criterion (test_criteria.py:24-32)") {
    val result = new Evaluator()
      .linear("experience", 1.0, higherIsBetter = true)
      .evaluate(sampleBids)
    assert(result.columns.contains("score_experience"))
    assert(result.columns.contains("final_score"))
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_experience") == 100.0)
    assert(m("B").getAs[Double]("score_experience") == 0.0)
    assert(m("C").getAs[Double]("score_experience") == 60.0)
  }

  test("min_ratio criterion (test_criteria.py:34-42)") {
    val result = new Evaluator()
      .minRatio("bid_amount", 1.0)
      .evaluate(sampleBids)
    val m = byKey(result, "vendor")
    assert(m("B").getAs[Double]("score_bid_amount") == 100.0)
    assertNear(m("A").getAs[Double]("score_bid_amount"), 95.0)
  }

  test("direct criterion (test_criteria.py:44-50)") {
    val result = new Evaluator().direct("methodology", 1.0).evaluate(sampleBids)
    assert(result.columns.contains("score_methodology"))
    val m = byKey(result, "vendor")
    assert(m("B").getAs[Double]("score_methodology") == 90.0)
  }

  test("multiple criteria with ranking (test_criteria.py:52-61)") {
    val result = new Evaluator()
      .linear("experience", 0.3, higherIsBetter = true)
      .direct("methodology", 0.3)
      .minRatio("bid_amount", 0.4)
      .evaluate(sampleBids)
    assert(result.columns.contains("ranking"))
    assert(result.count() == 3)
    // rankings form a valid competition ranking starting at 1
    val ranks = rows(result).map(_.getAs[Long]("ranking")).sorted
    assert(ranks.head == 1L)
  }

  test("weight normalization (test_criteria.py:63-70)") {
    val ev = new Evaluator(normalizeWeights = true)
    ev.linear("experience", 2.0, higherIsBetter = true)
    ev.direct("methodology", 2.0)
    val result = ev.evaluate(sampleBids)
    // weights 2+2 normalize: final = (s1*2 + s2*2)/4, bounded by 100
    assert(rows(result).forall(_.getAs[Double]("final_score") <= 100.0))
  }

  test("basic formula value*10 (test_criteria.py:76-87)") {
    val result = new Evaluator()
      .formula("experience", 1.0, formula = "value * 10")
      .evaluate(sampleBids)
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_experience") == 100.0)
    assert(m("B").getAs[Double]("score_experience") == 50.0)
    assert(m("C").getAs[Double]("score_experience") == 80.0)
  }

  test("formula with statistics (test_criteria.py:89-101)") {
    val result = new Evaluator()
      .formula("experience", 1.0, formula = "(value - min) / (max - min) * 100")
      .evaluate(sampleBids)
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_experience") == 100.0)
    assert(m("B").getAs[Double]("score_experience") == 0.0)
    assert(m("C").getAs[Double]("score_experience") == 60.0)
  }

  test("formula with variables (test_criteria.py:103-117)") {
    val result = new Evaluator()
      .formula("bid_amount", 1.0,
        formula = "100 - abs(value - target) / target * 100",
        variables = Map("target" -> 100000.0))
      .evaluate(sampleBids)
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_bid_amount") == 100.0)
    assert(m("B").getAs[Double]("score_bid_amount") == 95.0)
    assert(m("C").getAs[Double]("score_bid_amount") == 90.0)
  }

  test("formula clipping to [0,100] (test_criteria.py:119-138)") {
    val high = new Evaluator()
      .formula("experience", 1.0, formula = "value * 100")
      .evaluate(sampleBids)
    assert(rows(high).forall { r =>
      val s = r.getAs[Double]("score_experience"); s >= 0.0 && s <= 100.0
    })
    val low = new Evaluator()
      .formula("experience", 1.0, formula = "value - 20")
      .evaluate(sampleBids)
    assert(rows(low).forall(_.getAs[Double]("score_experience") == 0.0))
  }

  test("formula error -> 0.0 (test_criteria.py:140-148)") {
    val result = new Evaluator()
      .formula("experience", 1.0, formula = "1 / 0")
      .evaluate(sampleBids)
    assert(rows(result).forall(_.getAs[Double]("score_experience") == 0.0))
  }

  test("formula math functions sqrt/clip (test_criteria.py:150-159)") {
    val result = new Evaluator()
      .formula("experience", 1.0, formula = "clip(sqrt(value) * 30, 0, 100)")
      .evaluate(sampleBids)
    assert(rows(result).forall { r =>
      val s = r.getAs[Double]("score_experience"); s >= 0.0 && s <= 100.0
    })
    // sqrt(10)*30 = 94.868..., sqrt(5)*30 = 67.082..., sqrt(8)*30 = 84.852...
    val m = byKey(result, "vendor")
    assertNear(m("A").getAs[Double]("score_experience"), math.sqrt(10.0) * 30)
  }

  test("formula via from_config (test_criteria.py:161-187)") {
    val config = Map(
      "experience" -> Map("type" -> "formula", "weight" -> 1.0, "formula" -> "value * 10"))
    val result = Evaluator.fromConfig(config).evaluate(sampleBids)
    assert(byKey(result, "vendor")("A").getAs[Double]("score_experience") == 100.0)

    val config2 = Map(
      "bid_amount" -> Map("type" -> "formula", "weight" -> 1.0,
        "formula" -> "100 - abs(value - target) / target * 100",
        "variables" -> Map("target" -> 100000)))
    val result2 = Evaluator.fromConfig(config2).evaluate(sampleBids)
    assert(byKey(result2, "vendor")("A").getAs[Double]("score_bid_amount") == 100.0)
  }

  test("formula alongside other criteria (test_criteria.py:189-201)") {
    val result = new Evaluator()
      .linear("experience", 0.3, higherIsBetter = true)
      .formula("methodology", 0.3, formula = "value")
      .minRatio("bid_amount", 0.4)
      .evaluate(sampleBids)
    assert(result.count() == 3)
    Seq("score_experience", "score_methodology", "score_bid_amount", "ranking")
      .foreach(c => assert(result.columns.contains(c)))
  }

  test("README flagship query (README.md:59-84, FIXTURES.md F4)") {
    // NOTE: the README's printed output (88.33/66.67/40.00) is stale — the
    // reference library itself produces 100/74/51.92 for this input (verified
    // by executing /root/reference/bid_evaluation directly). We match the
    // library, which is the semantic source of truth.
    val bids = Seq(
      ("A", 50000000L, 8L),
      ("B", 45000000L, 10L),
      ("C", 52000000L, 6L)
    ).toDF("vendor", "bid_amount", "experience")
    val result = new Evaluator()
      .minRatio("bid_amount", 0.6)
      .linear("experience", 0.4)
      .evaluate(bids)
    val m = byKey(result, "vendor")
    assertNear(m("B").getAs[Double]("final_score"), 100.0, 1e-8)
    assertNear(m("A").getAs[Double]("final_score"), 74.0, 1e-8)
    assertNear(m("C").getAs[Double]("final_score"), 51.923076923076923, 1e-8)
    assertNear(m("A").getAs[Double]("score_bid_amount"), 54.0, 1e-8)
    assertNear(m("A").getAs[Double]("score_experience"), 20.0, 1e-8)
    assert(m("B").getAs[Long]("ranking") == 1L)
    assert(m("A").getAs[Long]("ranking") == 2L)
    assert(m("C").getAs[Long]("ranking") == 3L)
    // output is sorted by ranking
    assert(rows(result).map(_.getAs[String]("vendor")) == Seq("B", "A", "C"))
  }

  test("last-wins criterion registry (evaluator.py:255-257, example_custom.py:58-71)") {
    val ev = new Evaluator()
      .linear("experience", 0.5)
      .minRatio("experience", 1.0) // replaces the linear criterion on same column
    assert(ev.criteria.size == 1)
    assert(ev.criteria.head._2.typeName == "MinimumRatioCriterion")
    assert(ev.getTotalWeight == 1.0)
  }

  test("builtin custom functions (evaluator.py:239-251)") {
    val result = new Evaluator()
      .custom("bid_amount", 1.0, "proximity_to_mean")
      .evaluate(sampleBids)
    // mean = (100000+95000+110000)/3 = 101666.66..; A: 100-|100000-m|/m*100
    val m = byKey(result, "vendor")
    val mean = (100000.0 + 95000.0 + 110000.0) / 3
    assertNear(m("A").getAs[Double]("score_bid_amount"),
      100.0 - math.abs((100000.0 - mean) / mean) * 100.0, 1e-9)
    intercept[IllegalArgumentException] {
      new Evaluator().custom("x", 1.0, "nope")
    }
  }

  test("empty criteria -> final_score 0, rank 1 (evaluator.py:311-312)") {
    val result = new Evaluator().evaluate(sampleBids)
    assert(rows(result).forall(_.getAs[Double]("final_score") == 0.0))
    assert(rows(result).forall(_.getAs[Long]("ranking") == 1L))
  }

  test("degenerate constant column -> all 100 (criteria.py:38-39)") {
    val df = Seq(("A", 5L), ("B", 5L), ("C", 5L)).toDF("vendor", "x")
    val result = new Evaluator().linear("x", 1.0).evaluate(df)
    assert(rows(result).forall(_.getAs[Double]("score_x") == 100.0))
  }

  test("include_details=false omits score columns (evaluator.py:294-295)") {
    val result = new Evaluator()
      .linear("experience", 1.0)
      .evaluate(sampleBids, includeDetails = false)
    assert(!result.columns.contains("score_experience"))
    assert(result.columns.contains("final_score"))
  }

  test("threshold bands; later band wins on overlap (criteria.py:59-74)") {
    val df = Seq(("A", 5.0), ("B", 15.0), ("C", 25.0), ("D", 99.0)).toDF("vendor", "x")
    val result = new Evaluator()
      .threshold("x", 1.0, Seq((0.0, 10.0, 20.0), (10.0, 20.0, 50.0), (20.0, 30.0, 80.0)))
      .evaluate(df)
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_x") == 20.0)
    assert(m("B").getAs[Double]("score_x") == 50.0)
    assert(m("C").getAs[Double]("score_x") == 80.0)
    assert(m("D").getAs[Double]("score_x") == 0.0) // unmatched -> 0

    // overlapping bands: the later band overwrites (sequential masks)
    val overlap = new Evaluator()
      .threshold("x", 1.0, Seq((0.0, 30.0, 10.0), (10.0, 20.0, 99.0)))
      .evaluate(df)
    val mo = byKey(overlap, "vendor")
    assert(mo("B").getAs[Double]("score_x") == 99.0)
    assert(mo("A").getAs[Double]("score_x") == 10.0)
  }

  test("direct criterion input scale (evaluator.py:152-168)") {
    val df = Seq(("A", 5.0), ("B", 10.0)).toDF("vendor", "x")
    val result = new Evaluator().direct("x", 1.0, inputScale = 10.0).evaluate(df)
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_x") == 50.0)
    assert(m("B").getAs[Double]("score_x") == 100.0)
  }

  test("summary frame (evaluator.py:331-344)") {
    val ev = new Evaluator()
      .linear("experience", 3.0)
      .minRatio("bid_amount", 1.0)
    val s = rows(ev.summary(spark))
    assert(s.size == 2)
    assert(s.head.getAs[String]("type") == "LinearCriterion")
    assertNear(s.head.getAs[Double]("normalized_weight"), 0.75)
  }
}
