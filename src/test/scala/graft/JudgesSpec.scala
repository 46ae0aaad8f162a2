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
}
