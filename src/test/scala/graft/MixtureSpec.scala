package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mixture, Sampling}

/** Loss-driven domain-mixture optimization (DoReMi-style linearized
  * multiplicative weights) and the acceptance-cut resample. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("domainReweight: hand-computed weights, smoothing floor, sum to 1") {
    // excess: a -> 0.5, b -> 0 (proxy better than ref clips), c -> 1.5
    val losses = Seq(
      ("a", 2.0, 2.5), ("b", 3.0, 2.0), ("c", 1.0, 2.5)
    ).toDF("domain", "ref_loss", "proxy_loss")
    val got = byKey(Mixture.domainReweight(
      losses, "domain", "ref_loss", "proxy_loss", eta = 2.0, smoothing = 0.1),
      "domain")
    // raw: 1+2*0.5=2, 1, 1+2*1.5=4; z=7 (sorted-domain fold)
    def expect(raw: Double) =
      BigDecimal(0.9 * (raw / 7.0) + 0.1 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a").getAs[Double]("weight_r") == expect(2.0))
    assert(got("b").getAs[Double]("weight_r") == expect(1.0))
    assert(got("c").getAs[Double]("weight_r") == expect(4.0))
    assert(got("a").getAs[Double]("excess_r") == 0.5)
    assert(got("b").getAs[Double]("excess_r") == 0.0)
    // uniform smoothing keeps every domain above c/K
    assert(got.values.forall(_.getAs[Double]("weight_r") > 0.1 / 3 - 1e-9))
    val total = got.values.map(_.getAs[Double]("weight_r")).sum
    assert(math.abs(total - 1.0) < 1e-5, s"weights sum to ~1, got $total")
  }

  test("domainReweight iterated: iters=1 ≡ single step; 2 rounds correct the over-weighted tail") {
    val losses = Seq(
      ("a", 2.0, 2.5), ("b", 3.0, 2.0), ("c", 1.0, 2.5)
    ).toDF("domain", "ref_loss", "proxy_loss")
    // iters = 1 is BIT-identical to the historical single-step output
    val one = Mixture.domainReweight(
      losses, "domain", "ref_loss", "proxy_loss", eta = 2.0, smoothing = 0.1)
      .collect().map(_.toSeq).toSet
    val oneExplicit = Mixture.domainReweight(
      losses, "domain", "ref_loss", "proxy_loss", eta = 2.0, smoothing = 0.1,
      iters = 1).collect().map(_.toSeq).toSet
    assert(one == oneExplicit)
    // two rounds: the MW replay in plain Scala — per round multiply by
    // (1 + η·excess), renormalize over the sorted-domain fold, mix
    // toward uniform — must match double for double
    val excess = Map("a" -> 0.5, "b" -> 0.0, "c" -> 1.5)
    var w = Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    for (_ <- 1 to 2) {
      val raw = w.map { case (d, wd) => d -> wd * (1.0 + 2.0 * excess(d)) }
      val z = raw.foldLeft(0.0)(_ + _._2)
      w = raw.map { case (d, r) => d -> (0.9 * (r / z) + 0.1 / 3) }
    }
    val two = byKey(Mixture.domainReweight(
      losses, "domain", "ref_loss", "proxy_loss", eta = 2.0, smoothing = 0.1,
      iters = 2), "domain")
    w.foreach { case (d, wd) =>
      val exp = BigDecimal(wd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(two(d).getAs[Double]("weight_r") == exp, s"domain $d")
    }
    // the fix the loop exists for: one round systematically over-weights
    // the low-excess tail relative to where the MW iteration is headed —
    // round 2 moves mass from b (excess 0) toward c (excess 1.5)
    val oneMap = one.map(r => r.head.asInstanceOf[String] ->
      r(2).asInstanceOf[Double]).toMap
    assert(two("b").getAs[Double]("weight_r") < oneMap("b"),
      "2-round fit must shrink the zero-excess domain a 1-round fit over-weights")
    assert(two("c").getAs[Double]("weight_r") > oneMap("c"))
    intercept[IllegalArgumentException] {
      Mixture.domainReweight(losses, "domain", "ref_loss", "proxy_loss", iters = 0)
    }
  }

  test("domainReweight: duplicate domain, null loss, bad params refuse loudly") {
    val dup = Seq(("a", 1.0, 2.0), ("a", 1.0, 3.0)).toDF("domain", "ref_loss", "proxy_loss")
    val e1 = intercept[IllegalArgumentException] {
      Mixture.domainReweight(dup, "domain", "ref_loss", "proxy_loss")
    }
    assert(e1.getMessage.contains("more than once"), e1.getMessage)
    val nul = Seq(("a", Some(1.0), None: Option[Double]))
      .toDF("domain", "ref_loss", "proxy_loss")
    val e2 = intercept[IllegalArgumentException] {
      Mixture.domainReweight(nul, "domain", "ref_loss", "proxy_loss")
    }
    assert(e2.getMessage.contains("null reference/proxy"), e2.getMessage)
    intercept[IllegalArgumentException] {
      Mixture.domainReweight(dup.limit(1), "domain", "ref_loss", "proxy_loss",
        smoothing = 1.0)
    }
    intercept[IllegalArgumentException] {
      Mixture.domainReweight(dup.limit(1), "domain", "ref_loss", "proxy_loss",
        eta = 0.0)
    }
  }

  test("resampleToMixture: acceptance-cut differential, invariance, missing domain drops") {
    val docs = (1L to 600L)
      .map(i => (i, if (i <= 300) "big" else if (i <= 500) "mid" else "small"))
      .toDF("id", "src")
    val weights = Seq(("big", 0.2), ("mid", 0.3)).toDF("domain", "weight_r")
    val got = Mixture.resampleToMixture(docs, "id", "src", weights,
      targetRows = 100L, salt = "s14")
    // differential: explicit per-row unit-hash cut with the same
    // acceptance arithmetic (target * w / n, capped at 1)
    val aBig = math.min(1.0, 100.0 * 0.2 / 300.0)
    val aMid = math.min(1.0, 100.0 * 0.3 / 200.0)
    val expected = docs
      .withColumn("u", Sampling.unitHash(col("id"), "s14"))
      .filter(
        (col("src") === "big" && col("u") < lit(aBig)) ||
        (col("src") === "mid" && col("u") < lit(aMid)))
      .select("id", "src").collect().map(_.toSeq).toSet
    assert(got.select("id", "src").collect().map(_.toSeq).toSet == expected)
    // the weightless domain vanished entirely
    assert(got.filter(col("src") === "small").count() == 0L)
    assert(expected.nonEmpty)
    // partitioning never moves a cut
    val re = Mixture.resampleToMixture(docs.repartition(17), "id", "src",
      weights, targetRows = 100L, salt = "s14")
      .select("id", "src").collect().map(_.toSeq).toSet
    assert(re == expected)
    // duplicate weight row refuses loudly
    val dupW = Seq(("big", 0.2), ("big", 0.4)).toDF("domain", "weight_r")
    val err = intercept[IllegalArgumentException] {
      Mixture.resampleToMixture(docs, "id", "src", dupW, targetRows = 10L)
    }
    assert(err.getMessage.contains("more than one"), err.getMessage)
  }

  test("resampleToMixtureTokens: token-weighted cuts, null tokens refuse") {
    // 'long' docs carry 10x the tokens of 'short' docs
    val docs = (1L to 400L)
      .map(i => (i, if (i <= 200) "long" else "short",
        if (i <= 200) 100L else 10L))
      .toDF("id", "src", "n_tok")
    val weights = Seq(("long", 0.5), ("short", 0.5)).toDF("domain", "weight_r")
    val got = Mixture.resampleToMixtureTokens(docs, "id", "src", weights,
      targetTokens = 4000L, tokenCol = "n_tok", salt = "t")
    // acceptance mirrors the explicit arithmetic: target*w/tokens capped
    val aLong = math.min(1.0, 4000.0 * 0.5 / 20000.0)   // 0.1
    val aShort = math.min(1.0, 4000.0 * 0.5 / 2000.0)   // 1.0
    val expected = docs
      .withColumn("u", Sampling.unitHash(col("id"), "t"))
      .filter((col("src") === "long" && col("u") < lit(aLong)) ||
        (col("src") === "short" && col("u") < lit(aShort)))
      .select("id", "src", "n_tok").collect().map(_.toSeq).toSet
    assert(got.select("id", "src", "n_tok").collect().map(_.toSeq).toSet == expected)
    // equal weights + token budget: both domains land near 2000 tokens
    val kept = got.groupBy("src").agg(sum("n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("short") == 2000L, "uncapped domain keeps everything")
    assert(kept("long") > 1000L && kept("long") < 3000L,
      s"sampled domain lands near its token share, got ${kept("long")}")
    // null token counts refuse loudly
    val err = intercept[Exception] {
      Mixture.resampleToMixtureTokens(
        Seq((1L, "a", Some(5L)), (2L, "a", None: Option[Long]))
          .toDF("id", "src", "n_tok"),
        "id", "src", weights, 100L, "n_tok").collect()
    }
    assert(err.getMessage.contains("null token count"), err.getMessage)
  }

  test("resampleToMixture composes with domainReweight toward the budget") {
    // three sources, proxy lags ref most on 'c' -> c keeps the largest
    // share of its rows relative to its size
    val docs = (1L to 900L)
      .map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val losses = Seq(
      ("s0", 2.0, 2.0), ("s1", 2.0, 2.4), ("s2", 2.0, 3.2)
    ).toDF("domain", "ref_loss", "proxy_loss")
    val w = Mixture.domainReweight(losses, "domain", "ref_loss", "proxy_loss",
      eta = 1.0, smoothing = 0.0)
    val kept = Mixture.resampleToMixture(docs, "id", "src", w,
        targetRows = 300L, salt = "mix")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // all sources are 300 rows, so kept counts must order with weights
    assert(kept("s2") > kept("s1") && kept("s1") > kept("s0"),
      s"expected s2 > s1 > s0, got $kept")
  }
}
