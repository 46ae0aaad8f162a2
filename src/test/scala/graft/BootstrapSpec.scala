package graft

import org.apache.spark.sql.functions._

import graft.ops.Bootstrap

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight follows the Poisson(1) inverse CDF on pinned draws") {
    val draws = Seq(0.0, 0.3678, 0.368, 0.735, 0.736, 0.9999999, 0.5)
    val got = draws.toDF("u")
      .select(Bootstrap.poissonWeight(col("u")).as("w"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 1L, 2L, 8L, 1L))
  }

  test("CI brackets the true mean and is bit-stable under repartition") {
    val df = (1 to 2000).map(i => (i.toLong, (i % 100).toLong)).toDF("id", "x")
    val r1 = Bootstrap.meanCI(df, "id", "x", replicas = 100).head()
    val r2 = Bootstrap.meanCI(df.repartition(17), "id", "x", replicas = 100).head()
    assert(r1 == r2, "CI must not depend on partitioning")
    val (mean, lo, hi) = (r1.getAs[Double]("mean"),
      r1.getAs[Double]("ci_low"), r1.getAs[Double]("ci_high"))
    assert(mean == 49.5)
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    // sd(x) ~ 28.9, n = 2000 -> se ~ 0.65; the 95% CI half-width should be
    // in that regime, not degenerate and not wild
    assert(hi - lo > 0.5 && hi - lo < 5.0, s"implausible CI width ${hi - lo}")
    assert(r1.getAs[Long]("replicas") == 100L)
  }

  test("grouped CIs use the same draws as the global CI (slice consistency)") {
    val df = (1 to 600).map(i => (i.toLong, if (i % 3 == 0) "a" else "b",
      (i % 50).toLong)).toDF("id", "g", "x")
    val grouped = byKey(
      graft.ops.Bootstrap.groupedMeanCI(df, Seq("g"), "id", "x", replicas = 60), "g")
    assert(grouped.keySet == Set("a", "b"))
    grouped.values.foreach { r =>
      assert(r.getAs[Double]("ci_low") < r.getAs[Double]("mean"))
      assert(r.getAs[Double]("mean") < r.getAs[Double]("ci_high"))
    }
    // a one-group frame reproduces the ungrouped CI exactly: same draws,
    // same replica sums, same percentile inputs
    val one = graft.ops.Bootstrap.groupedMeanCI(
      df.filter(col("g") === "a").withColumn("g", lit("a")),
      Seq("g"), "id", "x", replicas = 60).drop("g").head()
    val flat = graft.ops.Bootstrap.meanCI(
      df.filter(col("g") === "a"), "id", "x", replicas = 60).head()
    assert(one == flat)
  }

  test("null metric values are excluded from mean and draws") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("id", "x")
    val r = Bootstrap.meanCI(df, "id", "x", replicas = 50).head()
    assert(r.getAs[Double]("mean") == 15.0)
  }
}
