package graft

import org.apache.spark.sql.functions._

import graft.io.Buckets

/** Bucketed co-located joins: correctness + the structural claim that the
  * join plans WITHOUT any Exchange (the whole point of bucketing). */
class BucketsSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Buckets.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 4)
    Buckets.writeBucketed(ord, "b_orders", Seq("l_orderkey"), 4)
    // At this toy size Spark rightly prefers a broadcast join (and skips
    // the bucketed read entirely); pin it to sort-merge to observe the
    // big-table shape the bucketing exists for.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Buckets.cocolocatedJoin(spark, "b_lineitem", "b_orders", Seq("l_orderkey"))

      // correctness vs plain join
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expected)
      assert(expected > 0)

      // structural: no Exchange anywhere in the executed join plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
