package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Evaluator

/** Canonical usage trace — the README front-page query
  * (`/root/reference/README.md:53-76`, `examples/example_fluent.py`) plus
  * the same engine applied to the shared parquet testdata. Run with:
  * {{{ sbt "runMain graft.examples.ExampleFluent" }}}
  */
object ExampleFluent {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-example-fluent")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS): read as long nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // README basic usage
    val bids = Seq(
      ("Company A", 50000000L, 8L),
      ("Company B", 45000000L, 10L),
      ("Company C", 52000000L, 6L)
    ).toDF("vendor", "bid_amount", "experience")

    val result = new Evaluator()
      .minRatio("bid_amount", 0.6)
      .linear("experience", 0.4, higherIsBetter = true)
      .evaluate(bids)

    result.select("vendor", "ranking", "final_score").show()

    // Same engine over the shared testdata: suppliers as bidders.
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val suppliers = spark.read.parquet(s"$sfDir/supplier.parquet")
    val scored = new Evaluator()
      .linear("s_acctbal", 0.7, higherIsBetter = true)
      .custom("s_nationkey", 0.3, "proximity_to_mean")
      .evaluate(suppliers)
    scored.show(12)

    spark.stop()
  }
}
