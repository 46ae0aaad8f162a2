package graft.examples

import org.apache.spark.sql.SparkSession

import graft.StagedEvaluator

/** Canonical staged usage trace — the README Technical->Economic pipeline
  * (`/root/reference/README.md:86-105`, `examples/example_staged.py`)
  * applied to the shared parquet testdata. Run with:
  * {{{ sbt "runMain graft.examples.ExampleStaged" }}}
  */
object ExampleStaged {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-example-staged")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS): read as long nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val suppliers = spark.read.parquet(s"$sfDir/supplier.parquet")

    // Stage 1 (Technical): account balance scored linearly; bottom half
    // eliminated by threshold. Stage 2 (Economic): min-ratio on nation key
    // (stats computed over SURVIVORS only — the staged-cohort semantics).
    val result = new StagedEvaluator()
      .addStage("Technical", filterType = "score_threshold", threshold = 40.0)
      .linear("s_acctbal", 1.0, higherIsBetter = true)
      .addStage("Economic")
      .minRatio("s_nationkey", 1.0)
      .evaluate(suppliers)

    result.select("s_suppkey", "technical_score", "economic_score",
      "eliminated_at_stage", "final_score", "ranking").show(12)

    spark.stop()
  }
}
