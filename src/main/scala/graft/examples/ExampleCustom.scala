package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Evaluator
import graft.templates.Templates

/** Custom-criterion usage trace — user-defined Column scoring functions,
  * built-in shortcuts, and templates (the reference's
  * `examples/example_custom.py` + `example_hybrid.py` surface). Run:
  * {{{ sbt "runMain graft.examples.ExampleCustom" }}}
  */
object ExampleCustom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-example-custom")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bids = Seq(
      ("A", 10L, 100000L, 30L),
      ("B", 5L, 95000L, 45L),
      ("C", 8L, 110000L, 25L),
      ("D", 12L, 105000L, 35L)
    ).toDF("vendor", "experience", "bid_amount", "delivery_days")

    val result = new Evaluator()
      // user lambda: scores relative to the cohort mean, pure Column math
      .custom("bid_amount", 0.4,
        (v, stats) => lit(100.0) - abs(v - lit(stats.mean)) / lit(stats.mean) * lit(100.0),
        "near_mean")
      // built-in shortcut by name
      .custom("experience", 0.3, "log_scale")
      // template with parameters
      .custom("delivery_days", 0.3,
        Templates.applyTemplate("sweet_spot_range",
          Map("min_ideal" -> 28.0, "max_ideal" -> 40.0)),
        "delivery_fit")
      .evaluate(bids)

    result.select("vendor", "score_near_mean", "score_experience",
      "score_delivery_fit", "final_score", "ranking").show()

    spark.stop()
  }
}
