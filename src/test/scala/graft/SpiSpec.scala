package graft

import graft.criteria.ScoringFunctions

/** ServiceLoader-based scoring-function discovery — the JVM analogue of
  * the reference demo's `custom_functions/` directory import
  * (`streamlit_demo.py:56-86`). The test classpath carries
  * [[graft.testspi.DoubledValueProvider]] via `META-INF/services`, so
  * discovery itself is what's under test. */
class SpiSpec extends SparkSpec {

  import spark.implicits._

  test("classpath providers auto-register alongside built-ins") {
    val names = ScoringFunctions.names
    assert(names.contains("test_doubled"), "test-classpath provider discovered")
    assert(names.contains("sqrt_scale"), "main-jar example provider discovered")
    assert(names.contains("proximity_to_mean"), "built-ins still present")
  }

  test("a discovered provider evaluates through the named custom path") {
    val bids = Seq(("A", 4.0), ("B", 9.0)).toDF("vendor", "x")
    val result = new Evaluator().custom("x", 1.0, "test_doubled").evaluate(bids)
    val m = byKey(result, "vendor")
    assert(m("A").getAs[Double]("score_x") == 8.0)
    assert(m("B").getAs[Double]("score_x") == 18.0)
    assert(m("B").getAs[Long]("ranking") == 1L)
  }

  test("unknown function error lists built-in and discovered names") {
    val e = intercept[IllegalArgumentException] {
      new Evaluator().custom("x", 1.0, "no_such_function")
    }
    assert(e.getMessage.contains("sqrt_scale"))
    assert(e.getMessage.contains("log_scale"))
  }
}
