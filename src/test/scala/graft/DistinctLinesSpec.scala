package graft

import org.apache.spark.sql.functions._

import graft.expressions.DistinctLines.distinctLines

class DistinctLinesSpec extends SparkSpec {
  import spark.implicits._

  private def dedup(s: String): String =
    Seq(s).toDF("t").select(distinctLines(col("t"))).as[String].head()

  test("repeats drop, first occurrence and order survive") {
    assert(dedup("a\nb\na\nc\nb") == "a\nb\nc")
  }

  test("blank lines always survive (paragraph structure)") {
    assert(dedup("a\n\nb\n\na") == "a\n\nb\n")
    assert(dedup("\n\n") == "\n\n")
  }

  test("whitespace-sensitive: ' a' and 'a' are different lines") {
    assert(dedup("a\n a\na ") == "a\n a\na ")
  }

  test("single-line and null pass through") {
    assert(dedup("no newlines here") == "no newlines here")
    val n = Seq[String](null).toDF("t").select(distinctLines(col("t")).as("o"))
      .filter(col("o").isNull).count()
    assert(n == 1)
  }

  test("stream-legal: pure projection, no shuffle in the plan") {
    val df = Seq("x\ny\nx").toDF("t").select(distinctLines(col("t")))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
