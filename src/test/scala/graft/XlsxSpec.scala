package graft

import java.nio.file.Files

import graft.io.Xlsx

/** XLSX source/sink specs: write-read roundtrip plus reading the
  * reference's in-tree sample workbook (FIXTURES.md F5). */
class XlsxSpec extends SparkSpec {

  import spark.implicits._

  test("write-read roundtrip preserves values and inferred types") {
    val df = Seq(
      ("Alpha Corp", 10L, 100000.5, "note, with comma & <xml>"),
      ("Beta Inc", 5L, 95000.0, "plain")
    ).toDF("vendor", "experience", "bid_amount", "notes")

    val path = Files.createTempDirectory("xlsx").resolve("test.xlsx").toString
    Xlsx.write(path, Seq("Results" -> df))

    assert(Xlsx.sheetNames(path) == Seq("Results"))
    val back = Xlsx.read(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("vendor", "experience", "bid_amount", "notes"))
    assert(back.schema("experience").dataType.typeName == "long")
    assert(back.schema("bid_amount").dataType.typeName == "double")
    val rows = back.orderBy("vendor").collect()
    assert(rows(0).getString(0) == "Alpha Corp")
    assert(rows(0).getLong(1) == 10L)
    assert(rows(0).getDouble(2) == 100000.5)
    assert(rows(0).getString(3) == "note, with comma & <xml>")
  }

  test("multi-sheet write with sheet selection on read") {
    val r = Seq(("A", 1L)).toDF("vendor", "rank")
    val s = Seq(("min", 5.0)).toDF("stat", "value")
    val path = Files.createTempDirectory("xlsx").resolve("multi.xlsx").toString
    Xlsx.write(path, Seq("Results" -> r, "Statistics" -> s))

    assert(Xlsx.sheetNames(path) == Seq("Results", "Statistics"))
    assert(Xlsx.read(spark, path, Some("Statistics")).columns.toSeq == Seq("stat", "value"))
    intercept[IllegalArgumentException] { Xlsx.read(spark, path, Some("Nope")) }
  }

  test("reads the reference sample workbook (F5)") {
    val path = "/root/reference/sample_bids.xlsx"
    assume(new java.io.File(path).exists())
    val df = Xlsx.read(spark, path)
    assert(df.count() == 5)
    assert(df.columns.contains("vendor"))
    assert(df.columns.contains("bid_amount"))
    // and the engine runs end-to-end on it (demo-parity flow)
    val scored = new Evaluator()
      .minRatio("bid_amount", 0.6)
      .linear("experience", 0.4)
      .evaluate(df)
    assert(scored.count() == 5)
    assert(scored.columns.contains("ranking"))
  }
}
