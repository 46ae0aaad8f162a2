package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Exact-substring self-dedup (repeated verbatim spans within a corpus). */
class SelfDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = (1 to 13).map(i => s"w$i").mkString(" ")

  test("non-first occurrences of a repeated span are removed, owner kept") {
    val docs = Seq(
      (1L, s"intro $boiler outro one"),
      (2L, s"different lead $boiler and a tail"),
      (3L, "totally unrelated text with no repetition at all")
    ).toDF("doc_id", "text")
    val removals = Dedup.repeatedSpanRemovals(docs, "text", "doc_id", span = 13)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // doc 1 owns the span (pos 1); doc 2's occurrence at pos 2 is cut.
    // The repeated region spans MORE than one window (every 13-window
    // inside "intro <boiler> outro" vs "different lead <boiler> and a
    // tail" differs except the aligned one), so exactly one removal.
    assert(removals == Set((2L, 2)))
    val out = byKey(Dedup.selfDedupSpans(docs, "text", "doc_id", span = 13), "doc_id")
    assert(out(1L).getAs[String]("text") == s"intro $boiler outro one")
    assert(out(2L).getAs[String]("text") == "different lead and a tail")
    assert(out(3L).getAs[String]("text") ==
      "totally unrelated text with no repetition at all")
  }

  test("one-token alteration defeats the span match (verbatim-only)") {
    val docs = Seq(
      (1L, s"a $boiler b"),
      (2L, s"a ${boiler.replace("w7", "ALTERED")} b")
    ).toDF("doc_id", "text")
    assert(Dedup.repeatedSpanRemovals(docs, "text", "doc_id", span = 13).count() == 0)
  }

  test("matching is lowercased but surviving tokens keep their case") {
    val docs = Seq(
      (1L, s"x $boiler y"),
      (2L, s"KEEP Me ${boiler.toUpperCase} z")
    ).toDF("doc_id", "text")
    val out = byKey(Dedup.selfDedupSpans(docs, "text", "doc_id", span = 13), "doc_id")
    assert(out(2L).getAs[String]("text") == "KEEP Me z")
  }

  test("internal repetition within one document trims the later copy") {
    val docs = Seq((1L, s"$boiler mid $boiler")).toDF("doc_id", "text")
    val out = Dedup.selfDedupSpans(docs, "text", "doc_id", span = 13)
      .head().getAs[String]("text")
    assert(out == s"$boiler mid")
  }

  test("short documents collide only when verbatim-equal; sub-span docs dedup whole") {
    val docs = Seq(
      (1L, "tiny doc"), (2L, "tiny doc"), (3L, "tiny doc two")
    ).toDF("doc_id", "text")
    val out = byKey(Dedup.selfDedupSpans(docs, "text", "doc_id", span = 13), "doc_id")
    assert(out(1L).getAs[String]("text") == "tiny doc")
    assert(out(2L).getAs[String]("text") == "")
    assert(out(3L).getAs[String]("text") == "tiny doc two")
  }

  test("untouched documents keep their original bytes (no renormalization)") {
    val messy = "  spaced\tout   text with no dupes  "
    val docs = Seq((1L, messy), (2L, s"pad $boiler pad"), (3L, s"lead $boiler lead"))
      .toDF("doc_id", "text")
    val out = byKey(Dedup.selfDedupSpans(docs, "text", "doc_id", span = 13), "doc_id")
    assert(out(1L).getAs[String]("text") == messy)
  }
}
