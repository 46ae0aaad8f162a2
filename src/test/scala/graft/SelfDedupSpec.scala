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

  private def spanRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
      r.getAs[Long]("span_end"), r.getAs[Long]("n_windows"))).toSet

  test("repeatedSpans: a 15-token repeat under span=13 merges to ONE maximal island") {
    val long15 = (1 to 15).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $long15 omega"),
      (2L, s"x y $long15 z")
    ).toDF("doc_id", "text")
    // doc 1 owns every window; doc 2's 3 overlapping removal windows
    // (pos 2, 3, 4) merge to the exact maximal span [2, 17)
    assert(spanRows(Dedup.repeatedSpans(docs, "text", "doc_id", span = 13)) ==
      Set((2L, 2L, 17L, 3L)))
  }

  test("repeatedSpans: disjoint repeats stay separate islands; short docs clamp") {
    val docs = Seq(
      (1L, s"$boiler GAP1 GAP2 $boiler"), // owner of the span at pos 0; pos 15 copy cut
      (2L, "tiny doc"), (3L, "tiny doc")  // sub-span whole-doc dedup, end clamps to 2
    ).toDF("doc_id", "text")
    val got = spanRows(Dedup.repeatedSpans(docs, "text", "doc_id", span = 13))
    assert(got == Set((1L, 15L, 28L, 1L), (3L, 0L, 2L, 1L)), got.toString)
  }

  test("repeatedSpans: lossless vs a brute-force window scan on a random corpus") {
    val span = 4
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("ad", "bid", "cap", "dot", "eel", "fog")
    val docs = (1L to 25L).map { id =>
      val len = 10 + rnd.nextInt(31)
      (id, (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val wins = docs.flatMap { case (id, t) =>
      val ts = toks(t.toLowerCase)
      val last = math.max(ts.length - span, 0)
      (0 to last).map(p => (id, p.toLong,
        ts.slice(p, math.min(p + span, ts.length)).mkString(" ")))
    }
    val byContent = wins.groupBy(_._3)
    val removals = wins.filter { case (id, p, c) =>
      val occ = byContent(c)
      occ.size > 1 && (occ.minBy(o => (o._1, o._2)) != ((id, p, c)))
    }
    val ntOf = docs.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    val expected = removals.groupBy(_._1).flatMap { case (id, rs) =>
      val ps = rs.map(_._2).sorted
      val islands = ps.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, nw) :: rest, p) if p <= e => (s, p + span, nw + 1) :: rest
        case (acc, p) => (p, p + span, 1L) :: acc
      }
      islands.map { case (s, e, nw) => (id, s, math.min(e, ntOf(id)), nw) }
    }.toSet
    import spark.implicits._
    val got = spanRows(Dedup.repeatedSpans(
      docs.toDF("doc_id", "text"), "text", "doc_id", span = span))
    assert(got == expected,
      s"missing=${expected -- got}, extra=${got -- expected}")
    // the islands cover EXACTLY the tokens selfDedupSpans cuts: rebuild
    // each doc from tokens outside the islands and compare
    val cleaned = byKey(Dedup.selfDedupSpans(
      docs.toDF("doc_id", "text"), "text", "doc_id", span = span), "doc_id")
    docs.foreach { case (id, t) =>
      val cuts = expected.filter(_._1 == id)
      val keptToks = toks(t).zipWithIndex
        .filterNot { case (_, i) => cuts.exists(c => c._2 <= i && i < c._3) }
        .map(_._1)
      val want = if (cuts.isEmpty) t else keptToks.mkString(" ")
      assert(cleaned(id).getAs[String]("text") == want, s"doc $id")
    }
  }
}
