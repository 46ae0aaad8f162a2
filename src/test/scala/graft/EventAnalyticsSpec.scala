package graft


import org.apache.spark.sql.functions._

import graft.ops.{Joins, Metrics, Sessions}

/** Unit pins for the event-analytics family (Sessions.*,
  * Metrics.rollingBucketAgg) and the deletion-index fuzzy join —
  * hand-computed expectations plus a brute-force Levenshtein
  * differential, and the loud-guard behavior the docstrings promise. */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------- sessions

  private val gap = 100L

  private def ev(rows: (Long, Long, String, Long)*) = // (user, us, type, id)
    rows.toSeq.toDF("u", "us", "t", "id")

  test("sessionize: gap strictly-greater starts a session; ties break by id") {
    val df = ev(
      (1L, 0L, "a", 1L), (1L, 100L, "a", 2L),   // gap == 100 -> SAME session
      (1L, 201L, "a", 3L),                      // gap 101 > 100 -> new
      (2L, 0L, "a", 4L), (2L, 0L, "a", 5L))     // tie: id order, same session
    val out = Sessions.sessionize(df, "u", col("us"), "id", gap)
      .select("u", "id", "session_seq").as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L), (2L, 5L, 1L)))
  }

  test("sessionize drops null users and null timestamps") {
    val df = Seq(
      (Option(1L), Option(0L), "a", 1L),
      (Option.empty[Long], Option(5L), "a", 2L),
      (Option(1L), Option.empty[Long], "a", 3L)).toDF("u", "us", "t", "id")
    val out = Sessions.sessionize(df, "u", col("us"), "id", gap)
    assert(out.count() === 1L)
  }

  test("sessionStats: counts, bounds, duration, distinct types per session") {
    val df = ev(
      (1L, 0L, "a", 1L), (1L, 50L, "b", 2L), (1L, 100L, "a", 3L),
      (1L, 300L, "c", 4L))
    val out = Sessions.sessionStats(df, "u", col("us"), "id", "t", gap)
      .select("u", "session_seq", "n_events", "start_us", "end_us", "duration_us", "n_types")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 1L, 3L, 0L, 100L, 100L, 2L),
      (1L, 2L, 1L, 300L, 300L, 0L, 1L)))
  }

  test("funnel: ordered at-or-after conversion, ratios vs first and prev") {
    // u1 full path; u2 reaches A only (its B happened BEFORE A); u3 A only;
    // u4 never does A so never enters; u5 converts B at the SAME us as A (>=)
    val df = ev(
      (1L, 1L, "A", 1L), (1L, 2L, "B", 2L), (1L, 3L, "C", 3L),
      (2L, 1L, "B", 4L), (2L, 2L, "A", 5L),
      (3L, 5L, "A", 6L),
      (4L, 1L, "B", 7L),
      (5L, 9L, "A", 8L), (5L, 9L, "B", 9L))
    val out = Sessions.funnel(df, "u", "t", col("us"), Seq("A", "B", "C"))
      .select("step_idx", "step_type", "n_users", "conv_from_first_r", "conv_from_prev_r")
      .as[(Long, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(out(0) === ((0L, "A", 4L, 1.0, 1.0)))
    assert(out(1) === ((1L, "B", 2L, 0.5, 0.5)))
    assert(out(2) === ((2L, "C", 1L, 0.25, 0.5)))
  }

  test("conversionLatency: interpolated percentiles over exact latencies") {
    // latencies 10, 20, 30, 40 (one per user)
    val df = ev(
      (1L, 0L, "s", 1L), (1L, 10L, "p", 2L),
      (2L, 0L, "s", 3L), (2L, 20L, "p", 4L),
      (3L, 0L, "s", 5L), (3L, 30L, "p", 6L),
      (4L, 0L, "s", 7L), (4L, 40L, "p", 8L),
      (5L, 0L, "p", 9L)) // p BEFORE any s: never converts
    val r = Sessions.conversionLatency(df, "u", "t", col("us"), "s", "p")
      .select("n_converted", "min_us", "max_us", "p50_us_r", "p90_us_r", "p99_us_r")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(r._1 === 4L && r._2 === 10L && r._3 === 40L)
    assertNear(r._4, 25.0)
    assertNear(r._5, 37.0)      // 0.9*(4-1)=2.7 -> 30 + 0.7*10
    assertNear(r._6, 39.7)      // 0.99*3=2.97 -> 30 + 0.97*10
  }

  test("activityHistogram: exact floor(log2) buckets, power-of-2 boundaries") {
    // per-user event counts: 1,1,2,3,4,8 -> buckets 0,0,1,1,2,3
    val counts = Seq(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 8)
    val df = counts.flatMap { case (u, n) => (1 to n).map(i => (u, i)) }.toDF("u", "i")
    val out = Sessions.activityHistogram(df, "u")
      .select("log2_bucket", "n_users", "min_events", "max_events", "sum_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0L, 2L, 1L, 1L, 2L), (1L, 2L, 2L, 3L, 5L),
      (2L, 1L, 4L, 4L, 4L), (3L, 1L, 8L, 8L, 8L)))
  }

  // ----------------------------------------------------- rolling bucket agg

  test("rollingBucketAgg: RANGE frame skips gap buckets (not a ROWS frame)") {
    // type X at buckets 0, 1, 4 (bucketUs=10): trailing-3 at bucket 4 must
    // exclude buckets 0 and 1 — a ROWS frame would wrongly include them
    val df = Seq(("X", 0L, 1L), ("X", 5L, 2L), ("X", 10L, 4L), ("X", 45L, 8L))
      .toDF("t", "us", "cents")
    val out = Metrics.rollingBucketAgg(df, "t", col("us"), col("cents"),
        bucketUs = 10L, windowBuckets = 3)
      .select("bucket", "n", "v_cents", "roll_n", "roll_cents", "avg_n_dense_r")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((0L, 2L, 3L, 2L, 3L, 0.666667)))
    assert(out(1) === ((1L, 1L, 4L, 3L, 7L, 1.0)))
    assert(out(2) === ((4L, 1L, 8L, 1L, 8L, 0.333333)))
  }

  test("rollingAnomalies: trailing baseline excludes the candidate, flags spikes") {
    // buckets 0..4 alternate 8/12 (var 3.84, sigma~1.96); bucket 5 = 30
    // deviates 20.4 > 3 sigma. bucketUs=10.
    val counts = Seq(0L -> 8, 1L -> 12, 2L -> 8, 3L -> 12, 4L -> 8, 5L -> 30)
    val df = counts.flatMap { case (b, n) => (1 to n).map(_ => ("X", b * 10L + 1L)) }
      .toDF("t", "us")
    val out = Metrics.rollingAnomalies(df, "t", col("us"), bucketUs = 10L,
        baselineBuckets = 24, k = 3.0)
      .select("bucket", "n", "base_n", "mean_r", "z_r", "is_anomaly")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(2) === 0L && !out(0L).getBoolean(5))  // no baseline
    assert(out(2L).getLong(2) === 2L && !out(2L).getBoolean(5))  // < minBaseline
    val spike = out(5L)
    assert(spike.getLong(2) === 5L)
    assertNear(spike.getDouble(3), 9.6)
    assertNear(spike.getDouble(4), 10.410331)   // (30-9.6)/sqrt(3.84) to 6dp
    assert(spike.getBoolean(5))
    // bucket 3's own baseline is {8,12,8}: mean 9.333333, n=12 inside 3 sigma
    assert(!out(3L).getBoolean(5))
  }

  test("rollingAnomalies: constant baseline flags any departure, z stays null") {
    val counts = Seq(0L -> 10, 1L -> 10, 2L -> 10, 3L -> 10, 4L -> 100)
    val df = counts.flatMap { case (b, n) => (1 to n).map(_ => ("X", b * 10L)) }
      .toDF("t", "us")
    val out = Metrics.rollingAnomalies(df, "t", col("us"), bucketUs = 10L,
        baselineBuckets = 24, k = 3.0)
      .select("bucket", "z_r", "is_anomaly")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(4L).isNullAt(1) && out(4L).getBoolean(2))
    assert(!out(3L).getBoolean(2))  // 10 == constant baseline: not anomalous
  }

  test("sessionFingerprints: repeated type sequences across sessions and users") {
    // u1 plays [A,B] twice (gap-separated), u2 once, u4 plays [B,A] once
    // (different fingerprint, below minSessions), u3 a 1-event session
    // (below minLen)
    val df = ev(
      (1L, 0L, "A", 1L), (1L, 1L, "B", 2L),
      (1L, 1000L, "A", 3L), (1L, 1001L, "B", 4L),
      (2L, 0L, "A", 5L), (2L, 1L, "B", 6L),
      (3L, 0L, "C", 7L),
      (4L, 0L, "B", 8L), (4L, 1L, "A", 9L))
    val out = Sessions.sessionFingerprints(df, "u", col("us"), "id", "t",
        gapUs = 100L, minSessions = 2L, minLen = 2)
      .select("seq_len", "n_sessions", "n_users")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 3L, 2L)))
  }

  test("sessionFingerprints: null types fingerprint by POSITION, not dropped") {
    // [A,null] vs [null,A] must be DIFFERENT signatures — concat_ws
    // skips nulls, so without the U+0000 sentinel inside the struct
    // both would collapse to md5("A") and the four sessions below would
    // merge into one n_sessions=4 row
    val df = Seq(
      (1L, 0L, "A", 1L), (1L, 1L, null.asInstanceOf[String], 2L),
      (1L, 1000L, "A", 3L), (1L, 1001L, null.asInstanceOf[String], 4L),
      (2L, 0L, null.asInstanceOf[String], 5L), (2L, 1L, "A", 6L),
      (2L, 1000L, null.asInstanceOf[String], 7L), (2L, 1001L, "A", 8L)
    ).toDF("u", "us", "t", "id")
    val out = Sessions.sessionFingerprints(df, "u", col("us"), "id", "t",
        gapUs = 100L, minSessions = 2L, minLen = 2)
      .select("seq_len", "n_sessions", "n_users")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 2L, 1L), (2L, 2L, 1L))) // two DISTINCT signatures
  }

  test("interEventGaps: exact log2 buckets, zero gaps in bucket -1") {
    // u1 at us 0,0,1,3,11 -> gaps 0,1,2,8 -> buckets -1,0,1,3; u2 alone
    val df = ev(
      (1L, 0L, "a", 1L), (1L, 0L, "a", 2L), (1L, 1L, "a", 3L),
      (1L, 3L, "a", 4L), (1L, 11L, "a", 5L),
      (2L, 7L, "a", 6L))
    val out = Sessions.interEventGaps(df, "u", col("us"), "id")
      .select("log2_gap_us", "n_gaps", "min_gap_us", "max_gap_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (-1L, 1L, 0L, 0L), (0L, 1L, 1L, 1L), (1L, 1L, 2L, 2L), (3L, 1L, 8L, 8L)))
  }

  test("bucket math is exact past 2^53 (integral div, not double division)") {
    val big = (1L << 60) + 5L
    val bucketUs = 7L
    val expected = Math.floorDiv(big, bucketUs)
    val df = Seq(("X", big, 1L)).toDF("t", "us", "cents")
    val got = Metrics.rollingBucketAgg(df, "t", col("us"), col("cents"), bucketUs, 1)
      .select("bucket").as[Long].collect().head
    assert(got === expected)
    // double division would land on a different long here
    assert(((big - (big % bucketUs)).toDouble / bucketUs).toLong !== expected)
  }

  // ----------------------------------------------------- edit-distance join

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistanceSelfJoin matches brute force at maxDist 0, 1, 2") {
    // adversarial corpus: shared prefixes (the case segment banding dies
    // on), exact duplicates, empty strings, two blocks
    val base = Seq("", "a", "ab", "abc", "abd", "abcd", "cust001", "cust002",
      "cust011", "cst001", "xyz", "xyzz", "abc")
    val rows = for {
      blk <- Seq("b1", "b2")
      (t, i) <- base.zipWithIndex
    } yield (blk, (if (blk == "b1") 0 else 100) + i.toLong, t)
    val df = rows.toDF("blk", "id", "text")
    for (d <- 0 to 2) {
      val got = Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", d,
          maxTextLen = 128)
        .select("blk", "id_a", "id_b", "dist")
        .as[(String, Long, Long, Int)].collect().toSet
      val want = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._2 < b._2
        dist = lev(a._3, b._3)
        if dist <= d
      } yield (a._1, a._2, b._2, dist)).toSet
      assert(got === want, s"maxDist=$d")
    }
  }

  test("editDistanceJoin two-sided: pairs across sides only, dist exact") {
    val l = Seq(("b", 1L, "kitten"), ("b", 2L, "apple")).toDF("blk", "id", "text")
    val r = Seq(("b", 10L, "kitte"), ("b", 11L, "mitten"), ("b", 12L, "appl e"))
      .toDF("blk", "id", "text")
    val got = Joins.editDistanceJoin(l, r, Seq("blk"), "id", "text", 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 1), (1L, 11L, 1), (2L, 12L, 1)))
  }

  test("editDistanceSelfJoin: id order wins even when text order disagrees") {
    // text_a > text_b for the surviving id order — the pair must still
    // appear exactly once as (smaller id, larger id)
    val df = Seq(("b", 5L, "ba"), ("b", 3L, "bb")).toDF("blk", "id", "text")
    val got = Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 1)
      .select("id_a", "id_b", "text_a", "text_b", "dist")
      .as[(Long, Long, String, String, Int)].collect().toSeq
    assert(got === Seq((3L, 5L, "bb", "ba", 1)))
  }

  test("editDistanceJoin expands duplicate texts through the id join-back") {
    val df = Seq(("b", 1L, "same"), ("b", 2L, "same"), ("b", 3L, "same"))
      .toDF("blk", "id", "text")
    val got = Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("editDistanceJoin defaults are valid for every supported maxDist") {
    // maxDist=2 with NO explicit maxTextLen must run (auto ceiling 128);
    // an explicit over-ceiling override still hits the require backstop
    val df = Seq(("b", 1L, "abc"), ("b", 2L, "a")).toDF("blk", "id", "text")
    val got = Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 2)))
    val e = intercept[IllegalArgumentException] {
      Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 2, maxTextLen = 1024)
    }
    assert(e.getMessage.contains("maxTextLen <= 128"))
  }

  test("editDistanceJoin drops null block keys and null texts") {
    val df = Seq((Option("b"), 1L, Option("aa")), (Option.empty[String], 2L, Option("aa")),
      (Option("b"), 3L, Option.empty[String]), (Option("b"), 4L, Option("aa")))
      .toDF("blk", "id", "text")
    val got = Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L)))
  }

  private def messageChain(ex: Throwable): String =
    Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("editDistanceJoin hot-block ceiling raises loudly (guard not pruned)") {
    val df = (1L to 5L).map(i => ("hot", i, s"t$i")).toDF("blk", "id", "text")
    val ex = intercept[Exception] {
      Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 1, maxBlockTexts = 2).collect()
    }
    assert(messageChain(ex).contains("editDistanceJoin"), messageChain(ex))
  }

  test("editDistanceJoin text-length ceiling raises loudly") {
    val df = Seq(("b", 1L, "x" * 50), ("b", 2L, "y" * 50)).toDF("blk", "id", "text")
    val ex = intercept[Exception] {
      Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 1, maxTextLen = 10).collect()
    }
    assert(messageChain(ex).contains("maxTextLen"), messageChain(ex))
  }

  test("editDistanceJoin contract: maxDist capped at 2, d=2 needs short texts") {
    val df = Seq(("b", 1L, "a")).toDF("blk", "id", "text")
    intercept[IllegalArgumentException] {
      Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 3)
    }
    intercept[IllegalArgumentException] {
      // an EXPLICIT over-128 ceiling is too generous for the quadratic
      // index (the default auto-scales to 128 at d=2 and is fine)
      Joins.editDistanceSelfJoin(df, Seq("blk"), "id", "text", 2, maxTextLen = 129)
    }
  }

  test("deletionVariants: counts and members") {
    val df = Seq("abc").toDF("t")
      .select(Joins.deletionVariants(col("t"), 1).as("v"))
    val v = df.as[Seq[String]].collect().head.toSet
    assert(v === Set("abc", "bc", "ac", "ab"))
    val v2 = Seq("abcd").toDF("t")
      .select(Joins.deletionVariants(col("t"), 2).as("v"))
      .as[Seq[String]].collect().head.toSet
    // itself + 4 single deletions + C(4,2)=6 double deletions
    assert(v2 === Set("abcd", "bcd", "acd", "abd", "abc",
      "cd", "bd", "bc", "ad", "ac", "ab"))
    val empty = Seq("").toDF("t")
      .select(Joins.deletionVariants(col("t"), 2).as("v"))
      .as[Seq[String]].collect().head
    assert(empty === Seq(""))
  }
}
