package graft

import org.apache.spark.sql.functions._

import graft.ops.{Expectations, LmScore, Snapshot}

class CorpusQualitySpec extends SparkSpec {
  import spark.implicits._

  test("bigramScore matches hand-computed MLE bigram probabilities") {
    val docs = Seq(
      (1L, "a b c"), // bigrams: "a b", "b c"
      (2L, "a c"),   // bigram:  "a c"
      (3L, "x")      // no bigrams -> null metrics
    ).toDF("doc_id", "text")
    val got = LmScore.bigramScore(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toMap
    // model: c("a b")=1, c("b c")=1, c("a c")=1; heads: a->2, b->1
    // p(a b)=0.5, p(b c)=1.0, p(a c)=0.5
    val d1avg = (math.log(0.5) + math.log(1.0)) / 2
    assert(got(1L)._1.contains(2L))
    assertNear(got(1L)._2.get.asInstanceOf[Double], d1avg)
    assertNear(got(1L)._3.get.asInstanceOf[Double], math.exp(-d1avg)) // = sqrt 2
    assertNear(got(2L)._2.get.asInstanceOf[Double], math.log(0.5))
    assertNear(got(2L)._3.get.asInstanceOf[Double], 2.0)
    assert(got(3L) == ((None, None, None)))
  }

  test("bigramScore: a surprising continuation of a common head scores lower") {
    // p(cat|the) = 20/21, p(dog|the) = 1/21 — the doc with the rare
    // continuation must be less probable than the majority docs
    val docs = ((1L to 20L).map(i => (i, "the cat")) :+ (99L, "the dog"))
      .toDF("doc_id", "text")
    val res = LmScore.bigramScore(docs, "doc_id", "text")
    val byId = byKey(res, "doc_id")
    val common = byId(1L).getAs[Double]("avg_logp")
    val rare = byId(99L).getAs[Double]("avg_logp")
    assertNear(common, math.log(20.0 / 21.0))
    assertNear(rare, math.log(1.0 / 21.0))
    assert(common > rare)
  }

  test("trigramScore: hand-computed interpolated probabilities") {
    // corpus: "a b c" and "a b d" — trigrams abc, abd (one each)
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "a b")).toDF("doc_id", "text")
    val got = byKey(LmScore.trigramScore(docs, "doc_id", "text"), "doc_id")
    // model counts: c3(abc)=c3(abd)=1, x3(ab)=2 -> p3 = 0.5
    // bigrams: ab x2, bc, bd (and "a b" doc adds ab) -> c2(bc)=1, x2(b)=2 -> p2(c|b)=0.5
    // unigrams: a:3 b:3 c:1 d:1 N=8 -> p1(c)=1/8
    val expected = 0.7 * 0.5 + 0.2 * 0.5 + 0.1 * (1.0 / 8.0)
    assertNear(got(1L).getAs[Double]("avg_logp"), math.log(expected))
    assertNear(got(1L).getAs[Double]("perplexity"), 1.0 / expected)
    assert(got(1L).getAs[Long]("n_trigrams") == 1L)
    // two tokens -> no trigrams -> null metrics
    assert(got(3L).isNullAt(got(3L).fieldIndex("avg_logp")))
  }

  test("trigramScore with a reference model: OOV w3 skipped, unseen contexts back off") {
    val model = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"),   // fully known trigram
      (2L, "c c b"),   // trigram (c c b): context "c c" unseen -> only λ2·p2(b|c)? c2(cb)=0 too -> λ1·p1(b)
      (3L, "z z z z")  // w3 unknown -> every position skipped -> null
    ).toDF("doc_id", "text")
    val got = byKey(LmScore.trigramScore(docs, "doc_id", "text", Some(model)), "doc_id")
    // model: tokens a b c a b c (N=6; a:2 b:2 c:2)
    // tri: abc, bca, cab, abc -> c3(abc)=2, x3(ab)=2 -> p3=1
    // bi: ab,bc,ca,ab,bc -> c2(bc)=2, x2(b)=2 -> p2(c|b)=1 ; p1(c)=2/6
    val p1c = 2.0 / 6.0
    assertNear(got(1L).getAs[Double]("avg_logp"),
      math.log(0.7 * 1.0 + 0.2 * 1.0 + 0.1 * p1c))
    // doc 2: single trigram (c,c,b): p3 ctx unseen -> 0; c2(c b)=0 -> 0; p1(b)=2/6
    assertNear(got(2L).getAs[Double]("avg_logp"), math.log(0.1 * (2.0 / 6.0)))
    assert(got(3L).isNullAt(got(3L).fieldIndex("n_trigrams")))
  }

  test("trigramScore is deterministic under repartitioning") {
    val docs = (1L to 60L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 2}"))
      .toDF("doc_id", "text")
    val a = LmScore.trigramScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.get(2))).toMap
    val b = LmScore.trigramScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.get(2))).toMap
    assert(a == b) // exact double equality: sorted fold
  }

  test("bigramScore with a reference model skips OOV bigrams") {
    val model = Seq((100L, "alpha beta gamma"), (101L, "alpha beta delta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma"), // both bigrams known
      (2L, "alpha beta zzz"),   // "beta zzz" unseen -> skipped, n=1
      (3L, "qq rr")             // nothing known -> null metrics
    ).toDF("doc_id", "text")
    val got = byKey(LmScore.bigramScore(docs, "doc_id", "text", Some(model)), "doc_id")
    assert(got(1L).getAs[Long]("n_bigrams") == 2L)
    // p(beta|alpha)=1, p(gamma|beta)=0.5
    assertNear(got(1L).getAs[Double]("avg_logp"), math.log(0.5) / 2)
    assert(got(2L).getAs[Long]("n_bigrams") == 1L)
    assertNear(got(2L).getAs[Double]("avg_logp"), 0.0) // ln p(beta|alpha) = 0
    assert(got(3L).isNullAt(got(3L).fieldIndex("n_bigrams")))
  }

  test("latestByKey keeps max version, larger-id tie-break, null version loses") {
    val log = Seq(
      ("u1", 1L, 10L, "a"), // superseded
      ("u1", 2L, 30L, "b"), // winner: max version
      ("u1", 3L, 20L, "c"),
      ("u2", 4L, 10L, "d"),
      ("u2", 5L, 10L, "e"), // tie on version: larger id wins
      ("u3", 6L, -1L, "f"), // placeholder for null version below
      ("u3", 7L, 5L, "g")
    ).toDF("k", "id", "v", "payload")
      .withColumn("v", when(col("id") === 6L, lit(null).cast("long")).otherwise(col("v")))
    val got = Snapshot.latestByKey(log, Seq("k"), col("v"), "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
    assert(got == Set(("u1", 2L, "b"), ("u2", 5L, "e"), ("u3", 7L, "g")))

    // partition invariance + plan shape: one aggregate, no window, no join
    val repart = Snapshot.latestByKey(log.repartition(7), Seq("k"), col("v"), "id")
    assert(repart.collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet == got)
    val plan = repart.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"latestByKey must be a single aggregate:\n$plan")
  }

  test("Classifier score matches an independent md5 recomputation; map-only plan") {
    import graft.ops.Classifier
    val weights = (0 until 16).map(j => (j % 5) * 0.1 - 0.2)
    val bias = 0.05
    val docs = Seq((1L, "alpha beta beta"), (2L, ""), (3L, "gamma")).toDF("doc_id", "text")
    val scored = Classifier.withScore(docs, "text", weights, bias, "p")

    // independent recomputation: JDK MessageDigest, not Spark's md5
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % weights.size).toInt
    }
    def expected(text: String): Option[Double] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val m = bias + toks.map(t => weights(bucket(t))).sum / toks.length
        Some(1.0 / (1.0 + math.exp(-m)))
      }
    }
    val got = byKey(scored, "doc_id")
    assertNear(got(1L).getAs[Double]("p"), expected("alpha beta beta").get)
    assert(got(2L).isNullAt(got(2L).fieldIndex("p")))
    assertNear(got(3L).getAs[Double]("p"), expected("gamma").get)

    // pure map-side projection: scoring must introduce no shuffle
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier scoring must not shuffle:\n$plan")

    // the gate drops unscorable rows
    val kept = Classifier.filterByScore(docs, "text", weights, bias, minProb = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("trainPortable learns a separable gate, bit-deterministic under repartition") {
    import graft.ops.Classifier
    // class 1 docs carry "superb", class 0 docs carry "awful" (buckets 37/24
    // at dim 64 — chosen non-colliding; "excellent"/"terrible" collide at
    // bucket 4!); filler tokens shared. 4 iterations must separate.
    val docs = ((0 until 40).map(i => (i.toLong, 1.0, "superb item fine")) ++
      (40 until 80).map(i => (i.toLong, 0.0, "awful item fine")))
      .toDF("doc_id", "y", "text")
    val w = Classifier.trainPortable(docs, "text", "y", "doc_id",
      dim = 64, iters = 4, lr = 2.0)
    assert(w.size == 64)
    // gate with the trained weights (bias 0): margin sign separates, and
    // both sigmoid links agree at the 0.5 threshold (both cross at z=0)
    val kept = Classifier.filterByScore(docs, "text", w, bias = 0.0, minProb = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 40L).toSet, s"trained gate wrong: $kept")
    // bit-identical under repartitioning (the two-level fold contract)
    val again = Classifier.trainPortable(docs.repartition(13), "text", "y", "doc_id",
      dim = 64, iters = 4, lr = 2.0)
    assert(w == again)
    // degenerate inputs fail loudly
    intercept[IllegalArgumentException] {
      Classifier.trainPortable(
        docs.filter(col("doc_id") < 0), "text", "y", "doc_id")
    }
  }

  test("evaluate: perfect metrics on a separable corpus, confusion counts exact") {
    import graft.ops.Classifier
    // same planted separable corpus as the trainer spec; enough docs that
    // the 1/16 test split is non-empty on both classes
    val docs = ((0 until 200).map(i => (i.toLong, 1.0, "superb item fine")) ++
      (200 until 400).map(i => (i.toLong, 0.0, "awful item fine")))
      .toDF("doc_id", "y", "text")
    val w = Classifier.trainPortable(docs, "text", "y", "doc_id",
      dim = 64, iters = 4, lr = 2.0)
    val row = Classifier.evaluate(docs, "text", "y", "doc_id", w).head()
    val n = row.getAs[Long]("n_eval")
    val (tp, fp, tn, fn) = (row.getAs[Long]("tp"), row.getAs[Long]("fp"),
      row.getAs[Long]("tn"), row.getAs[Long]("fn"))
    assert(n > 0 && tp > 0 && tn > 0, s"test split degenerate: $row")
    assert(tp + fp + tn + fn == n)
    // a separable corpus the trainer fit must evaluate perfectly
    assert(fp == 0 && fn == 0, s"misclassifications on separable corpus: $row")
    assert(row.getAs[Double]("accuracy_r") == 1.0)
    assert(row.getAs[Double]("precision_r") == 1.0)
    assert(row.getAs[Double]("recall_r") == 1.0)
    assert(row.getAs[Double]("f1_r") == 1.0)
    // the held-out split excludes training rows' majority: n is ~1/16 of 400
    assert(n < 80, s"test split too large ($n of 400) — split machinery broken?")
    // degenerate: no positives predicted/present -> null ratios, not NaN
    val neg = Classifier.evaluate(
      docs.filter(col("y") === 0.0), "text", "y", "doc_id", w)
      .head()
    assert(neg.isNullAt(neg.fieldIndex("recall_r")),
      s"recall over a no-positive split must be null: $neg")
  }

  test("calibration: bins partition the corpus, mean_p inside bin range, separable extremes") {
    import graft.ops.Classifier
    val docs = ((0 until 200).map(i => (i.toLong, 1.0, "superb item fine")) ++
      (200 until 400).map(i => (i.toLong, 0.0, "awful item fine")))
      .toDF("doc_id", "y", "text")
    val w = Classifier.trainPortable(docs, "text", "y", "doc_id",
      dim = 64, iters = 4, lr = 2.0)
    val rows = Classifier.calibration(docs, "text", "y", "doc_id", w)
      .collect().map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Double]("mean_p_r"), r.getAs[Double]("frac_pos_r")))
    assert(rows.map(_._2).sum == 400L, s"bins must partition the corpus: ${rows.toSeq}")
    rows.foreach { case (bin, _, _, meanP, _) =>
      assert(meanP >= bin / 10.0 - 1e-6 && meanP < (bin + 1) / 10.0 + 1e-6,
        s"mean_p $meanP outside bin $bin")
    }
    // a separable fit puts class-1 docs in high bins at frac_pos 1.0 and
    // class-0 docs in low bins at 0.0 — no mixed bin
    rows.foreach { case (bin, _, _, _, fp) =>
      assert(fp == 0.0 || fp == 1.0, s"mixed bin on separable corpus: bin $bin frac $fp")
      if (bin >= 5) assert(fp == 1.0) else assert(fp == 0.0)
    }
  }

  test("nearDupRecallProbe: exact copies recovered fully; big ids refused") {
    import graft.ops.Dedup
    // dropEveryK large -> twins keep ~all tokens -> near-exact copies the
    // detector must find; 60 long token-disjoint docs, 1/2 probed
    val docs = (0L until 60L).map(i =>
      (i, (0 until 30).map(t => s"tok${i}x$t").mkString(" "))).toDF("doc_id", "text")
    val row = Dedup.nearDupRecallProbe(docs, "text", "doc_id",
      probeModulus = 2, dropEveryK = 1000, threshold = 0.5).head()
    assert(row.getAs[Long]("n_planted") > 5, s"probe sample degenerate: $row")
    assert(row.getAs[Long]("n_above") == row.getAs[Long]("n_planted"))
    assert(row.getAs[Double]("recall_r") == 1.0,
      s"near-exact twins must all be recovered: $row")
    // ids at/above the twin offset would collide — refuse loudly
    val e = intercept[Exception] {
      Dedup.nearDupRecallProbe(
        docs.withColumn("doc_id", col("doc_id") + 2000000L),
        "text", "doc_id").head()
    }
    assert(e.getMessage.contains("ids must be numeric in"))
    // a NON-NUMERIC id casts to null, which must hit the same loud
    // refusal (not flow on as a null twin id)
    val e2 = intercept[Exception] {
      Dedup.nearDupRecallProbe(
        docs.withColumn("doc_id", concat(lit("k"), col("doc_id"))),
        "text", "doc_id").head()
    }
    assert(e2.getMessage.contains("ids must be numeric in") &&
      e2.getMessage.contains("withSurrogateId"))
  }

  test("prepareTrainingCorpus quality gates: perplexity and length z-score") {
    import graft.ops.Pipelines
    // token-disjoint docs so the near-dup stage can't collapse them
    val base = (1L to 20L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e", "en", "srcA"))
    val long = (99L, ("tok " * 50).trim, "en", "srcA")
    val docs = (base :+ long).toDF("doc_id", "text", "lang", "source")

    // length gate: the 50-token doc is a z-outlier within its language
    val gated = Pipelines.prepareTrainingCorpus(
      docs, minQuality = 0.0, maxLengthZ = Some(1.0)).df
    val ids = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(99L) && ids.size == 20, s"got $ids")

    // perplexity gate: ppl >= 1 for every scorable doc, so a 0.5 cap
    // drops them all; the perplexity column is retained as enrichment
    val strict = Pipelines.prepareTrainingCorpus(
      docs, minQuality = 0.0, maxPerplexity = Some(0.5))
    assert(strict.df.columns.contains("perplexity"))
    assert(strict.df.count() == 0)
    val loose = Pipelines.prepareTrainingCorpus(
      docs, minQuality = 0.0, maxPerplexity = Some(1e9)).df
    assert(loose.count() == 21)

    // lmOrder = 3 swaps in the interpolated trigram model: same gate
    // semantics (ppl >= 1 for scorable docs; short docs carry null and
    // survive a strict cap)
    val tri = Pipelines.prepareTrainingCorpus(
      docs, minQuality = 0.0, maxPerplexity = Some(1e9), lmOrder = 3).df
    assert(tri.count() == 21)
    intercept[IllegalArgumentException] {
      Pipelines.prepareTrainingCorpus(docs, lmOrder = 5)
    }

    // decontamination stage: a doc leaking a benchmark verbatim never
    // reaches a training shard; everything else is untouched
    val bench = Seq((1000L, "w5a w5b w5c w5d w5e")).toDF("doc_id", "text")
    val decon = Pipelines.prepareTrainingCorpus(
      docs, minQuality = 0.0,
      benchDecontaminate = Some((bench, 0.8))).df
    val deconIds = decon.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!deconIds.contains(5L) && deconIds.size == 20, s"got $deconIds")
  }

  test("classificationReport: hand-computed precision/recall/F1, edge classes") {
    import graft.ops.Metrics
    // truth:  a a a b b c   pred: a a b b b a
    // a: tp=2 support=3 predicted=3 -> p=2/3 r=2/3
    // b: tp=2 support=2 predicted=3 -> p=2/3 r=1
    // c: tp=0 support=1 predicted=0 -> p null (never predicted), r=0
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"))
      .toDF("y", "yhat")
    val rep = byKey(Metrics.classificationReport(df, "y", "yhat"), "clazz")
    assert(rep("a").getAs[Long]("support") == 3L && rep("a").getAs[Long]("tp") == 2L)
    assertNear(rep("a").getAs[Double]("precision"), 2.0 / 3)
    assertNear(rep("b").getAs[Double]("recall"), 1.0)
    assertNear(rep("b").getAs[Double]("f1"), 2 * (2.0 / 3) * 1.0 / (2.0 / 3 + 1.0))
    assert(rep("c").isNullAt(rep("c").fieldIndex("precision")))
    assertNear(rep("c").getAs[Double]("recall"), 0.0)
    assert(rep("c").isNullAt(rep("c").fieldIndex("f1")))
  }

  test("Drift PSI: zero for identical snapshots, positive for shifted ones") {
    import graft.ops.Drift
    val ref = Seq(10L, 15L, 110L, 115L, 210L).toDF("v")
    // identical distribution -> every contribution is exactly 0.0
    val same = Drift.psi(ref, ref, "v", 100L).head()
    assert(same.getDouble(0) == 0.0 && same.getLong(1) == 3L)

    // shifted distribution -> strictly positive PSI; hand-check one bin:
    // ref bins {0:2, 1:2, 2:1}, cur bins {2:1, 3:2} (values 210, 310, 315)
    val cur = Seq(210L, 310L, 315L).toDF("v")
    val bins = Drift.binContributions(ref, cur, "v", 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    assert(bins.keySet == Set(0L, 1L, 2L, 3L))
    val (tr, tc, b) = (5.0, 3.0, 4.0)
    val (pr0, pc0) = ((2 + 1) / (tr + b), (0 + 1) / (tc + b))
    assertNear(bins(0L)._3, (pc0 - pr0) * math.log(pc0 / pr0))
    val psi = Drift.psi(ref, cur, "v", 100L).head().getDouble(0)
    assert(psi > 0.25, s"disjoint shift should read as drift, got $psi")
  }

  test("embedding drift: zero on identical halves, sees a planted cluster shift") {
    import graft.ops.Drift
    // two frozen unit-ish centroids on the axes; vectors near one or the other
    val cents = Seq(
      (0, Seq(1.0, 0.0), 1.0),
      (1, Seq(0.0, 1.0), 1.0))
    def vecs(nA: Int, nB: Int) =
      ((1 to nA).map(i => (i.toLong, Seq(0.9, 0.1 * (i % 3)))) ++
       (1 to nB).map(i => (100L + i, Seq(0.1 * (i % 3), 0.9))))
        .toDF("vec_id", "embedding")
    val ref = vecs(8, 2)
    val same = Drift.embeddingDrift(ref, ref, "embedding", cents).head()
    assert(same.getDouble(0) == 0.0 && same.getLong(1) == 2L,
      "identical snapshots must read exactly zero")
    // the current snapshot's mass moved to the other cluster
    val cur = vecs(2, 8)
    val cells = Drift.embeddingDriftCells(ref, cur, "embedding", cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cells(0L) == ((8L, 2L)) && cells(1L) == ((2L, 8L)),
      s"cell histograms must follow the assignment, got $cells")
    val psi = Drift.embeddingDrift(ref, cur, "embedding", cents)
      .head().getDouble(0)
    assert(psi > 0.2, s"a cluster shift must read as drift, got $psi")
  }

  test("Expectations.report counts violations; null predicate is a violation") {
    val df = Seq(
      (1L, 10.0, "A"),
      (2L, -5.0, "A"),  // violates positive
      (3L, 7.0, "Z"),   // violates domain
      (4L, 3.0, "N")
    ).toDF("id", "x", "flag")
      .withColumn("x", when(col("id") === 4L, lit(null).cast("double")).otherwise(col("x")))
    val rep = Expectations.report(df, Seq(
      "x_positive" -> (col("x") > 0),           // row 2 false, row 4 null -> 2 violations
      "flag_domain" -> col("flag").isin("A", "N", "R")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rep("x_positive") == ((4L, 2L, 0.5)))
    assert(rep("flag_domain") == ((4L, 1L, 0.25)))

    // check names with dots must not break internal column resolution
    val dotted = Expectations.report(df, Seq("x.is.positive" -> (col("x") > 0)))
      .collect().head
    assert(dotted.getString(0) == "x.is.positive" && dotted.getLong(2) == 2L)
  }

  test("schemaDiff: added/removed/type_changed columns, order-insensitive") {
    val prev = Seq((1L, "a", 2.0)).toDF("id", "name", "score")
    val cur = Seq(("b", 2, 3L, true)).toDF("name", "score", "id", "extra")
    val got = Expectations.schemaDiff(prev, cur)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got == Set(
      ("extra", "added", None, Some("BOOLEAN")),
      ("score", "type_changed", Some("DOUBLE"), Some("INT"))))
    // identical schemas in different column order: no drift
    assert(Expectations.schemaDiff(prev, prev.select("score", "id", "name")).count() == 0)
  }
}
