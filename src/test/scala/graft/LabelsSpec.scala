package graft

import org.apache.spark.sql.functions._

import graft.ops.Labels

class LabelsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Int, Seq[Double])*) =
    rows.toDF("vec_id", "label", "embedding")

  test("labelCentroids: exact means per label and dim") {
    val df = emb(
      (1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(3.0, 2.0)),
      (3L, 1, Seq(-1.0, 4.0)))
    val cents = Labels.labelCentroids(df, "label", "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(0) == Seq(2.0, 1.0))
    assert(cents(1) == Seq(-1.0, 4.0))
  }

  test("labelCentroids: bit-identical under repartitioning and bucket count") {
    val rows = (0 until 300).map(i =>
      (i.toLong, i % 3, Seq.tabulate(8)(d => math.sin(i * 0.37 + d) * 1e-3 + d)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val a = Labels.labelCentroids(df, "label", "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val b = Labels.labelCentroids(df.repartition(13), "label", "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(a == b) // exact double equality: the fold order is pinned
    // a DIFFERENT bucket count changes the fold tree and may change bits;
    // it must still be deterministic for its own count
    val c1 = Labels.labelCentroids(df, "label", "vec_id", "embedding", buckets = 7)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c2 = Labels.labelCentroids(df.repartition(5), "label", "vec_id", "embedding", buckets = 7)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c1 == c2)
  }

  test("labelCentroids: bit-identical under forced sort-based agg fallback") {
    // ObjectHashAggregateExec switches to sort-based aggregation past
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold distinct
    // keys per partition, and the fallback's within-group row order is
    // not a documented guarantee. The level-1 fold must not care: order
    // comes from the explicit sort inside OrderedKeyedVecSum, not from
    // arrival. Force the fallback at threshold 2 with 500 labels and
    // assert bit-identity against the default-config run.
    val rows = (0 until 2000).map(i =>
      (i.toLong, i % 500, Seq.tabulate(4)(d => math.cos(i * 0.61 + d) * 1e-3 + d)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val base = Labels.labelCentroids(df, "label", "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "2")
      val forced = Labels.labelCentroids(df.repartition(11), "label", "vec_id", "embedding")
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      assert(forced == base)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("labelNoiseCandidates flags the planted mislabeled row first") {
    // label 0 clusters near (1, 0); label 1 near (0, 1); row 99 carries
    // label 0 but sits on label 1's axis — it must rank as label 0's
    // top noise candidate
    val rows = (0 until 20).map(i => (i.toLong, 0, Seq(1.0, 0.01 * i))) ++
      (20 until 40).map(i => (i.toLong, 1, Seq(0.01 * (i - 20), 1.0))) :+
      ((99L, 0, Seq(0.0, 1.0)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val noise = Labels.labelNoiseCandidates(df, "label", "vec_id", "embedding", k = 3)
    val top0 = noise.filter(col("label") === 0 && col("noise_rank") === 1)
      .select("vec_id").as[Long].head()
    assert(top0 == 99L)
    // no Window node: ranking rides the heap aggregate
    assert(!noise.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("portable kmeans recovers planted blobs and is bit-deterministic") {
    import graft.ops.Similarity
    // three tight, well-separated blobs
    val rows = (0 until 30).map { i =>
      val blob = i % 3
      val base = blob match {
        case 0 => Seq(10.0, 0.0)
        case 1 => Seq(-10.0, 10.0)
        case _ => Seq(0.0, -10.0)
      }
      (i.toLong, base.zipWithIndex.map { case (b, d) => b + 0.01 * (i + d) })
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.trainKmeansPortable(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.size == 3)
    // each blob center must be near one learned centroid
    for (target <- Seq(Seq(10.0, 0.0), Seq(-10.0, 10.0), Seq(0.0, -10.0))) {
      val best = cents.map(c =>
        math.sqrt(c._2.zip(target).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 1.0, s"no centroid near $target: $cents")
    }
    // bit-identical under repartitioning (the whole point of the design)
    val again = Similarity.trainKmeansPortable(
      df.repartition(7), "vec_id", "embedding", k = 3, iters = 4)
    assert(again == cents)
    // assignment groups the blobs perfectly
    val asg = Similarity.assignCells(df, "embedding", cents, "cell")
      .select("vec_id", "cell").as[(Long, Int)].collect()
    assert(asg.groupBy(_._1 % 3).values.forall(g => g.map(_._2).distinct.size == 1))
  }

  test("portable kmeans: empty clusters keep their init centroid") {
    import graft.ops.Similarity
    // two distinct points, k=3: one cluster must end empty and keep init
    val df = ((0 until 10).map(i => (i.toLong, Seq(5.0, 5.0))) ++
      (10 until 20).map(i => (i.toLong, Seq(-5.0, -5.0)))).toDF("vec_id", "embedding")
    val cents = Similarity.trainKmeansPortable(df, "vec_id", "embedding", k = 3, iters = 3)
    assert(cents.size == 3)
    val learned = cents.map(_._2).toSet
    assert(learned.contains(Seq(5.0, 5.0)) && learned.contains(Seq(-5.0, -5.0)))
  }

  test("dimStats: exact moments, zero-variance clamp, bit-determinism") {
    import graft.ops.Labels
    // dim 0: values 1,3 -> mean 2, var 1; dim 1: constant 5 -> var 0
    val df = Seq((1L, Seq(1.0, 5.0)), (2L, Seq(3.0, 5.0))).toDF("vec_id", "embedding")
    val st = Labels.dimStats(df, "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(st(0) == ((2.0, 1.0, 1.0)))
    assert(st(1) == ((5.0, 0.0, 0.0)))
    val big = (0 until 500).map(i => (i.toLong,
      Seq.tabulate(6)(d => math.cos(i * 0.13 + d) * 3.7))).toDF("vec_id", "embedding")
    val a = Labels.dimStats(big, "vec_id", "embedding").collect().map(_.toSeq).toSeq
    val b = Labels.dimStats(big.repartition(11), "vec_id", "embedding").collect().map(_.toSeq).toSeq
    assert(a == b) // exact double equality
  }

  test("standardize: unit-variance output, zero-variance dims -> 0, shuffle-free") {
    import graft.ops.Labels
    val df = Seq((1L, Seq(1.0, 5.0)), (2L, Seq(3.0, 5.0))).toDF("vec_id", "embedding")
    val stats = Labels.dimStats(df, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(3)))
    val z = Labels.standardize(df, "embedding", stats.toSeq)
    assert(!z.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = z.select("vec_id", "z_vec").as[(Long, Seq[Double])].collect().toMap
    assert(rows(1L) == Seq(-1.0, 0.0)) // (1-2)/1 ; constant dim -> 0
    assert(rows(2L) == Seq(1.0, 0.0))
  }

  test("vector expressions stay codegen'd over NON-NULLABLE inputs") {
    // collect_list/transform outputs are non-nullable; dot/cosine/maxabs
    // can still return null (length mismatch, corrupt elements), so they
    // must declare nullable=true or codegen emits `false = true` and
    // silently falls back to the interpreter. fallback=false makes any
    // such compile error FATAL here.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((0, 1.0), (0, 2.0), (1, 3.0)).toDF("g", "x")
        .groupBy("g").agg(collect_list(col("x")).as("v")) // non-nullable array
        .select(col("g"), col("v"),
          graft.expressions.VectorExpressions.cosine(col("v"), col("v")).as("c"),
          graft.expressions.VectorExpressions.dot(col("v"), col("v")).as("d"),
          graft.expressions.QuantizeExpressions.maxAbs(col("v")).as("m"),
          graft.expressions.QuantizeExpressions.int8Codes(col("v")).as("q"))
      val rows = df.collect()
      assert(rows.length == 2)
      assert(rows.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("hardNegatives: different-label only, similarity-ranked") {
    val df = emb(
      (1L, 0, Seq(1.0, 0.0)),    // anchor
      (2L, 0, Seq(0.99, 0.1)),   // same label: never a negative
      (3L, 1, Seq(0.9, 0.1)),    // closest other-label
      (4L, 1, Seq(0.0, 1.0)),    // orthogonal
      (5L, 2, Seq(-1.0, 0.0)))   // opposite
    val out = Labels.hardNegatives(
      df.filter(col("vec_id") === 1), df, "vec_id", "embedding", "label", k = 3)
      .orderBy("neg_rank")
      .select("neg_id", "neg_label", "neg_rank").as[(Long, Int, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(3L, 4L, 5L))
    assert(!out.map(_._2).contains(0))
  }

  test("hardNegatives refuses unbounded anchor sets; LSH path takes over") {
    val rows = (0 until 40).map(i => (i.toLong, i % 2, Seq(1.0 + 0.01 * i, 0.5)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      Labels.hardNegatives(df, df, "vec_id", "embedding", "label", k = 2,
        maxBruteAnchors = 10)
    }
    assert(e.getMessage.contains("hardNegativesLsh"))
    // raising the ceiling explicitly still works
    assert(Labels.hardNegatives(df, df, "vec_id", "embedding", "label", k = 2,
      maxBruteAnchors = 100).count() > 0)
  }

  test("hardNegativesLsh finds the planted near-identical other-label row") {
    // anchor 0 (label 0) at (1, 0, ...); row 100 (label 1) nearly parallel
    // to it — LSH buckets agree on near-parallel vectors, so the planted
    // negative must surface at rank 1 despite the approximate candidates
    val dim = 8
    val rows =
      Seq((0L, 0, Seq.tabulate(dim)(d => if (d == 0) 1.0 else 0.0))) ++
      (1 until 20).map(i => (i.toLong, 0, Seq.tabulate(dim)(d => math.sin(i + d)))) ++
      Seq((100L, 1, Seq.tabulate(dim)(d => if (d == 0) 0.999 else 0.001))) ++
      (101 until 120).map(i => (i.toLong, 1, Seq.tabulate(dim)(d => math.cos(i + d))))
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = Labels.hardNegativesLsh(
      df.filter(col("vec_id") === 0), df, "vec_id", "embedding", "label",
      k = 3, dim = dim)
      .orderBy("neg_rank").collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(1) == 100L, s"expected planted negative first: ${out.toSeq}")
    assert(out.forall(_.getInt(2) == 1)) // never the anchor's own label
  }

  test("zero-norm embeddings never rank: NaN cosines drop before the heap") {
    // a zero vector's cosine is NaN; the q139/q140 oracles exclude NaN
    // rows (WHERE NOT isnan(cr)), and GroupTopK filters null/NaN scores
    // before the aggregator — so the engine must agree: no NaN-ranked
    // rows, and real rows still fill the ranks
    val df = emb(
      (1L, 0, Seq(1.0, 0.0)),
      (2L, 0, Seq(0.0, 0.0)),   // zero-norm, label 0
      (3L, 1, Seq(0.9, 0.1)),
      (4L, 1, Seq(0.0, 0.0)))   // zero-norm, label 1
    val noise = Labels.labelNoiseCandidates(df, "label", "vec_id", "embedding", k = 5)
      .collect()
    assert(!noise.map(_.getLong(1)).toSet.contains(2L))
    assert(!noise.map(_.getLong(1)).toSet.contains(4L))
    assert(noise.forall(r => !r.getDouble(2).isNaN))
    val negs = Labels.hardNegatives(
      df.filter(col("vec_id") === 1), df, "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(negs.map(_.getLong(1)).toSeq == Seq(3L)) // 4 is NaN-cos, dropped
    assert(negs.forall(r => !r.getDouble(3).isNaN))
  }
}
