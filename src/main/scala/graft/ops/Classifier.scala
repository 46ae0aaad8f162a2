package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick linear text classifier — the fastText-style quality
  * filter shape used to gate web corpora (educational-value classifiers,
  * toxicity filters): a trained weight vector indexed by hashed token
  * buckets, applied as `sigmoid(bias + mean_token w[h(token) mod D])`.
  *
  * The engine ships the APPLICATION of such a model, not training —
  * weights arrive from the caller (typically exported from an offline
  * trainer). Everything is pure `Column` arithmetic folded in token
  * POSITION order: no UDF, no shuffle, no state — the whole scoring
  * stage is a map-side projection inside whole-stage codegen, which is
  * exactly what you want when gating 100 TB. The md5-prefix bucket hash
  * is engine-portable (same convention as [[Sampling.unitHash]]), so the
  * scores have a DuckDB oracle.
  */
object Classifier {

  /** sigmoid(bias + (Σ_positions w[md5(token) mod D]) / n_tokens) as a
    * Column; null text or zero tokens scores null. */
  def scoreColumn(text: Column, weights: Seq[Double], bias: Double): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val d = weights.size
    val wArr = array(weights.map(lit): _*)
    val toks = TextAnalysis.tokens(text)
    val contribs = transform(toks, t =>
      element_at(wArr,
        ((conv(substring(md5(t), 1, 8), 16, 10).cast("long") % d) + 1).cast("int")))
    val folded = aggregate(contribs, lit(0.0), (a, x) => a + x)
    val margin = lit(bias) + when(size(toks) > 0, folded / size(toks))
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Adds `outCol` with the classifier probability. */
  def withScore(
      df: DataFrame,
      textCol: String,
      weights: Seq[Double],
      bias: Double,
      outCol: String = "clf_prob"
  ): DataFrame =
    df.withColumn(outCol, scoreColumn(col(textCol), weights, bias))

  /** PORTABLE deterministic trainer for the hashing-trick linear
    * classifier — the in-engine path from labeled documents to a weight
    * vector [[withScore]] can gate with, with every arithmetic step
    * engine-replayable (the logreg sibling of
    * [[Similarity.trainKmeansPortable]] / BPE training):
    *
    *  - features: per-doc DENSE vector `f = [c_0/n … c_{dim−1}/n]` over
    *    the SAME md5 token buckets as [[scoreColumn]], materialized ONCE
    *    (`dim` is small and bounded — 64 doubles per doc — so dense
    *    beats the sparse (doc, bucket) frame the moment it is read more
    *    than once);
    *  - margin: `z = w · f` in ascending index order (the codegen'd
    *    [[graft.expressions.DotProduct]] — 0.0-seeded element-order sum,
    *    == DuckDB `list_dot_product`);
    *  - link: the RATIONAL sigmoid `p = 0.5·(1 + z/(1+|z|))` — only
    *    `+ × ÷ abs`, all IEEE-exact cross-engine, unlike `exp` whose
    *    last-ulp platform differences would compound across iterations;
    *    monotone like the logistic, so thresholding semantics match;
    *  - update: full-batch `w ← w − lr · (Σ_docs (p−y)·f) / N`, the
    *    gradient vector summed by the engine's TWO-LEVEL deterministic
    *    VECTOR fold ([[graft.expressions.OrderedKeyedVecSum]]: doc-id
    *    order within each md5 doc sub-bucket, then sub-bucket order) —
    *    bit-identical across runs, partitionings, and engines.
    *
    * Scale shape: the token explode + count + densify runs ONCE
    * (cached: `nDocs × dim` doubles); each iteration is then ONE
    * aggregation over that frame — margin and gradient read the SAME
    * doc row, so there is NO per-iteration join and the driver receives
    * exactly one `dim`-vector row per iteration, never data. (The
    * previous sparse shape joined the token-bucket frame against
    * per-doc margins every iteration — 3 actions and a shuffle per
    * step; measured 9.2s → well under 2s at sf0.1 after densifying.)
    * Memory of the level-1 fold: each doc-sub-bucket buffers
    * ≈ `nDocs/foldBuckets` dim-vectors before its sorted fold — at
    * large corpora scale `foldBuckets` up (the
    * [[Labels.labelCentroids]] rule). Labels must be 0/1; docs with
    * null id/label/text or zero tokens are excluded. Bias is not
    * trained (fold it in as a constant feature upstream if needed);
    * score the result with `bias = 0`. */
  def trainPortable(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      idCol: String,
      dim: Int = 64,
      iters: Int = 4,
      lr: Double = 0.5,
      foldBuckets: Int = 64
  ): Seq[Double] = {
    require(dim >= 1, "dim must be >= 1")
    require(iters >= 0, "iters must be >= 0")
    require(foldBuckets >= 1, "foldBuckets must be >= 1")
    val okvs = graft.expressions.OrderedKeyedVecSum.orderedKeyedVecSum _
    val toks = TextAnalysis.tokens(col(textCol))
    // NOTE: the token count n is NOT carried through the explode —
    // `size(toks)` as a grouping key collapses into the post-Generate
    // projection and re-tokenizes the full text once PER TOKEN (measured
    // 6.3s of a 6.6s aggregate at sf0.1). n = Σ_j c_j recovers the same
    // exact integer from the bucket counts for free.
    val exploded = docs
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(labelCol).cast("double").as("__y"),
        explode(toks).as("__t"))
      .withColumn("__j",
        conv(substring(md5(col("__t")), 1, 8), 16, 10).cast("long") % dim)
    val bOf = pmod(
      conv(substring(md5(col("__id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(foldBuckets.toLong))
    // the dense per-doc feature frame, built ONCE: sparse bucket counts
    // scatter into a dim-length array through a map literal (bucket
    // counts are exact longs, so the densify is order-independent — no
    // ordered fold needed until doubles appear)
    val feats = exploded
      .groupBy("__id", "__y", "__j")
      .agg(count(lit(1)).cast("long").as("__c"))
      .groupBy("__id", "__y")
      .agg(map_from_entries(collect_list(struct(col("__j"), col("__c")))).as("__m"),
        sum(col("__c")).as("__n"))
      .select(col("__id"), col("__y"), bOf.as("__b"),
        transform(sequence(lit(0L), lit((dim - 1).toLong)), jj =>
          coalesce(element_at(col("__m"), jj), lit(0L)).cast("double") /
            col("__n").cast("double")).as("__f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = feats.count()
      require(nd > 0, "no trainable documents (null/empty text or labels)")
      var w = Array.fill(dim)(0.0)
      var it = 0
      while (it < iters) {
        // ONE array literal, not dim scalar literals: a typedlit array
        // rides the codegen references array, so the generated source is
        // IDENTICAL across iterations and the JIT-compiled plan is
        // reused; 64 inlined double constants changed the source every
        // iteration and recompilation dominated training wall-clock
        // (measured ~10s flat at any sf before this)
        val wLit = typedlit(w.toSeq)
        // ONE aggregation per iteration: margin, residual, and the
        // per-doc gradient vector all come off the same cached row, then
        // the two-level ordered vector fold lands the dim-vector
        // gradient on the driver as a single row
        val g = feats
          .withColumn("__z", graft.expressions.VectorExpressions.dot(wLit, col("__f")))
          .withColumn("__r",
            lit(0.5) * (lit(1.0) + col("__z") / (lit(1.0) + abs(col("__z")))) - col("__y"))
          .withColumn("__gv",
            graft.expressions.VectorExpressions.scale(col("__f"), col("__r")))
          .groupBy("__b")
          .agg(okvs(collect_list(struct(col("__id").as("k"), col("__gv").as("v")))).as("__p"))
          .agg(okvs(collect_list(struct(col("__b").as("k"),
            col("__p").getField("_1").as("v")))).as("__g"))
          .select(col("__g").getField("_1"))
          .head().getSeq[Double](0)
        w = Array.tabulate(dim)(j => w(j) - lr * (g(j) / nd.toDouble))
        it += 1
      }
      w.toSeq
    } finally feats.unpersist()
  }

  /** Held-out evaluation of a trained gate — the missing third leg of
    * train ([[trainPortable]]) → gate ([[filterByScore]]) → AUDIT, the
    * same measure-don't-guess contract the near-dup family has in
    * [[Dedup.nearDupAuditSummary]] and ANN in [[Similarity.recallAtK]].
    *
    * Scores every doc in the chosen deterministic held-out `split`
    * ([[Sampling.withSplit]] unit-hash machinery — reproducible from the
    * ids alone, no stored split column needed) and returns ONE row of
    * threshold metrics from exact integer confusion counts:
    * `n_eval, tp, fp, tn, fn, accuracy_r, precision_r, recall_r, f1_r`.
    * Ratios are exact small rationals of the counts (round-6); an empty
    * denominator (no predicted positives / no actual positives / empty
    * split) yields null, never NaN. Unscorable docs (null/empty text)
    * are EXCLUDED and counted nowhere — the gate drops them too
    * ([[filterByScore]]), so evaluating them would charge the model for
    * rows it never judges. Labels must be 0/1.
    *
    * Scale shape: one map-side projection (score + split assignment are
    * both per-row expressions) and one global aggregate of six counts —
    * no shuffle beyond the final single-row reduce. */
  def evaluate(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      idCol: String,
      weights: Seq[Double],
      bias: Double = 0.0,
      threshold: Double = 0.5,
      split: String = "test",
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625),
      salt: String = "graft"
  ): DataFrame = {
    require(fractions.exists(_._1 == split),
      s"split '$split' not among ${fractions.map(_._1).mkString(", ")}")
    val scored = Sampling.withSplit(
      docs.filter(col(idCol).isNotNull && col(labelCol).isNotNull),
      idCol, fractions, salt)
      .filter(col("split") === split)
      .withColumn("__p", scoreColumn(col(textCol), weights, bias))
      .filter(col("__p").isNotNull)
      .select(col(labelCol).cast("double").as("__y"),
        (col("__p") >= lit(threshold)).as("__pos"))
    val isPos = col("__pos")
    val isY = col("__y") === 1.0
    scored.agg(
      count(lit(1)).as("n_eval"),
      count(when(isPos && isY, 1)).as("tp"),
      count(when(isPos && !isY, 1)).as("fp"),
      count(when(!isPos && !isY, 1)).as("tn"),
      count(when(!isPos && isY, 1)).as("fn"))
      .select(col("n_eval"), col("tp"), col("fp"), col("tn"), col("fn"),
        (round((col("tp") + col("tn")) / col("n_eval"), 6) + lit(0.0)).as("accuracy_r"),
        (round(col("tp") / (col("tp") + col("fp")), 6) + lit(0.0)).as("precision_r"),
        (round(col("tp") / (col("tp") + col("fn")), 6) + lit(0.0)).as("recall_r"),
        (round(lit(2.0) * col("tp") /
          (lit(2.0) * col("tp") + col("fp") + col("fn")), 6) + lit(0.0)).as("f1_r"))
  }

  /** Calibration table for a trained gate — does predicted probability
    * mean what it says? Rows bin by `floor(p·nBins)` (p = 1.0 clamps
    * into the last bin) and each bin reports `n`, `n_pos`,
    * `mean_p_r` (the bin's mean predicted probability — summed through
    * the engine's two-level doc-sorted fold so the double is
    * bit-reproducible), and `frac_pos_r` (the empirical rate from exact
    * integer counts). A well-calibrated gate has `mean_p_r ≈
    * frac_pos_r` per bin; systematic gaps say the threshold chosen from
    * p is lying about volume. Unscorable docs are excluded (the
    * [[evaluate]] contract); labels must be 0/1.
    *
    * Scale shape: one map-side score+bin projection, then the bounded
    * two-level fold — level-1 groups are (bin, md5 doc sub-bucket), so
    * no collect_list ever holds more than ≈ nDocs/foldBuckets entries. */
  def calibration(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      idCol: String,
      weights: Seq[Double],
      bias: Double = 0.0,
      nBins: Int = 10,
      foldBuckets: Int = 64
  ): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    require(foldBuckets >= 1, "foldBuckets must be >= 1")
    val oks = graft.expressions.OrderedKeyedSum.orderedKeyedSum _
    val rows = docs
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(labelCol).cast("double").as("__y"),
        scoreColumn(col(textCol), weights, bias).as("__p"))
      .filter(col("__p").isNotNull)
      .withColumn("__bin",
        least(floor(col("__p") * nBins).cast("int"), lit(nBins - 1)))
      .withColumn("__b", pmod(
        conv(substring(md5(col("__id").cast("string")), 1, 15), 16, 10).cast("long"),
        lit(foldBuckets.toLong)))
    rows
      .groupBy("__bin", "__b")
      .agg(oks(collect_list(struct(col("__id").as("k"), col("__p").as("v")))).as("__s"),
        count(lit(1)).as("__n"),
        count(when(col("__y") === 1.0, 1)).as("__np"))
      .groupBy("__bin")
      .agg(oks(collect_list(struct(col("__b").as("k"), col("__s").as("v")))).as("__ps"),
        sum(col("__n")).as("n"),
        sum(col("__np")).as("n_pos"))
      .select(col("__bin").as("bin"), col("n"), col("n_pos"),
        (round(col("__ps") / col("n"), 6) + lit(0.0)).as("mean_p_r"),
        (round(col("n_pos") / col("n"), 6) + lit(0.0)).as("frac_pos_r"))
  }

  /** Keeps rows whose probability clears `minProb`; unscorable rows
    * (null/empty text) are dropped — a gate must not pass what it cannot
    * judge. */
  def filterByScore(
      df: DataFrame,
      textCol: String,
      weights: Seq[Double],
      bias: Double,
      minProb: Double
  ): DataFrame =
    df.filter(scoreColumn(col(textCol), weights, bias) >= minProb)
}
