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
    *  - features: per-doc bucket counts `c_j` over the SAME md5 token
    *    buckets as [[scoreColumn]], normalized by token count `n`;
    *  - margin: `z = Σ_j w_j · c_j / n` folded in ASCENDING bucket order
    *    (the [[graft.expressions.OrderedKeyedSum]] seeded-fold
    *    convention — exec-order-independent);
    *  - link: the RATIONAL sigmoid `p = 0.5·(1 + z/(1+|z|))` — only
    *    `+ × ÷ abs`, all IEEE-exact cross-engine, unlike `exp` whose
    *    last-ulp platform differences would compound across iterations;
    *    monotone like the logistic, so thresholding semantics match;
    *  - update: full-batch `w_j ← w_j − lr · (Σ_docs (p−y)·c_j/n) / N`,
    *    the gradient summed by the engine's TWO-LEVEL deterministic fold
    *    (doc-sorted per (bucket j, md5 doc sub-bucket), then sub-bucket
    *    order) — bit-identical across runs, partitionings, and engines.
    *
    * Scale shape: token explode + count aggregation runs ONCE (cached,
    * pre-partitioned by doc id so per-iteration stages reuse the
    * partitioning); each iteration is one action — margin aggregate +
    * two-level gradient fold — and the driver holds `dim` doubles, never
    * data. Memory of the level-1 gradient fold: each (bucket j,
    * doc-sub-bucket) group buffers ≈ `nDocs / foldBuckets` (id, value)
    * pairs before its sorted fold — at large corpora scale `foldBuckets`
    * up (≈ sqrt(nDocs) balances level-1 lists against the level-2
    * partial count, the [[Labels.labelCentroids]] rule). Labels must be
    * 0/1; docs with null id/label/text or zero tokens are excluded.
    * Bias is not trained (fold it in as a constant feature upstream if
    * needed); score the result with `bias = 0`. */
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
    val oks = graft.expressions.OrderedKeyedSum.orderedKeyedSum _
    val toks = TextAnalysis.tokens(col(textCol))
    val exploded = docs
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(labelCol).cast("double").as("__y"),
        size(toks).as("__n"), explode(toks).as("__t"))
      .withColumn("__j",
        conv(substring(md5(col("__t")), 1, 8), 16, 10).cast("long") % dim)
    // cached pre-partitioned by doc id: every iteration's margin
    // aggregate (grouping key __id, __y — clustered by __id) and the
    // gradient join (on __id) then reuse this partitioning instead of
    // re-exchanging the token counts 2x per iteration
    val tc = exploded
      .groupBy("__id", "__y", "__n", "__j")
      .agg(count(lit(1)).cast("long").as("__c"))
      .repartition(col("__id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = tc.select("__id").distinct().count()
      require(nd > 0, "no trainable documents (null/empty text or labels)")
      val bOf = pmod(
        conv(substring(md5(col("__id").cast("string")), 1, 15), 16, 10).cast("long"),
        lit(foldBuckets.toLong))
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
        val margins = tc
          .withColumn("__wv",
            element_at(wLit, (col("__j") + 1).cast("int")) * col("__c") / col("__n"))
          .groupBy("__id", "__y")
          .agg(oks(collect_list(struct(col("__j").as("k"), col("__wv").as("v")))).as("__z"))
          .withColumn("__r",
            lit(0.5) * (lit(1.0) + col("__z") / (lit(1.0) + abs(col("__z")))) - col("__y"))
          .select("__id", "__r")
        val lvl1 = tc.join(margins, "__id")
          .withColumn("__v", col("__r") * col("__c") / col("__n"))
          .withColumn("__b", bOf)
          .groupBy("__j", "__b")
          .agg(oks(collect_list(struct(col("__id").as("k"), col("__v").as("v")))).as("__p"))
        val grad = lvl1
          .groupBy("__j")
          .agg(oks(collect_list(struct(col("__b").as("k"), col("__p").as("v")))).as("__g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        w = Array.tabulate(dim)(j => w(j) - lr * (grad.getOrElse(j, 0.0) / nd.toDouble))
        it += 1
      }
      w.toSeq
    } finally tc.unpersist()
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
