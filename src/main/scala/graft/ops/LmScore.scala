package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the CCNet/RefinedWeb-style
  * "perplexity filter": score each document by its average bigram
  * log-probability under the corpus' OWN maximum-likelihood bigram model,
  * so formulaic/repetitive documents (high probability, low perplexity)
  * and token-salad documents (low probability, high perplexity) both
  * stand out from the bulk. No external model artifact is needed; scoring
  * a corpus against a reference corpus is the same code with the model
  * built from the other frame.
  *
  * Scale shape: bigram extraction is a map-side explode; the per-doc
  * bigram counts are persisted ONCE and feed both the model aggregation
  * (two map-side-combined groupBys) and the scoring join; the
  * model-to-document join is a plain shuffle join keyed by bigram (the
  * model table is corpus-sized vocabulary² in the worst case — never
  * assume broadcastable). The per-document sum folds contributions in
  * bigram-sorted order so the FP result is reproducible and
  * engine-mirrorable.
  */
object LmScore {

  /** The exploded (id, "w1 w2") bigram stream for a frame. */
  private def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(col(idCol), explode(
        zip_with(
          slice(col("__ts"), lit(1), size(col("__ts")) - 1),
          slice(col("__ts"), lit(2), size(col("__ts")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))

  /** Per-document `n_bigrams`, `avg_logp` (mean ln p(w_i | w_{i-1})), and
    * `perplexity` (= exp(−avg_logp)). Documents with fewer than two
    * tokens have no bigrams and get null metrics. MLE probabilities:
    * p(b|a) = count(a b) / Σ_w count(a w).
    *
    * `model` supplies the corpus the probabilities are estimated from;
    * None (default) self-trains on `docs` — there every document bigram
    * occurs in the model by construction, so no smoothing is needed, and
    * the signal reads as "how ambiguous are this document's
    * continuations within this corpus". With a reference `model`
    * (the CCNet filtering shape), bigrams the model has never seen are
    * SKIPPED — `n_bigrams` counts model-known bigrams only, the standard
    * OOV convention; a document sharing nothing with the model gets null
    * metrics.
    */
  def bigramScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Option[DataFrame] = None
  ): DataFrame = {
    // barrier: the per-doc counts feed the (self-trained) model
    // aggregation AND the scoring join; without it the corpus
    // scan + explode recomputes per consumer. Eager checkpoint, not
    // persist: the returned frame still references these counts, so there
    // is no safe unpersist point here — blocks are released by the
    // host's `Checkpoints.freeAll` barrier once the result is
    // materialized (ContextCleaner as fallback).
    val bc = graft.Checkpoints.localCheckpoint(bigramPairs(docs, idCol, textCol)
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("__bc"))
      .withColumn("__w1", split(col("bigram"), " ").getItem(0)))

    val modelPairs = model match {
      case None    => bc.select(col("__w1"), col("bigram"), col("__bc"))
      case Some(m) => bigramPairs(m, idCol, textCol)
        .select(split(col("bigram"), " ").getItem(0).as("__w1"), col("bigram"),
          lit(1L).as("__bc"))
    }
    val bigramCounts = modelPairs.groupBy("__w1", "bigram").agg(sum("__bc").as("__c2"))
    val headCounts = bigramCounts.groupBy("__w1").agg(sum("__c2").as("__c1"))
    val probs = bigramCounts
      .join(headCounts, Seq("__w1"))
      .select(col("bigram"), (col("__c2") / col("__c1")).as("__p"))

    // Σ_positions ln p = Σ_distinct-bigrams (count × ln p): identical-value
    // addition commutes exactly, so folding the DISTINCT bigrams in sorted
    // order is both deterministic and position-faithful
    val scored = bc
      .join(probs, Seq("bigram"))
      .groupBy(col(idCol))
      .agg(
        sum("__bc").as("n_bigrams"),
        aggregate(
          array_sort(collect_list(struct(col("bigram"), (col("__bc") * log(col("__p"))).as("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("__lp"))
      .withColumn("avg_logp", col("__lp") / col("n_bigrams"))
      .withColumn("perplexity", exp(-col("avg_logp")))
      .drop("__lp")

    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }
}
