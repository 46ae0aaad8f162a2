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

  /** The (id, tokens) frame all n-gram streams derive from. */
  private def tokenArrays(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__ts"))

  /** Interpolated TRIGRAM language-model scoring (Jelinek–Mercer): each
    * document position scores `ln p̂(w3 | w1 w2)` with
    * `p̂ = λ3·p_ML(w3|w1w2) + λ2·p_ML(w3|w2) + λ1·p_ML(w3)` — the classic
    * n-gram perplexity filter (CCNet runs a KenLM 5-gram; the published
    * recipe's shape is identical, interpolation weights instead of
    * Kneser–Ney backoff so every probability stays a ratio of integer
    * counts any engine re-derives).
    *
    * Per document: `n_trigrams`, `avg_logp`, `perplexity`. Fewer than
    * three tokens → null metrics. Self-trained by default; with a
    * reference `model` the standard OOV conventions apply: trigram
    * positions whose w3 UNIGRAM the model has never seen are skipped
    * (λ1·p1 > 0 keeps every kept position finite), and unseen
    * trigram/bigram contexts contribute 0 through their λ term.
    * `lambda1` must be positive — it is the floor that keeps ln finite.
    *
    * Scale shape: three map-side n-gram explodes into map-side-combined
    * count aggregates; probability joins key on the n-gram (never
    * broadcast-assumed — vocabulary³ worst case); the per-doc fold adds
    * `count × ln p̂` over DISTINCT trigrams in sorted order (identical-
    * value addition commutes exactly), the engine's deterministic-FP
    * convention. The token arrays and per-doc counts are barriers
    * (multiple consumers) and ride the managed checkpoint registry. */
  def trigramScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Option[DataFrame] = None,
      lambda3: Double = 0.7,
      lambda2: Double = 0.2,
      lambda1: Double = 0.1
  ): DataFrame = {
    require(lambda1 > 0.0, "lambda1 must be > 0 (the finite-logp floor)")
    require(lambda2 >= 0.0 && lambda3 >= 0.0, "lambdas must be non-negative")

    def triStream(toks: DataFrame): DataFrame = {
      val n = size(col("__ts"))
      val s1 = slice(col("__ts"), lit(1), n - 2)
      val s2 = slice(col("__ts"), lit(2), n - 2)
      val s3 = slice(col("__ts"), lit(3), n - 2)
      toks.filter(n >= 3)
        .select(toks.columns.filter(_ != "__ts").map(col) :+
          explode(zip_with(
            zip_with(s1, s2, (a, b) => struct(a.as("w1"), b.as("w2"))),
            s3,
            (ab, c) => struct(ab.getField("w1").as("w1"),
              ab.getField("w2").as("w2"), c.as("w3")))).as("__t"): _*)
        .select(toks.columns.filter(_ != "__ts").map(col) :+
          col("__t.w1").as("w1") :+ col("__t.w2").as("w2") :+
          col("__t.w3").as("w3"): _*)
    }
    def biStream(toks: DataFrame): DataFrame = {
      val n = size(col("__ts"))
      toks.filter(n >= 2)
        .select(explode(zip_with(
          slice(col("__ts"), lit(1), n - 1),
          slice(col("__ts"), lit(2), n - 1),
          (a, b) => struct(a.as("wa"), b.as("wb")))).as("__b"))
        .select(col("__b.wa").as("wa"), col("__b.wb").as("wb"))
    }

    val docToks = graft.Checkpoints.localCheckpoint(
      tokenArrays(docs, idCol, textCol), eager = false)
    // per-doc distinct trigram counts: feeds the self-trained model AND
    // the scoring join
    val tc = graft.Checkpoints.localCheckpoint(
      triStream(docToks)
        .groupBy(col(idCol), col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("__tc")))

    val modelToks = model match {
      case None    => docToks
      case Some(m) => graft.Checkpoints.localCheckpoint(
        tokenArrays(m, idCol, textCol), eager = false)
    }
    val triCounts = (model match {
      case None    => tc.groupBy("w1", "w2", "w3").agg(sum("__tc").as("__c3"))
      case Some(_) => triStream(modelToks)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("__c3"))
    })
    val ctx3 = triCounts.groupBy("w1", "w2").agg(sum("__c3").cast("long").as("__x3"))
    val p3 = triCounts.join(ctx3, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"), (col("__c3") / col("__x3")).as("__p3"))

    val biCounts = biStream(modelToks).groupBy("wa", "wb").agg(count(lit(1)).as("__c2"))
    val ctx2 = biCounts.groupBy("wa").agg(sum("__c2").cast("long").as("__x2"))
    val p2 = biCounts.join(ctx2, Seq("wa"))
      .select(col("wa").as("w2"), col("wb").as("w3"), (col("__c2") / col("__x2")).as("__p2"))

    val uniCounts = modelToks.select(explode(col("__ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__c1"))
    val totals = uniCounts.agg(sum("__c1").cast("long").as("__n1"))
    val p1 = uniCounts.crossJoin(broadcast(totals))
      .select(col("w").as("w3"), (col("__c1") / col("__n1")).as("__p1"))

    val phat = lit(lambda3) * coalesce(col("__p3"), lit(0.0)) +
      lit(lambda2) * coalesce(col("__p2"), lit(0.0)) +
      lit(lambda1) * col("__p1")
    val scored = tc
      .join(p1, Seq("w3")) // inner: unknown-w3 positions are skipped (OOV)
      .join(p3, Seq("w1", "w2", "w3"), "left")
      .join(p2, Seq("w2", "w3"), "left")
      .withColumn("__lp1", col("__tc") * log(phat))
      .withColumn("__g", concat_ws(" ", col("w1"), col("w2"), col("w3")))
      .groupBy(col(idCol))
      .agg(
        sum("__tc").as("n_trigrams"),
        aggregate(
          array_sort(collect_list(struct(col("__g"), col("__lp1").as("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("__lp"))
      .withColumn("avg_logp", col("__lp") / col("n_trigrams"))
      .withColumn("perplexity", exp(-col("avg_logp")))
      .drop("__lp")

    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }
}
