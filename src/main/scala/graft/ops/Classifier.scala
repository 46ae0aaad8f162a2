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
