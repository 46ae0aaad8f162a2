package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document-quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A1.1) — the classic pre-training corpus filter bundle:
  *
  *  - word count within [minWords, maxWords]
  *  - mean word length within [minAvgWordLen, maxAvgWordLen]
  *  - symbol-to-word ratio (`#` and ellipsis) at most maxSymbolRatio
  *  - at most maxBulletFrac of lines starting with a bullet marker
  *  - at most maxEllipsisFrac of lines ending with an ellipsis
  *  - at least minAlphaFrac of words containing an alphabetic character
  *  - at least minStopwordHits DISTINCT required stop words present
  *
  * Every measure is pure Catalyst `Column` arithmetic over the built-in
  * string/array HOFs — no UDFs, no shuffle, whole-stage codegen end to
  * end, so the filter is a map-side gate that scales linearly and runs
  * BEFORE any shuffle-bearing stage (dedup, sampling) in a pipeline.
  * The reference has no text operators (extension surface, like
  * [[TextAnalysis]]); thresholds default to the published values.
  */
object QualityRules {

  /** Threshold bundle; defaults are the published Gopher values. */
  final case class GopherConfig(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minAvgWordLen: Double = 3.0,
      maxAvgWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwordHits: Int = 2)

  /** The paper's required stop-word list ("contains at least two of the
    * following English words"). */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Count of `#` characters and non-overlapping ellipsis runs ("..." or
    * the Unicode one-char form) — Gopher's "symbols". */
  def symbolCount(text: Column): Column =
    size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))

  private def nonEmptyLines(text: Column): Column =
    filter(split(text, "\n"), l => length(l) > 0)

  /** Fraction of non-empty lines starting with a bullet marker
    * (`-`, `*`, `•`, `‣`, `▪` after optional leading whitespace);
    * null when the document has no non-empty lines. */
  def bulletLineFraction(text: Column): Column = {
    val lines = nonEmptyLines(text)
    size(filter(lines, l => l.rlike("^\\s*[-*•‣▪]"))).cast("double") /
      size(lines).cast("double")
  }

  /** Fraction of non-empty lines ending with an ellipsis; null when the
    * document has no non-empty lines. */
  def ellipsisLineFraction(text: Column): Column = {
    val lines = nonEmptyLines(text)
    size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") /
      size(lines).cast("double")
  }

  /** Fraction of whitespace words containing at least one ASCII letter;
    * null for empty documents. */
  def alphaWordFraction(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
      size(toks).cast("double")
  }

  /** Number of DISTINCT [[RequiredStopwords]] present as (lowercased)
    * whitespace tokens — presence, not occurrence count. */
  def requiredStopwordHits(text: Column): Column = {
    val lowToks = TextAnalysis.tokens(lower(text))
    RequiredStopwords
      .map(w => when(array_contains(lowToks, w), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** Adds the seven Gopher measures as `g_*` columns. Division by a zero
    * token/line count yields null (non-ANSI Spark semantics — the same
    * contract the oracle's DuckDB `x/0 -> NULL` mirrors); null text
    * yields null measures. */
  def withGopherMeasures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("g_words", TextAnalysis.tokenCount(t))
      .withColumn("g_avg_word_len", TextAnalysis.avgWordLen(t))
      .withColumn("g_symbol_ratio",
        symbolCount(t).cast("double") / TextAnalysis.tokenCount(t).cast("double"))
      .withColumn("g_bullet_frac", bulletLineFraction(t))
      .withColumn("g_ellipsis_frac", ellipsisLineFraction(t))
      .withColumn("g_alpha_frac", alphaWordFraction(t))
      .withColumn("g_stopword_hits", requiredStopwordHits(t))
  }

  /** Measures plus the overall `g_pass` verdict. A null component (empty
    * or null document) fails its rule — `g_pass` is never null. */
  def withGopherFlags(
      df: DataFrame,
      textCol: String,
      cfg: GopherConfig = GopherConfig()
  ): DataFrame = {
    val m = withGopherMeasures(df, textCol)
    val pass =
      col("g_words").between(cfg.minWords, cfg.maxWords) &&
        col("g_avg_word_len").between(cfg.minAvgWordLen, cfg.maxAvgWordLen) &&
        (col("g_symbol_ratio") <= cfg.maxSymbolRatio) &&
        // no non-empty lines -> null fraction -> vacuously compliant
        // (the paper's rules are line-shape caps, not line requirements)
        coalesce(col("g_bullet_frac") <= cfg.maxBulletFrac, lit(true)) &&
        coalesce(col("g_ellipsis_frac") <= cfg.maxEllipsisFrac, lit(true)) &&
        (col("g_alpha_frac") >= cfg.minAlphaFrac) &&
        (col("g_stopword_hits") >= cfg.minStopwordHits)
    m.withColumn("g_pass", coalesce(pass, lit(false)))
  }

  /** Keep only documents passing every rule (the map-side corpus gate). */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      cfg: GopherConfig = GopherConfig()
  ): DataFrame =
    withGopherFlags(df, textCol, cfg).filter(col("g_pass"))
      .drop("g_words", "g_avg_word_len", "g_symbol_ratio", "g_bullet_frac",
        "g_ellipsis_frac", "g_alpha_frac", "g_stopword_hits", "g_pass")
}
