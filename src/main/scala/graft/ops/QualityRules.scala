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

  /** The all-rules verdict as ONE Column predicate (never null — a null
    * component, i.e. an empty or null document, fails its rule). Usable
    * directly in any `filter`; [[Pipelines.cleanCorpus]] folds it into
    * the quality stage. No non-empty lines -> null line fractions ->
    * vacuously compliant (the paper's rules are line-shape caps, not
    * line requirements; such docs fail the word-count rule anyway). */
  def gopherPass(text: Column, cfg: GopherConfig = GopherConfig()): Column = {
    val words = TextAnalysis.tokenCount(text)
    val pass =
      words.between(cfg.minWords, cfg.maxWords) &&
        TextAnalysis.avgWordLen(text)
          .between(cfg.minAvgWordLen, cfg.maxAvgWordLen) &&
        (symbolCount(text).cast("double") / words.cast("double")
          <= cfg.maxSymbolRatio) &&
        coalesce(bulletLineFraction(text) <= cfg.maxBulletFrac, lit(true)) &&
        coalesce(ellipsisLineFraction(text) <= cfg.maxEllipsisFrac, lit(true)) &&
        (alphaWordFraction(text) >= cfg.minAlphaFrac) &&
        (requiredStopwordHits(text) >= cfg.minStopwordHits)
    coalesce(pass, lit(false))
  }

  /** Measures plus the overall `g_pass` verdict. */
  def withGopherFlags(
      df: DataFrame,
      textCol: String,
      cfg: GopherConfig = GopherConfig()
  ): DataFrame =
    withGopherMeasures(df, textCol)
      .withColumn("g_pass", gopherPass(col(textCol), cfg))

  /** Keep only documents passing every rule (the map-side corpus gate);
    * adds no helper columns. */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      cfg: GopherConfig = GopherConfig()
  ): DataFrame =
    df.filter(gopherPass(col(textCol), cfg))
}
