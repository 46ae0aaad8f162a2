package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * ingestion check that catches a silently changed upstream (crawler
  * config, source mix, schema drift) before it poisons a training run.
  * Population Stability Index over fixed-width bins:
  *
  *   PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
  *
  * with add-one (Laplace) smoothing on the bin counts so bins present on
  * only one side stay finite. Conventional reading: < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Scale shape: one groupBy per side (map-side combined), a full outer
  * join on the small bin table, totals broadcast back; the PSI total
  * folds per-bin contributions in bin order — deterministic FP,
  * engine-mirrorable.
  */
object Drift {

  /** Per-bin drift table: bin, counts, smoothed proportions, and each
    * bin's PSI contribution. `binWidth` buckets `valueCol` by integer
    * division (exact on integral columns). */
  def binContributions(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(df: DataFrame, out: String) = df
      .filter(col(valueCol).isNotNull)
      .groupBy(expr(s"$valueCol div $binWidth").as("bin"))
      .agg(count(lit(1)).as(out))
    driftFromCounts(bins(ref, "n_ref"), bins(cur, "n_cur"))
  }

  /** The [[binContributions]] arithmetic over PRE-AGGREGATED histograms
    * `(bin, n_ref)` / `(bin, n_cur)` — the serving shape: persist the
    * blessed snapshot's histogram once, and every later drift check
    * costs only the current side's count pass (the
    * [[tokenDriftFromCounts]] convention for numeric/cell bins). */
  def driftFromCounts(refCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = refCounts.join(curCounts, Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum("n_ref").as("__tr"), sum("n_cur").as("__tc"), count(lit(1)).as("__b"))
    val pRef = (col("n_ref") + lit(1L)).cast("double") / (col("__tr") + col("__b"))
    val pCur = (col("n_cur") + lit(1L)).cast("double") / (col("__tc") + col("__b"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_ref", pRef)
      .withColumn("p_cur", pCur)
      .withColumn("contrib", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      .drop("__tr", "__tc", "__b")
  }

  /** The scalar PSI (one row: `psi`, `n_bins`), folding contributions in
    * bin order so the sum is reproducible across runs and engines. */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      binWidth: Long
  ): DataFrame =
    binContributions(ref, cur, valueCol, binWidth)
      .agg(
        count(lit(1)).as("n_bins"),
        aggregate(
          array_sort(collect_list(struct(col("bin"), col("contrib").as("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("psi"))
      .select(col("psi"), col("n_bins"))

  /** EMBEDDING-space drift between two corpus snapshots: both sides
    * assign to a FROZEN quantizer's cells (the IVF centroid table, via
    * [[Similarity.assignCell]]'s literal-centroid argmax — zero
    * shuffle, the serving index's own assignment), and the add-one-
    * smoothed PSI runs over the cell histograms — the embedding answer
    * to "did the corpus move?" that a token monitor cannot see (a new
    * content cluster with familiar vocabulary, an embedding-model
    * regression). Per-cell table: `(cell, n_ref, n_cur, p_ref, p_cur,
    * contrib)`; freeze the quantizer at the blessed snapshot and every
    * later check is two scans + a cell-grain (≤ nLists rows) join.
    * Numeric determinism rides [[binContributions]]'s exact-integer
    * counts and single divisions. */
  /** Per-cell counts of a corpus under a frozen quantizer — the build
    * side of [[embeddingDriftCells]] and the persisted reference of
    * [[graft.streaming.StreamingEval.embeddingDriftStream]]. `bin` is
    * the cell id as a long (the [[binContributions]] bin convention). */
  def cellCounts(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double], Double)],
      out: String = "cnt"
  ): DataFrame = df
    .filter(col(vecCol).isNotNull)
    .groupBy(Similarity.assignCell(col(vecCol), centroids)
      .cast("long").as("bin"))
    .agg(count(lit(1)).as(out))

  def embeddingDriftCells(
      ref: DataFrame,
      cur: DataFrame,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double], Double)]
  ): DataFrame =
    driftFromCounts(
      cellCounts(ref, vecCol, centroids, "n_ref"),
      cellCounts(cur, vecCol, centroids, "n_cur"))
      .withColumnRenamed("bin", "cell")

  /** The scalar embedding-drift PSI (one row: `psi`, `n_cells`) —
    * [[embeddingDriftCells]] folded in cell order (the [[psi]]
    * reproducibility contract). */
  def embeddingDrift(
      ref: DataFrame,
      cur: DataFrame,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double], Double)]
  ): DataFrame =
    embeddingDriftCells(ref, cur, vecCol, centroids)
      .agg(
        count(lit(1)).as("n_cells"),
        aggregate(
          array_sort(collect_list(struct(col("cell"), col("contrib").as("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("psi"))
      .select(col("psi"), col("n_cells"))

  /** TOKEN-level drift between two corpus snapshots: the `k` tokens
    * whose smoothed frequency shift contributes most to the PSI —
    * the vocabulary answer to "what exactly changed in this crawl?"
    * (a new boilerplate phrase, a language shift, an encoding bug all
    * surface as named tokens, where the numeric [[binContributions]]
    * only flags THAT something moved). Same add-one-smoothed PSI
    * contribution per token, V = |joint vocabulary|; ranked by
    * |contrib| (ties toward the binary-smaller token). Output: `rank`,
    * `token`, `n_ref`, `n_cur`, `contrib`.
    *
    * Scale shape: one token-count aggregation per side (map-side
    * combined), a vocab-bounded full outer join, the 3-scalar totals
    * row broadcast back, and the [[GroupTopK.topKPerGroupString]] heap
    * for the cut — the exchange after scoring carries k rows per
    * partition, never the vocabulary tail. Winners join back for their
    * payload (broadcast sliver). */
  /** Corpus token counts `(token, <out>)` — the build side of
    * [[tokenDrift]] / [[tokenDriftFromCounts]]; persist the reference
    * snapshot's counts once and every later drift check costs only the
    * current side. */
  def tokenCounts(df: DataFrame, textCol: String, out: String = "cnt"): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(
        graft.expressions.WordGrams.wordGramsMulti(col(textCol), 1)).as("token"))
      .groupBy("token").agg(count(lit(1)).as(out))

  def tokenDrift(
      ref: DataFrame,
      cur: DataFrame,
      textCol: String,
      k: Int = 50
  ): DataFrame =
    tokenDriftFromCounts(
      tokenCounts(ref, textCol, "n_ref"), tokenCounts(cur, textCol, "n_cur"), k)

  /** [[tokenDrift]] over pre-aggregated counts `(token, n_ref)` /
    * `(token, n_cur)` — the serving shape: the reference counts persist
    * once ([[tokenCounts]]), each later check re-counts only the
    * current side (a micro-batch, a daily partition). */
  def tokenDriftFromCounts(
      refCounts: DataFrame,
      curCounts: DataFrame,
      k: Int = 50
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the joined vocab feeds the totals, the heap, AND the winner
    // join-back — cache it so the count aggregations run once
    val joint = graft.Checkpoints.trackCache(
      refCounts.select(col("token"), col("n_ref"))
        .join(curCounts.select(col("token"), col("n_cur")), Seq("token"), "full_outer")
        .select(col("token"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"))
        .persist())
    val totals = joint.agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"),
      count(lit(1)).as("__v"))
    val scored = joint.crossJoin(broadcast(totals))
      .withColumn("__p_ref", (col("n_ref") + 1).cast("double") / (col("__tr") + col("__v")))
      .withColumn("__p_cur", (col("n_cur") + 1).cast("double") / (col("__tc") + col("__v")))
      .withColumn("contrib",
        (col("__p_cur") - col("__p_ref")) * log(col("__p_cur") / col("__p_ref")))
    val winners = GroupTopK.topKPerGroupString(
        scored.withColumn("__g", lit(1)).withColumn("__score", abs(col("contrib"))),
        Seq("__g"), "token", "__score", k)
      .select(col("rank"), col("token"))
    scored.join(broadcast(winners), Seq("token"))
      .select(col("rank"), col("token"), col("n_ref"), col("n_cur"), col("contrib"))
  }
}
