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
    val joined = bins(ref, "n_ref").join(bins(cur, "n_cur"), Seq("bin"), "full")
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
}
