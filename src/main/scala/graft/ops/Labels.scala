package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-space data-quality operators over embedding tables: per-label
  * centroids, distance-to-own-centroid label-noise screening, and
  * hard-negative mining — the standard curation steps before training a
  * classifier or embedding model on weakly-labeled corpus data
  * (mislabeled-example detection à la confident learning, and
  * contrastive hard-negative selection).
  *
  * Determinism contract: centroid sums use the engine's two-level
  * deterministic fold (the PageRank hub-safe shape) — per
  * (label, dim, md5-sub-bucket) sorted-by-id folds, then a sorted fold
  * over the ≤ `buckets` partials — so the centroid doubles are
  * bit-identical across runs, partitionings, and engines, and every
  * downstream cosine is too. Rankings order by ROUND(cos, 6) with ties
  * toward the smaller id, the q50 convention that keeps rank boundaries
  * engine-stable.
  */
object Labels {

  private def bucketOf(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Per-label mean embedding: (label, centroid array<double>).
    *
    * Scale shape: posexplode to (label, dim, value) — the shuffle key is
    * (label, dim, bucket), so a label owning most of the corpus spreads
    * over `buckets` × dim aggregation buffers instead of concentrating
    * its whole column in one; no buffer ever holds more than its
    * sub-bucket's values, and the second-level fold sees ≤ `buckets`
    * rows. Null vectors are excluded. Ids must be numeric-castable and
    * unique (the engine-wide unit-hash contract): the native fold sorts
    * by the id cast to long. */
  def labelCentroids(
      df: DataFrame,
      labelCol: String,
      idCol: String,
      vecCol: String,
      buckets: Int = 64
  ): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val dims = df
      .filter(col(vecCol).isNotNull && col(idCol).isNotNull)
      .select(col(labelCol).as("label"), col(idCol).as("__id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "__x")))
      .withColumn("__b", bucketOf(col("__id"), buckets))
    // the fold itself is the native OrderedKeyedSum — identical order
    // (sort by id / by bucket, then left-fold) to the HOF
    // aggregate(array_sort(collect_list(...))) convention, but one
    // codegen'd call instead of an interpreted lambda per element
    // (330s -> seconds at 10⁸ exploded elements in ScaleSmoke)
    val oks = graft.expressions.OrderedKeyedSum.orderedKeyedSum _
    val partial = dims
      .groupBy("label", "dim", "__b")
      .agg(
        oks(collect_list(struct(col("__id").cast("long").as("k"), col("__x").as("v"))))
          .as("__ps"),
        count(lit(1)).as("__n"))
    val perDim = partial
      .groupBy("label", "dim")
      .agg(
        oks(collect_list(struct(col("__b").as("k"), col("__ps").as("v")))).as("__sum"),
        sum("__n").as("__cnt"))
      .select(col("label"), col("dim"), (col("__sum") / col("__cnt")).as("__mean"))
    perDim
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("__mean")))).as("__dm"))
      .select(col("label"),
        transform(col("__dm"), s => s.getField("__mean")).as("centroid"))
  }

  /** Cosine of every row's embedding against ITS OWN label centroid:
    * input columns + `cos_centroid`. The centroid frame is |labels| rows
    * — the join is broadcast-sized by construction, so this is one
    * map-side pass over the corpus. */
  def centroidSimilarity(
      df: DataFrame,
      labelCol: String,
      vecCol: String,
      centroids: DataFrame
  ): DataFrame =
    df.join(broadcast(centroids.withColumnRenamed("label", labelCol)), labelCol)
      .withColumn("cos_centroid",
        Similarity.cosine(col(vecCol).cast("array<double>"), col("centroid")))
      .drop("centroid")

  /** The k rows per label LEAST similar to their own label centroid —
    * label-noise candidates (a mislabeled row sits far from its class
    * mean). Ranks by round(cos, 6) ascending, ties toward the smaller
    * id; output: (label, id, cos_centroid, noise_rank).
    *
    * Scale shape: centroid computation (above) + one map-side cosine +
    * the [[GroupTopK]] heap (k rows per label cross the shuffle — never
    * a per-label sort). */
  def labelNoiseCandidates(
      df: DataFrame,
      labelCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      buckets: Int = 64
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cents = labelCentroids(df, labelCol, idCol, vecCol, buckets)
    val scored = centroidSimilarity(
      df.filter(col(vecCol).isNotNull && col(idCol).isNotNull)
        .select(col(labelCol), col(idCol), col(vecCol)),
      labelCol, vecCol, cents)
      // negate: the heap keeps the HIGHEST score, we want the lowest cos;
      // pre-round so rank boundaries are engine-stable (q50 convention)
      .withColumn("__neg", -(round(col("cos_centroid"), 6) + lit(0.0)))
    GroupTopK.topKPerGroup(scored, Seq(labelCol), idCol, "__neg", k,
        rankCol = "noise_rank")
      .select(col(labelCol), col(idCol),
        // + 0.0 renormalizes the double negation's -0.0 (driver hashes sign)
        (-col("__neg") + lit(0.0)).as("cos_centroid_r"), col("noise_rank"))
  }

  /** Hard-negative mining for contrastive training: for each anchor, the
    * k most-similar corpus rows with a DIFFERENT label. Ranks by
    * round(cos, 6) descending, ties toward the smaller corpus id;
    * output: (anchor id, neg_id, neg_label, cos_r, neg_rank).
    *
    * Scale shape: brute-force anchor × corpus scoring reduced by the
    * [[GroupTopK]] heap map-side (≤ k rows per anchor reach the shuffle)
    * — the right shape when anchors are a bounded mining batch (the
    * standard setup: mine hard negatives for a training epoch's sample).
    * For anchor sets at corpus scale, pre-bucket with
    * [[Similarity.lshTopK]]'s hyperplane buckets and mine within
    * buckets instead. */
  def hardNegatives(
      anchors: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val a = anchors.select(
      col(idCol).as("anchor_id"), col(labelCol).as("anchor_label"),
      col(vecCol).cast("array<double>").as("__av"))
    val c = corpus.select(
      col(idCol).as("neg_id"), col(labelCol).as("neg_label"),
      col(vecCol).cast("array<double>").as("__cv"))
    val scored = a.crossJoin(c)
      .filter(col("neg_label") =!= col("anchor_label"))
      .withColumn("__cos", round(Similarity.cosine(col("__av"), col("__cv")), 6) + lit(0.0))
      .select(col("anchor_id"), col("neg_id"), col("__cos"))
    val top = GroupTopK.topKPerGroup(scored, Seq("anchor_id"), "neg_id", "__cos", k,
      rankCol = "neg_rank")
    top
      .join(c.select(col("neg_id"), col("neg_label")), "neg_id")
      .select(col("anchor_id"), col("neg_id"), col("neg_label"),
        col("__cos").as("cos_r"), col("neg_rank"))
  }
}
