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
    * Scale shape: the shuffle carries ROWS (id, vector), never row × dim
    * exploded elements — at 768-dim embeddings the exploded shape
    * multiplies shuffle rows by the dimensionality and dominated
    * everything (measured 330s → 32s at 12M × 8 dims across the redesigns
    * of this fold). A label owning most of the corpus spreads over
    * `buckets` md5 sub-buckets instead of concentrating in one
    * aggregation buffer; the second-level fold sees ≤ `buckets` rows.
    *
    * Level-1 determinism is ORDER-INDEPENDENT of the aggregate exec:
    * each (label, bucket) group collects its (id, vector) structs — in
    * whatever order the exec delivers them (hash, sort-based fallback,
    * partial merges: all irrelevant) — and the native
    * [[graft.expressions.OrderedKeyedVecSum]] sorts by id and folds
    * elementwise in id order, the unseeded `v0 + v1 + ...` per dimension
    * the oracle replays. (The previous Aggregator folded in ARRIVAL
    * order and silently depended on a repartition+sortWithinPartitions
    * order surviving ObjectHashAggregateExec — which its sort-based
    * fallback past 128 distinct keys/partition does not guarantee.)
    *
    * Memory: one (label, bucket) group buffers |group|/`buckets` vectors
    * in its collect_list before the fold — at large per-label row counts
    * scale `buckets` up (≈ sqrt(rowsPerLabel) balances the level-1 list
    * against the level-2 partial count). Null vectors are excluded. Ids
    * must be numeric-castable and unique (the engine-wide unit-hash
    * contract): the native fold sorts by the id cast to long. */
  def labelCentroids(
      df: DataFrame,
      labelCol: String,
      idCol: String,
      vecCol: String,
      buckets: Int = 64
  ): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val rows = df
      .filter(col(vecCol).isNotNull && col(idCol).isNotNull)
      .select(col(labelCol).as("label"), col(idCol).cast("long").as("__id"),
        bucketOf(col(idCol), buckets).as("__b"),
        col(vecCol).cast("array<double>").as("__v"))
    val partial = rows
      .groupBy("label", "__b")
      .agg(graft.expressions.OrderedKeyedVecSum.orderedKeyedVecSum(
        collect_list(struct(col("__id").as("k"), col("__v").as("v")))).as("__vs"))
    // level 2: ≤ `buckets` partial vectors per label — tiny. Explode to
    // dims and fold partials in bucket order through the native
    // OrderedKeyedSum (seeded 0.0 + p0 + p1 + ..., the list_prepend form).
    val oks = graft.expressions.OrderedKeyedSum.orderedKeyedSum _
    val perDim = partial
      .select(col("label"), col("__b"), col("__vs._2").as("__n"),
        posexplode(col("__vs._1")).as(Seq("dim", "__ps")))
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

  /** Per-DIMENSION corpus statistics of an embedding column: (dim, mean,
    * variance, std), with both moments accumulated through the same
    * vector-wise deterministic fold as [[labelCentroids]] (Σx and Σx² per
    * dimension fold in id order within md5 sub-buckets, then over the
    * ≤ `buckets` partials) — so the statistics are bit-identical across
    * runs, partitionings, and engines. Variance is the population
    * `Σx²/n − mean²` clamped at 0 (FP can dip a hair negative on
    * near-constant dimensions). The input to feature standardization /
    * whitening and to per-dimension drift monitoring. */
  def dimStats(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      buckets: Int = 64
  ): DataFrame = {
    val sq = df
      .filter(col(vecCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol), col("__v"),
        transform(col("__v"), x => x * x).as("__v2"))
    val means = labelCentroids(
      sq.select(lit(0).as("__one"), col(idCol), col("__v")),
      "__one", idCol, "__v", buckets)
      .select(posexplode(col("centroid")).as(Seq("dim", "mean")))
    val sqMeans = labelCentroids(
      sq.select(lit(0).as("__one"), col(idCol), col("__v2")),
      "__one", idCol, "__v2", buckets)
      .select(posexplode(col("centroid")).as(Seq("dim", "__m2")))
    means.join(sqMeans, "dim")
      .select(col("dim"), col("mean"),
        greatest(col("__m2") - col("mean") * col("mean"), lit(0.0)).as("variance"))
      .withColumn("std", sqrt(col("variance")))
  }

  /** Standardize an embedding column against [[dimStats]]: adds `outCol`
    * = `(x_d − mean_d) / std_d` per dimension (zero-variance dimensions
    * map to 0.0 — they carry no signal, and the alternative is a
    * division by zero poisoning the whole vector). Stats travel as plain
    * literal arrays (dim doubles — driver-sized by construction), so the
    * transform is a zero-shuffle codegen'd projection, stream-legal. */
  def standardize(
      df: DataFrame,
      vecCol: String,
      stats: Seq[(Int, Double, Double)], // (dim, mean, std), dim-sorted
      outCol: String = "z_vec"
  ): DataFrame = {
    require(stats.nonEmpty, "need at least one dimension")
    val sorted = stats.sortBy(_._1)
    val meansLit = typedlit(sorted.map(_._2))
    val stdsLit = typedlit(sorted.map(_._3))
    val centered = zip_with(col(vecCol).cast("array<double>"), meansLit,
      (x, m) => x - m)
    df.withColumn(outCol,
      zip_with(centered, stdsLit,
        (d, s) => when(s === 0.0, lit(0.0)).otherwise(d / s)))
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
    * — the right shape ONLY when anchors are a bounded mining batch (the
    * standard setup: mine hard negatives for a training epoch's sample).
    * The anchor frame is counted up-front and the call FAILS LOUDLY past
    * `maxBruteAnchors` (the cross join's cost is |anchors| full corpus
    * scans — a silent scale-killer otherwise); large anchor sets belong
    * on [[hardNegativesLsh]]. */
  def hardNegatives(
      anchors: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      maxBruteAnchors: Int = 10000
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxBruteAnchors >= 1, "maxBruteAnchors must be >= 1")
    // limit(n+1).count() bounds the guard's own cost: the scan stops at
    // n+1 rows, never counting a corpus-sized anchor frame in full
    val nAnchors = anchors.limit(maxBruteAnchors + 1).count()
    require(nAnchors <= maxBruteAnchors,
      s"hardNegatives is a brute-force anchors x corpus scan: got > $maxBruteAnchors " +
        s"anchor rows; use hardNegativesLsh for large anchor sets " +
        s"(or raise maxBruteAnchors explicitly)")
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

  /** [[hardNegatives]] for anchor sets at corpus scale: candidate pairs
    * come from hyperplane-LSH bucket equi-joins (the
    * [[Similarity.lshTopK]] machinery — `nTables` independent `nBits`-bit
    * sign-bucket tables, candidates = different-label rows sharing a
    * bucket in ANY table), then only candidates get the exact cosine +
    * [[GroupTopK]] heap ranking. Approximate where the brute path is
    * exact — a far anchor–negative pair landing in no shared bucket is
    * missed — which is the standard LSH recall trade, and hard-negative
    * mining wants the HIGH-cosine pairs LSH is best at keeping.
    *
    * Scale shape: no cartesian anywhere (PlanShapeSpec-pinned) — two
    * bucket projections, `nTables`-way equi-join, candidate dedup, two
    * id equi-joins to fetch vectors, heap top-k. Bucket frames carry ids
    * and labels only; vectors never travel through the bucket join.
    * Output: (anchor_id, neg_id, neg_label, cos_r, neg_rank) — same
    * schema and ranking convention as [[hardNegatives]]. */
  def hardNegativesLsh(
      anchors: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      dim: Int,
      nBits: Int = 8,
      nTables: Int = 4
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val a = Similarity.lshBuckets(anchors, idCol, vecCol, "anchor_id",
      dim, nBits, nTables, extraCols = Seq(labelCol -> "anchor_label"))
    val c = Similarity.lshBuckets(corpus, idCol, vecCol, "neg_id",
      dim, nBits, nTables, extraCols = Seq(labelCol -> "neg_label"))
    val candidates = c
      .join(a, Seq("table", "bucket"))
      .filter(col("neg_label") =!= col("anchor_label"))
      .select("anchor_id", "neg_id")
      .distinct()
    val scored = candidates
      .join(corpus.select(col(idCol).as("neg_id"), col(labelCol).as("neg_label"),
        col(vecCol).cast("array<double>").as("__cv")), "neg_id")
      .join(anchors.select(col(idCol).as("anchor_id"),
        col(vecCol).cast("array<double>").as("__av")), "anchor_id")
      .withColumn("__cos", round(Similarity.cosine(col("__av"), col("__cv")), 6) + lit(0.0))
      .select(col("anchor_id"), col("neg_id"), col("__cos"))
    GroupTopK.topKPerGroup(scored, Seq("anchor_id"), "neg_id", "__cos", k,
        rankCol = "neg_rank")
      .join(corpus.select(col(idCol).as("neg_id"), col(labelCol).as("neg_label")), "neg_id")
      .select(col("anchor_id"), col("neg_id"), col("neg_label"),
        col("__cos").as("cos_r"), col("neg_rank"))
  }
}
