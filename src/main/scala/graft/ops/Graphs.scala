package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph signals for corpus curation — currently weighted PageRank, the
  * classic domain-authority score: at web scale a crawl's link graph
  * ranks domains/pages, and the rank becomes a quality prior for
  * sampling (exactly how production corpora weight "reputable" sources).
  *
  * Engine-determinism contract: per-node in-flows are summed as a FOLD
  * OVER THE SOURCE-SORTED contribution list (the q84/q87 sorted-fold
  * pattern), never a shuffle-order `sum(double)` — so the FP ranks are
  * bit-reproducible across runs, partitionings, and engines, and the
  * whole operator is DuckDB-oracle-checkable.
  */
object Graphs {

  /** Weighted PageRank over an edge list, `iterations` fixed rounds of
    *
    *   rank(v) = (1−d)/N + d · Σ_{u→v} rank(u) · w(u,v) / outW(u)
    *
    * Parallel edges merge (weights sum; unweighted edges count). Nodes
    * with no in-edges settle at the teleport term; dangling nodes (no
    * out-edges) simply leak their mass — the common simplified variant,
    * fine for ranking and exactly mirrorable in SQL (no global
    * dangling-mass redistribution term).
    *
    * Scale shape: the normalized edge frame is built once (two shuffles:
    * parallel-edge merge + out-weight join) and eagerly checkpointed via
    * [[graft.Checkpoints]] — each of the K rounds references it, and
    * without the truncation Catalyst would re-derive it per round. K is
    * small and fixed (PageRank converges geometrically; 5-10 rounds
    * rank-order a graph), so the K-deep lazy plan stays trivial.
    *
    * Hub safety: web link graphs are power-law, so a single destination
    * can carry 10⁷⁺ in-edges — a one-level per-`dst` sorted fold would
    * materialize that hub's entire contribution list in ONE aggregation
    * buffer. In-flows are therefore summed as a TWO-LEVEL deterministic
    * fold: each edge lands in one of `foldBuckets` sub-buckets (an
    * md5-derived function of `src` — engine-mirrorable, unlike Spark's
    * internal hash), level 1 folds each (dst, bucket)'s contributions in
    * src-sorted order (buffers bounded by ~in-degree/foldBuckets), and
    * level 2 folds the ≤ `foldBuckets` partial sums in bucket order. The
    * fold structure is a pure function of the edge VALUES — never of
    * partitioning or arrival order — so ranks stay bit-reproducible
    * across runs, cluster sizes, and engines (an oracle replays the same
    * two-level order).
    *
    * `src` (and `dst`) ids should be integer- or string-typed: the bucket
    * derives from `cast(src as string)`, which is engine-portable for
    * those types (float formatting is not).
    *
    * @return (node, rank) — ranks sum to ≤ 1 (= 1 with no dangling mass)
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85,
      foldBuckets: Int = 1024
  ): DataFrame = {
    require(iterations > 0, "need at least one iteration")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    require(foldBuckets > 0, "foldBuckets must be positive")
    val w: Column = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    // merge parallel edges; drop null endpoints (unlinkable)
    val merged = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    val outW = merged.groupBy("src").agg(sum(col("w")).as("outw"))
    // deterministic, engine-mirrorable sub-bucket for the two-level fold:
    // 16 md5 bits of the source id, reduced mod foldBuckets (DuckDB:
    // CAST(('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 4)) AS BIGINT) % B)
    val bucket = pmod(
      conv(substring(md5(col("src").cast("string")), 1, 4), 16, 10).cast("long"),
      lit(foldBuckets.toLong))
    // one frame, referenced every round: truncate its lineage eagerly
    val normEdges = graft.Checkpoints.localCheckpoint(
      merged.join(outW, "src")
        .select(col("src"), col("dst"), col("w"), col("outw"), bucket.as("__b")))
    val nodes = graft.Checkpoints.localCheckpoint(
      normEdges.select(col("src").as("node"))
        .union(normEdges.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    val teleport = (1.0 - damping) / n.toDouble

    var ranks = nodes.withColumn("rank", lit(1.0 / n.toDouble))
    for (_ <- 1 to iterations) {
      val contribs = normEdges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), col("__b"),
          struct(col("src"), (col("rank") * col("w") / col("outw")).as("c"))
            .as("sc"))
      // level 1: src-sorted fold per (dst, sub-bucket) — bounded buffers
      val partials = contribs.groupBy(col("dst"), col("__b")).agg(
        aggregate(array_sort(collect_list(col("sc"))), lit(0.0),
          (acc, x) => acc + x.getField("c")).as("p"))
      // level 2: bucket-sorted fold of the partial sums per dst
      val sums = partials.groupBy("dst").agg(
        aggregate(array_sort(collect_list(struct(col("__b"), col("p")))), lit(0.0),
          (acc, x) => acc + x.getField("p")).as("acc"))
      ranks = nodes
        .join(sums.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("acc"), lit(0.0)))
            .as("rank"))
    }
    ranks
  }
}
