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
    * parallel-edge merge + out-weight join) and eagerly localCheckpointed
    * — each of the K rounds references it, and without the truncation
    * Catalyst would re-derive it per round. A round is one join + one
    * groupBy on `dst` (the contribution shuffle) + a left join back to
    * the node set; ranks are two-column frames. K is small and fixed
    * (PageRank converges geometrically; 5-10 rounds rank-order a graph),
    * so the K-deep lazy plan stays trivial.
    *
    * @return (node, rank) — ranks sum to ≤ 1 (= 1 with no dangling mass)
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85
  ): DataFrame = {
    require(iterations > 0, "need at least one iteration")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val w: Column = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    // merge parallel edges; drop null endpoints (unlinkable)
    val merged = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    val outW = merged.groupBy("src").agg(sum(col("w")).as("outw"))
    // one frame, referenced every round: truncate its lineage eagerly
    val normEdges = merged.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .localCheckpoint(true)
    val nodes = normEdges.select(col("src").as("node"))
      .union(normEdges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val teleport = (1.0 - damping) / n.toDouble

    var ranks = nodes.withColumn("rank", lit(1.0 / n.toDouble))
    for (_ <- 1 to iterations) {
      val contribs = normEdges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          struct(col("src"), (col("rank") * col("w") / col("outw")).as("c"))
            .as("sc"))
      // source-sorted fold: deterministic double sum per destination
      val sums = contribs.groupBy("dst").agg(
        aggregate(array_sort(collect_list(col("sc"))), lit(0.0),
          (acc, x) => acc + x.getField("c")).as("acc"))
      ranks = nodes
        .join(sums.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("acc"), lit(0.0)))
            .as("rank"))
    }
    ranks
  }
}
