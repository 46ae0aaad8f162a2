package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset "datasheet" reports — the per-source summary a training-data
  * pipeline publishes alongside a corpus release (datasheets-for-datasets
  * style): volume, token mass, exact-duplication rate, quality, and
  * language mix, each computed with the engine's deterministic
  * conventions so the whole card is DuckDB-oracle-checkable.
  */
object Reports {

  private def bucketOf(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Per-source corpus datasheet:
    *
    *  - `n_docs`, `n_tokens` (whitespace tokens), `n_chars` — exact
    *    integer sums, order-independent;
    *  - `n_exact_classes` (distinct canonical fingerprints) and
    *    `dup_rate_r = round(1 − classes/docs, 6)` — the exact-dup burden;
    *  - `mean_quality_r` — the heuristic quality blend averaged through
    *    the engine's two-level deterministic fold (doc-sorted per md5
    *    sub-bucket, then sub-bucket order), bit-reproducible, round 9;
    *  - `top_lang` — majority [[TextAnalysis.langId]] vote; ties break
    *    toward the LARGER language code (max-struct order).
    *
    * Scale shape: four per-source aggregations (each bounded at
    * |sources| output rows; the quality fold spreads any hot source over
    * `foldBuckets` sub-buckets — scale it ≈ sqrt(rowsPerSource) at large
    * corpora, the [[Labels.labelCentroids]] rule) joined on the tiny
    * source key — the corpus streams through map-side projections,
    * nothing collects. Null-id/null-text rows are excluded (they carry
    * no judgeable content). */
  def corpusDatasheet(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      sourceCol: String = "source",
      foldBuckets: Int = 64
  ): DataFrame = {
    require(foldBuckets >= 1, "foldBuckets must be >= 1")
    val oks = graft.expressions.OrderedKeyedSum.orderedKeyedSum _
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).as("source"), col(idCol).cast("long").as("__id"),
        col(textCol).as("__text"))
      .withColumn("__ntok", TextAnalysis.tokenCount(col("__text")).cast("long"))
      .withColumn("__nchr", length(col("__text")).cast("long"))
      .withColumn("__q", TextAnalysis.qualityScore(col("__text")))
      .withColumn("__lang", TextAnalysis.langId(col("__text")))
      .withColumn("__fp", TextAnalysis.fingerprint(col("__text")))

    // exact integer totals — order-free
    val volumes = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("__ntok").as("n_tokens"),
      sum("__nchr").as("n_chars"))

    // exact-dup burden: distinct canonical fingerprints per source
    val classes = base.groupBy("source")
      .agg(countDistinct(col("__fp")).as("n_exact_classes"))

    // deterministic mean quality: two-level sorted fold (the centroid
    // shape on a scalar), so the double is bit-identical across runs,
    // partitionings, and engines
    val qLvl1 = base
      .withColumn("__b", bucketOf(col("__id"), foldBuckets))
      .groupBy("source", "__b")
      .agg(oks(collect_list(struct(col("__id").as("k"), col("__q").as("v")))).as("__p"),
        count(lit(1)).as("__n"))
    val quality = qLvl1.groupBy("source")
      .agg((oks(collect_list(struct(col("__b").as("k"), col("__p").as("v"))))
        / sum("__n")).as("__mq"))
      .select(col("source"), (round(col("__mq"), 9) + lit(0.0)).as("mean_quality_r"))

    // majority language: max over (count, lang) structs — deterministic
    // tie toward the larger code
    val langs = base.groupBy("source", "__lang").agg(count(lit(1)).as("__c"))
      .groupBy("source")
      .agg(max(struct(col("__c"), col("__lang").as("l"))).getField("l").as("top_lang"))

    volumes
      .join(classes, "source")
      .join(quality, "source")
      .join(langs, "source")
      .withColumn("dup_rate_r",
        round(lit(1.0) - col("n_exact_classes") / col("n_docs"), 6) + lit(0.0))
      .select("source", "n_docs", "n_tokens", "n_chars", "n_exact_classes",
        "dup_rate_r", "mean_quality_r", "top_lang")
  }

  /** CROSS-SOURCE duplication matrix — which sources copy each other
    * verbatim (mirror sites, syndicated feeds, scraper echoes): one row
    * per unordered source pair that shares at least one exact canonical
    * class, with the shared-class count. The input to "drop the mirror,
    * keep the origin" mixing decisions.
    *
    * Scale shape: the corpus reduces to DISTINCT (fingerprint, source)
    * rows first, so the per-fingerprint self-join is bounded by
    * sources-per-class (≤ |sources|), never members-per-class — a
    * million-copy class contributes its source pairs once. */
  def crossSourceDupMatrix(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      sourceCol: String = "source"
  ): DataFrame = {
    val ds = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp"),
        col(sourceCol).as("source"))
      .distinct()
    ds.select(col("__fp"), col("source").as("source_a"))
      .join(ds.select(col("__fp"), col("source").as("source_b")), "__fp")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_classes"))
  }

  /** Key-skew diagnostic: the `k` heaviest values of `keyCol` with their
    * row counts and share of the total — the first thing to look at
    * before a 100 TB join/groupBy on that key melts one reducer (feed
    * the offenders to [[graft.ops.Salting]] or a quota cap). Output:
    * `rank`, `key` (stringified), `cnt`, `share_r`.
    *
    * Shape: one count aggregation (map-side combine) + the
    * [[GroupTopK.topKPerGroupString]] heap over the counted frame — the
    * heavy-hitter exchange carries k rows per partition, never the key
    * tail; the total rides the same counted frame as a broadcast one-row
    * join. Null keys count toward the total but are not rankable (no
    * meaningful join key) — their mass shows up as share < 1. */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    // the counted frame feeds BOTH the heap and the total — cache it so
    // the corpus-wide count shuffle runs once, not once per consumer
    val counts = graft.Checkpoints.trackCache(df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .persist())
    val total = counts.agg(sum("cnt").as("__tot"))
    GroupTopK.topKPerGroupString(
        counts.withColumn("__g", lit(1)), Seq("__g"), "key", "cnt", k)
      .crossJoin(broadcast(total))
      .select(col("rank"), col("key"), col("cnt").cast("long").as("cnt"),
        (round(col("cnt") / col("__tot"), 6) + lit(0.0)).as("share_r"))
  }

  /** Join pre-flight: the EXACT inner-join output cardinality of
    * `left ⋈ right` on `keyCols`, computed at KEY GRAIN — both sides
    * reduce to (key, n) first, so the report costs two aggregates and a
    * |keys|-row join instead of the join it sizes up. The "explain
    * before you run it" tool for 100 TB joins: est_rows is exact
    * (Σ n_l·n_r over common keys), `max_key_rows` names the worst
    * single-key blowup (the salting trigger — compare against
    * [[skewReport]] to see WHICH key), and `top_frac_r` is that key's
    * share of the whole output. One row: `est_rows`, `n_keys_left`,
    * `n_keys_right`, `n_keys_common`, `max_key_rows`, `top_frac_r`
    * (null when the join is empty). Null keys are excluded, matching
    * inner-join equality semantics. */
  def joinSizeEstimate(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "joinSizeEstimate needs join keys")
    def sideCounts(df: DataFrame, n: String) = df
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(n))
    // each side's count frame feeds the product join AND its own key
    // count — cache so each input scans once
    val l = graft.Checkpoints.trackCache(sideCounts(left, "nl"))
    val r = graft.Checkpoints.trackCache(sideCounts(right, "nr"))
    val joined = l.join(r, keyCols)
      .select((col("nl") * col("nr")).as("prod"))
      .agg(coalesce(sum(col("prod")), lit(0L)).as("est_rows"),
        coalesce(max(col("prod")), lit(0L)).as("max_key_rows"),
        count(lit(1)).as("n_keys_common"))
    joined
      .crossJoin(broadcast(l.agg(count(lit(1)).as("n_keys_left"))))
      .crossJoin(broadcast(r.agg(count(lit(1)).as("n_keys_right"))))
      .select(col("est_rows"), col("n_keys_left"), col("n_keys_right"),
        col("n_keys_common"), col("max_key_rows"),
        (round(when(col("est_rows") > 0,
          col("max_key_rows").cast("double") / col("est_rows")), 6) + lit(0.0))
          .as("top_frac_r"))
  }

  /** One-row-per-column profile of `df` over `cols`: row count, null
    * count, distinct count, and the 6-decimal null rate — the
    * per-snapshot half of [[columnProfileDiff]]. By default all counts
    * are exact integers (a schema-drift gate must not fire on sketch
    * error); session conf `graft.stats.approx=true` (the engine-wide
    * [[graft.StatsAgg]] switch) swaps the distincts for
    * `approx_count_distinct` HLL sketches (~2% relative error,
    * identical LONG schema).
    *
    * Scale shape: ONE pass — a single aggregate computes every
    * column's counts. On the exact path the distincts make Spark
    * expand the input |cols|-fold before the aggregate (the documented
    * price of exactness — at 100 TB flip `graft.stats.approx` or
    * profile a column subset; the expand is |cols| × |rows| with two
    * long columns each). The approx path is a plain single-pass
    * hash aggregate — no Expand, constant sketch state per column.
    * The |cols|-row reshape is an explode over a one-row frame. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"columns not in frame: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val approx = df.sparkSession.conf.get("graft.stats.approx", "false").toBoolean
    def dist(c: String): Column =
      if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"__null_$c"),
        dist(c).as(s"__dist_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = one.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"))
    }: _*)).as("p"))
    packed.select(col("p.column").as("column"), col("p.n_rows").as("n_rows"),
      col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"),
      (round(when(col("p.n_rows") > 0,
        col("p.n_null").cast("double") / col("p.n_rows").cast("double"))
        .otherwise(lit(0.0)), 6) + lit(0.0)).as("null_rate_r"))
  }

  /** Release-to-release COLUMN-PROFILE drift: [[columnProfile]] of both
    * snapshots joined per column, with deltas — the schema-health gate
    * a dimension pipeline runs before publishing ("did the null rate of
    * `email` triple? did `country` collapse to one distinct value?").
    * Complements [[graft.ops.Snapshot]]'s ROW-level diff (q197): that
    * names which keys changed, this names which COLUMNS drifted.
    * Output per column: both sides' counts, `d_rows`, `d_distinct`,
    * and `d_null_rate_r` (cur − prev, exact integer deltas plus the
    * rounded rate delta). */
  def columnProfileDiff(prev: DataFrame, cur: DataFrame, cols: Seq[String]): DataFrame = {
    val p = columnProfile(prev, cols).select(
      col("column"), col("n_rows").as("rows_prev"), col("n_null").as("null_prev"),
      col("n_distinct").as("dist_prev"), col("null_rate_r").as("null_rate_prev_r"))
    val c = columnProfile(cur, cols).select(
      col("column"), col("n_rows").as("rows_cur"), col("n_null").as("null_cur"),
      col("n_distinct").as("dist_cur"), col("null_rate_r").as("null_rate_cur_r"))
    p.join(c, "column")
      .select(col("column"), col("rows_prev"), col("rows_cur"),
        (col("rows_cur") - col("rows_prev")).as("d_rows"),
        col("dist_prev"), col("dist_cur"),
        (col("dist_cur") - col("dist_prev")).as("d_distinct"),
        col("null_rate_prev_r"), col("null_rate_cur_r"),
        (round(col("null_rate_cur_r") - col("null_rate_prev_r"), 6) + lit(0.0))
          .as("d_null_rate_r"))
  }

  /** RIGHT-TO-BE-FORGOTTEN audit — the governance closer for the
    * takedown family: given the ids a deletion request named, scan
    * every PERSISTED artifact that should have forgotten them (index
    * tables, shard exports, packed chunks, ingest indexes — any
    * parquet path + id column the caller lists) and report exactly how
    * many rows still reference each id's data. A clean audit is the
    * evidence a compliance process files; a dirty one names the
    * artifact that missed its takedown.
    *
    * `artifacts` is `(name, parquetPath, idColumn)` per artifact; a
    * missing path refuses loudly (auditing a path that does not exist
    * is a misconfiguration, not a clean result — the artifact the
    * request covers must be LISTED and scanned).
    *
    * Output: one row per artifact — `(artifact, n_matches, clean)`.
    *
    * Scale shape: per artifact, one scan filtered by a broadcast
    * semi-join against the (request-sized) id set, aggregated to a
    * single count — the scan reads only the id column (parquet
    * column pruning), and artifacts audit independently. */
  def takedownAudit(
      spark: org.apache.spark.sql.SparkSession,
      removedIds: DataFrame,
      idCol: String,
      artifacts: Seq[(String, String, String)]
  ): DataFrame = {
    require(artifacts.nonEmpty, "takedownAudit needs at least one artifact")
    val ids = broadcast(removedIds.select(col(idCol).as("__rm")).distinct())
    val rows = artifacts.map { case (name, path, aidCol) =>
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      require(fs.exists(new org.apache.hadoop.fs.Path(path)),
        s"takedownAudit: artifact '$name' path does not exist: $path — " +
          "audit what the deletion request covers, or fix the listing")
      spark.read.parquet(path)
        .select(col(aidCol).as("__rm"))
        .join(ids, Seq("__rm"), "left_semi")
        .agg(count(lit(1)).as("n_matches"))
        .select(lit(name).as("artifact"), col("n_matches"),
          (col("n_matches") === 0L).as("clean"))
    }
    rows.reduce(_ unionByName _)
  }
}
