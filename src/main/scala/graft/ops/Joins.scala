package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference (and stock Spark) lack, shaped
  * for scale from the start.
  *
  * The backward as-of join is THE staple of event/feature alignment
  * ("for each observation, the latest reading at or before it"). The
  * naive formulation — a range join `l.key = r.key AND r.t <= l.t` plus
  * an argmax — explodes to |matches| intermediate rows per left row and
  * dies on dense keys. This implementation uses the union + running-
  * last-value pattern instead: tag both sides, sort within key by
  * (time, side, tiebreak), and carry the most recent right payload
  * forward with an unbounded-preceding `last_value(ignoreNulls)` window.
  * Cost: ONE shuffle of |L|+|R| rows on the key, no pairwise blowup —
  * the plan survives 100 TB with skew handled by the usual salting of
  * hot keys upstream.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `rightTimeCol` <= `leftTimeCol` within the same
    * `keyCol` (ties on time broken toward the larger `rightTieCol`, which
    * also makes the result deterministic when right times repeat).
    * Unmatched left rows keep null right columns (left-outer semantics).
    *
    * @param payloadCols right columns to carry (emitted as `asof_<name>`)
    * @param tolerance   optional max allowed `leftTime - rightTime`; a
    *                    match older than this is dropped (nulls emitted)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    val carry = (rightTimeCol +: payloadCols).distinct
    // right rows: key, time, payload struct; __side=0 sorts BEFORE left
    // rows at equal times, making the join inclusive (at-or-before).
    // Null-KEY right rows can never match under SQL equality semantics
    // (the oracle's `l.key = r.key` never holds for null), and null-TIME
    // right rows can never satisfy `r.t <= l.t` — yet they would sort
    // first (asc nulls-first) and be picked up by last(ignoreNulls).
    // Drop both.
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull)
      .select(
      col(keyCol).as("__key"),
      col(rightTimeCol).cast("long").as("__t"),
      col(rightTieCol).cast("long").as("__tie"),
      struct(carry.map(col): _*).as("__payload"),
      lit(0).as("__side"))
    // left rows carry their full row as a struct so arbitrary schemas
    // survive the union without column-name gymnastics
    val l = left.select(
      col(keyCol).as("__key"),
      col(leftTimeCol).cast("long").as("__t"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__lrow"))

    val unioned = r.withColumn("__lrow",
        lit(null).cast(l.schema("__lrow").dataType))
      .unionByName(l)

    val w = Window.partitionBy("__key").orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = tolerance match {
      case Some(tol) =>
        when(col("__t") - col("__match").getField(rightTimeCol).cast("long") <= lit(tol),
          col("__match"))
      case None => col("__match")
    }
    val leftCols = left.columns.map(n => col("__lrow").getField(n).as(n))
    val rightCols = carry.map(n => withinTol.getField(n).as(s"asof_$n"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Forward as-of join: for every left row, the right row with the
    * SMALLEST `rightTimeCol` at-or-after `leftTimeCol` within the key —
    * [[asofJoinBackward]] on negated times. `tolerance` bounds
    * `rightTime - leftTime`; ties on time still break toward the larger
    * `rightTieCol`. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame =
    asofJoinBackward(
      left.withColumn("__fwd_t", -col(leftTimeCol).cast("long")),
      right.withColumn("__fwd_t", -col(rightTimeCol).cast("long")),
      keyCol, "__fwd_t", "__fwd_t", rightTieCol,
      payloadCols = (rightTimeCol +: payloadCols).distinct,
      tolerance = tolerance)
      .drop("__fwd_t", "asof___fwd_t")

  /** Range (interval) join: every left row paired with every interval row
    * whose `[loCol, hiCol)` contains `valueCol`. Intervals may overlap.
    *
    * The naive plan — a join on `lo <= v AND v < hi` — is a broadcast
    * nested loop (or worse, a cartesian) that dies when neither side is
    * tiny. Here both sides are quantized to a `bucketWidth` grid: each
    * interval explodes into the buckets it covers, the left side hashes to
    * its single bucket, and an ordinary shuffled equi-join on the bucket id
    * does the pairing, with the exact containment filter applied after.
    * Intermediate size is |left| + Σ ceil(span/bucketWidth), so pick
    * `bucketWidth` near the typical interval span: one grid cell per
    * interval and one equi-join probe per left row.
    *
    * Column names of `left` and `intervals` must be disjoint (standard
    * Spark join hygiene; alias beforehand if needed). */
  def rangeJoin(
      left: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Long = 1L << 20
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val loB = floor(col(loCol).cast("double") / w).cast("long")
    val hiB = floor(col(hiCol).cast("double") / w).cast("long")
    // fail FAST and legibly on a stray outlier interval (an open-ended
    // sentinel like hi=1e18 would otherwise ask sequence() for a
    // trillion-element array and abort the job with an opaque error)
    val guardMsg = concat(
      lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval buckets "),
      lit("(lo="), col(loCol).cast("string"), lit(", hi="), col(hiCol).cast("string"),
      lit(s", bucketWidth=$bucketWidth); raise bucketWidth or maxBucketsPerInterval"))
    val hiGuarded = when(hiB - loB > lit(maxBucketsPerInterval),
      raise_error(guardMsg).cast("long")).otherwise(hiB)
    val iv = intervals.withColumn("__bucket", explode(sequence(loB, hiGuarded)))
    val l = left.withColumn("__bucket",
      floor(col(valueCol).cast("double") / w).cast("long"))
    l.join(iv, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** All variants of `text` reachable by deleting up to `maxDist`
    * characters (the text itself included), distinct. The symmetric-
    * deletion candidate key set: two strings within Levenshtein distance
    * d ALWAYS share such a variant — walk the optimal alignment and
    * delete from each side the positions an edit touches (a substitution
    * deletes one char from both sides, an insertion/deletion deletes one
    * char from one side), at most d deletions per side. Variant count is
    * C(n,0)+..+C(n,maxDist): n+1 keys at d=1, ~n²/2 at d=2 — which is
    * why the public joins pin maxDist <= 2 and a text-length ceiling. */
  private[graft] def deletionVariants(text: Column, maxDist: Int): Column = {
    val n = length(text)
    val emptyArr = array().cast("array<string>")
    val d0 = array(text)
    val d1 =
      if (maxDist < 1) emptyArr
      else when(n >= 1, transform(sequence(lit(1), n), i =>
        concat(text.substr(lit(1), i - 1), text.substr(i + 1, n - i))))
        .otherwise(emptyArr)
    val d2 =
      if (maxDist < 2) emptyArr
      else when(n >= 2, flatten(transform(sequence(lit(1), n - 1), i =>
        transform(sequence(i + 1, n), j =>
          concat(
            text.substr(lit(1), i - 1),
            text.substr(i + 1, j - i - 1),
            text.substr(j + 1, n - j))))))
        .otherwise(emptyArr)
    array_distinct(concat(d0, d1, d2))
  }

  /** Blocked fuzzy (edit-distance) join — the record-linkage staple: all
    * cross-side pairs inside the caller's exact blocking keys whose texts
    * are within Levenshtein distance `maxDist` (0, 1, or 2 — the linkage
    * range). Completeness is BY CONTRACT within blocks (pairs split
    * across block keys are never candidates — pick keys the true matches
    * share: language, nation, zip prefix, length-stable attributes).
    *
    * Candidate generation is the symmetric-deletion index
    * ([[deletionVariants]], the SymSpell/FastSS family): each DISTINCT
    * (block, text) emits its ≤-maxDist deletion variants, and candidates
    * come from an ordinary shuffled equi-join on (block, variant) — so
    * candidate count scales with the number of genuinely similar texts,
    * not |block|². (Pigeonhole segment banding was rejected here: on
    * shared-prefix corpora — `Customer#000…` ids, URL sets — every
    * string in a block shares its first segment and banding degenerates
    * to the full cross product; deletion keys stay selective because
    * they retain the characters that differ.) Verification — length
    * prune + banded `levenshtein(a, b, maxDist)`, O(len·maxDist) with
    * early bail — runs ONCE per distinct text pair; ids expand back by
    * two equi-joins on the (block, text) key, so a thousand copies of
    * one name cost one verify, never 10^6 of them.
    *
    * Guards, both riding columns the join consumes (a free-standing
    * guard column would be column-pruned, raise_error included — the
    * [[Similarity.blockedNearestNeighbor]] convention): a block with
    * more than `maxBlockTexts` DISTINCT texts on either side raises
    * loudly with the offending key (a degenerate blocking key's exact-
    * dup explosion is bounded by the id expansion, but its candidate
    * index is still worth refusing), and a text longer than `maxTextLen`
    * raises rather than materialize megabyte variant arrays — this
    * method is built for SHORT strings (names, titles, codes); for long
    * documents use [[Dedup]]'s MinHash family. `maxTextLen` defaults by
    * `maxDist` (1024 at d<=1, 128 at d=2 — d=2 builds ~len²/2 variants
    * per text), so every supported `maxDist` is valid with defaults;
    * the require is the backstop for explicit over-rides.
    *
    * Output: blockCols, `id_a`, `id_b`, `text_a`, `text_b`, `dist`. */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      blockCols: Seq[String],
      idCol: String,
      textCol: String,
      maxDist: Int,
      maxBlockTexts: Long = 65536L,
      maxTextLen: Int = -1
  ): DataFrame = {
    // -1 = auto: scale the variant-array ceiling with maxDist so the
    // DEFAULT call is valid for every supported distance (a fixed 1024
    // default made maxDist=2 throw out of the box)
    val lenCeil = if (maxTextLen >= 0) maxTextLen else if (maxDist <= 1) 1024 else 128
    require(blockCols.nonEmpty, "editDistanceJoin needs at least one blocking key")
    require(maxDist >= 0 && maxDist <= 2,
      "maxDist must be 0, 1, or 2 (the deletion-index contract)")
    require(maxDist <= 1 || lenCeil <= 128,
      "maxDist=2 builds ~len²/2 variants per text; set maxTextLen <= 128")
    require(maxBlockTexts >= 1, "maxBlockTexts must be >= 1")
    val bcols = blockCols.map(col)
    def nonNull(df: DataFrame): DataFrame =
      df.filter(blockCols.map(col(_).isNotNull).reduce(_ && _) && col(textCol).isNotNull)

    // DISTINCT (block, text) grain per side, guards wrapped around the
    // text column — it feeds the variant index, the verify, and the id
    // join-back, so Catalyst cannot prune the raise_error away
    def texts(df: DataFrame, suffix: String): DataFrame = {
      val tc = s"text_$suffix"
      val distinctTexts = nonNull(df).select(bcols :+ col(textCol).as(tc): _*).distinct()
      // per-block text count via a window over the distinct exchange —
      // the old groupBy + join-back re-evaluated the distinct subtree
      // once per consumer and paid two more exchanges per side
      distinctTexts
        .withColumn("__tn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(bcols: _*)))
        .withColumn(tc,
          when(col("__tn") > maxBlockTexts, raise_error(concat(
            lit("editDistanceJoin: block "),
            concat_ws(",", blockCols.map(c => col(c).cast("string")): _*),
            lit(s" has more than $maxBlockTexts distinct texts on side '$suffix'; "),
            lit("refine the blocking keys or raise maxBlockTexts"))).cast("string"))
          .when(length(col(tc)) > lenCeil, raise_error(concat(
            lit(s"editDistanceJoin: text of length "), length(col(tc)).cast("string"),
            lit(s" exceeds maxTextLen=$lenCeil on side '$suffix'; the deletion "),
            lit("index is for short linkage strings — normalize upstream or raise maxTextLen")))
            .cast("string"))
          .otherwise(col(tc)))
        .drop("__tn")
    }

    val ka = texts(left, "a").withColumn("__v",
      explode(deletionVariants(col("text_a"), maxDist)))
    val kb = texts(right, "b").withColumn("__v",
      explode(deletionVariants(col("text_b"), maxDist)))
    val verified = ka.join(kb, blockCols :+ "__v")
      .select(bcols ++ Seq(col("text_a"), col("text_b")): _*)
      .distinct()
      .filter(abs(length(col("text_a")) - length(col("text_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("text_a"), col("text_b"), maxDist))
      .filter(col("dist") >= 0)

    def ids(df: DataFrame, suffix: String): DataFrame =
      nonNull(df).select(bcols ++ Seq(
        col(idCol).as(s"id_$suffix"), col(textCol).as(s"text_$suffix")): _*)
    verified
      .join(ids(left, "a"), blockCols :+ "text_a")
      .join(ids(right, "b"), blockCols :+ "text_b")
      .select(bcols ++ Seq(
        col("id_a"), col("id_b"), col("text_a"), col("text_b"), col("dist")): _*)
  }

  /** Self variant of [[editDistanceJoin]]: each unordered pair once
    * (`id_a < id_b`), ids must be numeric-comparable. Distinct-text
    * candidate pairs verify in both orders (the price of exact id-pair
    * dedup through the equal-text case); the id filter keeps each
    * unordered row pair exactly once. */
  def editDistanceSelfJoin(
      df: DataFrame,
      blockCols: Seq[String],
      idCol: String,
      textCol: String,
      maxDist: Int,
      maxBlockTexts: Long = 65536L,
      maxTextLen: Int = -1
  ): DataFrame =
    editDistanceJoin(df, df, blockCols, idCol, textCol, maxDist, maxBlockTexts, maxTextLen)
      .filter(col("id_a") < col("id_b"))

  /** Interval coverage (gaps-and-islands union) per key: merge possibly-
    * overlapping `[startCol, endCol]` microsecond intervals and report,
    * per key, `n_intervals`, `n_islands` (merged runs), `covered_us`
    * (union length), `span_us` (last end − first start), `coverage_r`,
    * and `max_gap_us` (largest uncovered hole; null with one island) —
    * the SLA/uptime/availability summary over monitoring spans, service
    * windows, or validity intervals.
    *
    * Classic single-window formulation over the DISTINCT (start, end)
    * grain — duplicates cannot affect a union, and deduping first (a)
    * shrinks the window input and (b) makes the per-key sort a TOTAL
    * order, so the new-island flag and the island running sum agree on
    * row identity no matter how many passes an engine (or the DuckDB
    * oracle's two CTEs) splits them into — with duplicates, a tied
    * pair carrying flags (1, 0) can swap between passes and silently
    * bridge a real gap (caught at sf0.1: 6 suppliers merged one island
    * each). An interval OPENS A NEW ISLAND iff its start exceeds the
    * running max of all earlier DISTINCT ends (a ROWS frame ending at
    * 1 PRECEDING — the current row never closes its own gap); island
    * ids are the running sum of those flags. `n_intervals` still
    * counts the RAW grain. One window pass per key partition + one
    * island-grain aggregate + one key-grain aggregate, all exact
    * integer arithmetic. An interval with `end < start` refuses loudly
    * THROUGH the consumed end column (a garbage interval would
    * silently shrink coverage); null endpoints drop. */
  def intervalCoverage(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "intervalCoverage needs key columns")
    val checkedEnd = when(col(endCol) < col(startCol), raise_error(concat(
      lit("intervalCoverage: interval end "), col(endCol).cast("string"),
      lit(" precedes start "), col(startCol).cast("string"),
      lit(" — fix the interval derivation upstream"))).cast("long"))
      .otherwise(col(endCol).cast("long"))
    val raw = df
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(startCol).isNotNull && col(endCol).isNotNull)
      .select(keyCols.map(col) :+ col(startCol).cast("long").as("__s")
        :+ checkedEnd.as("__e"): _*)
    val rawCounts = raw.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"))
    val iv = raw.distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__s").asc, col("__e").asc)
    val wPrev = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val flagged = iv
      .withColumn("__me", max(col("__e")).over(wPrev))
      .withColumn("__new",
        when(col("__me").isNull || col("__s") > col("__me"), 1L).otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val islands = flagged
      .groupBy(keyCols.map(col) :+ col("__isl"): _*)
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"))
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("__isl").asc)
    islands
      .withColumn("__gap", col("__is") - lag(col("__ie"), 1).over(wi))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered_us"),
        (max(col("__ie")) - min(col("__is"))).as("span_us"),
        (round(when(max(col("__ie")) > min(col("__is")),
          sum(col("__ie") - col("__is")).cast("double") /
            (max(col("__ie")) - min(col("__is"))).cast("double"))
          .otherwise(lit(null)), 6) + lit(0.0)).as("coverage_r"),
        max(col("__gap")).as("max_gap_us"))
      .join(rawCounts, keyCols)
      .select(keyCols.map(col) :+ col("n_intervals") :+ col("n_islands")
        :+ col("covered_us") :+ col("span_us") :+ col("coverage_r")
        :+ col("max_gap_us"): _*)
  }

  /** Entity canonicalization — the last mile of the resolution
    * pipeline (match pairs via [[editDistanceSelfJoin]] /
    * [[recordLinkage]] → close them into entities via
    * [[Graphs.connectedComponents]] → THIS picks each entity's
    * canonical record): every record of `records` is assigned its
    * `component` (the entity label — min member id) and the entity's
    * `keeper_id`, the member with the HIGHEST `scoreCol` (data
    * quality, recency, completeness — the caller's notion of "best"),
    * ties toward the smaller id (the [[GroupTopK]] contract, so the
    * choice is deterministic and engine-replayable). Records matched
    * by no pair are their own singleton entity and their own keeper —
    * the output is a TOTAL assignment over `records`.
    *
    * Scale shape: label propagation on the pair graph (pairs only —
    * singletons never enter the loop), one |matched|-grain score join,
    * a per-entity size-1 heap, and a union with the singleton
    * pass-through. Null scores are unrankable: a component whose every
    * member score is null keeps its MIN-id member (the label itself)
    * as keeper rather than dropping the entity. */
  def entityKeepers(
      records: DataFrame,
      pairs: DataFrame,
      idCol: String,
      scoreCol: String,
      pairA: String = "id_a",
      pairB: String = "id_b",
      maxIter: Int = 64
  ): DataFrame =
    entityKeepersFromComponents(records,
      graft.Checkpoints.trackCache(
        Graphs.connectedComponents(pairs, pairA, pairB, maxIter).persist()),
      idCol, scoreCol)

  /** [[entityKeepers]] with the component mapping supplied — the
    * MAINTENANCE entry point: feed it [[Graphs.ccApply]]'s output (a
    * standing mapping merged with a new pair batch) and the keepers
    * recompute without re-contracting the graph, completing the
    * incremental entity-resolution loop ([[Graphs.ccStream]] maintains
    * the mapping; this names the survivors). `components` must be a
    * `(node, component)` frame (a [[Graphs.connectedComponents]] /
    * [[Graphs.ccApply]] output, persisted or fresh). */
  def entityKeepersFromComponents(
      records: DataFrame,
      comps: DataFrame,
      idCol: String,
      scoreCol: String
  ): DataFrame = {
    val checkedId =
      when(col(idCol).cast("long").isNull, raise_error(concat(
        lit(s"entityKeepers: id '$idCol' value "), col(idCol).cast("string"),
        lit(" is not long-castable — route string ids through "),
        lit("Ids.withSurrogateId first"))).cast("long"))
        .otherwise(col(idCol).cast("long"))
    val ids = records.select(checkedId.as("node"),
      col(scoreCol).cast("double").as("__s"))
    val members = comps.join(ids, "node")
    val best = GroupTopK.topKPerGroup(members, Seq("component"), "node", "__s", 1)
      .select(col("component"), col("node").as("keeper_id"))
    val matched = comps
      .join(best, Seq("component"), "left")
      // all-null-score component: fall back to the canonical min-id label
      .select(col("node"), col("component"),
        coalesce(col("keeper_id"), col("component")).as("keeper_id"))
    val singletons = ids
      .join(comps.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"), col("node").as("keeper_id"))
    matched.unionByName(singletons)
  }

  /** One scored comparison field of [[recordLinkage]]. `weight` is the
    * field's share of the match score; `kind` picks the similarity:
    * [[LinkFieldKind.Exact]] (1 iff non-null equal),
    * [[LinkFieldKind.Edit]] (1 − levenshtein ⁄ max length; two empty
    * strings count as equal), or [[LinkFieldKind.Numeric]] (1 − |a−b| ⁄
    * scale, floored at 0). A null on either side contributes 0 — absence
    * of evidence, never a crash. `leftCol` also names the emitted
    * `sim_<leftCol>` column, so use distinct left columns per field. */
  final case class LinkField(
      leftCol: String,
      rightCol: String,
      weight: Double,
      kind: LinkFieldKind)

  sealed trait LinkFieldKind
  object LinkFieldKind {
    case object Exact extends LinkFieldKind
    case object Edit extends LinkFieldKind
    final case class Numeric(scale: Double) extends LinkFieldKind
  }

  /** Record linkage (entity resolution): match rows of `left` to rows of
    * `right` by a weighted multi-field similarity score — the
    * Fellegi–Sunter shape with deterministic field agreements.
    *
    * Candidate generation NEVER materializes the in-block cross
    * product: candidates come from [[editDistanceJoin]]'s deletion
    * index on the `anchor` field (the short, discriminative string a
    * linkage keys on — name, title, code), so the pair count scales
    * with true near-matches. All `fields` are then scored on that
    * candidate sliver only, joined back by id at id grain. An entity
    * pair whose anchors differ by more than `anchorMaxDist` edits is
    * unreachable BY DESIGN — pick the anchor accordingly (standard
    * blocking practice, stated rather than hidden).
    *
    * Score = Σ weightᵢ·simᵢ ⁄ Σ weightᵢ, rounded to 6 decimals
    * (`match_score_r`); pairs below `minScore` drop. Output: blockCols,
    * `id_a`, `id_b`, `anchor_dist`, one `sim_<leftCol>` per field, and
    * `match_score_r`. Ids must be unique per side (they key the
    * field join-back). */
  def recordLinkage(
      left: DataFrame,
      right: DataFrame,
      blockCols: Seq[String],
      leftId: String,
      rightId: String,
      anchorLeft: String,
      anchorRight: String,
      anchorMaxDist: Int,
      fields: Seq[LinkField],
      minScore: Double,
      maxBlockTexts: Long = 65536L
  ): DataFrame = {
    require(fields.nonEmpty, "recordLinkage needs at least one scored field")
    require(fields.map(_.leftCol).distinct.size == fields.size,
      "field leftCols must be distinct (they name the sim_* outputs)")
    val wsum = fields.map(_.weight).sum
    require(wsum > 0, "field weights must sum to a positive value")
    fields.foreach {
      case LinkField(_, _, w, _) if w < 0 =>
        throw new IllegalArgumentException("field weights must be >= 0")
      case LinkField(_, _, _, LinkFieldKind.Numeric(s)) if !(s > 0) =>
        throw new IllegalArgumentException("Numeric field scale must be > 0")
      case _ => ()
    }
    val bcols = blockCols.map(col)
    def side(df: DataFrame, idc: String, anchor: String): DataFrame =
      df.select(bcols :+ col(idc).as("__id") :+ col(anchor).as("__anchor"): _*)
    val cands = editDistanceJoin(
        side(left, leftId, anchorLeft), side(right, rightId, anchorRight),
        blockCols, "__id", "__anchor", anchorMaxDist, maxBlockTexts)
      .select(bcols ++ Seq(col("id_a"), col("id_b"),
        col("dist").as("anchor_dist")): _*)

    val lf = left.select(col(leftId).as("id_a") +:
      fields.zipWithIndex.map { case (f, i) => col(f.leftCol).as(s"__l_$i") }: _*)
    val rf = right.select(col(rightId).as("id_b") +:
      fields.zipWithIndex.map { case (f, i) => col(f.rightCol).as(s"__r_$i") }: _*)

    def sim(f: LinkField, i: Int): Column = {
      val l = col(s"__l_$i")
      val r = col(s"__r_$i")
      val bothSet = l.isNotNull && r.isNotNull
      f.kind match {
        case LinkFieldKind.Exact =>
          when(bothSet && l === r, lit(1.0)).otherwise(lit(0.0))
        case LinkFieldKind.Edit =>
          val maxLen = greatest(length(l), length(r)).cast("double")
          when(bothSet && maxLen === 0.0, lit(1.0))
            .when(bothSet,
              lit(1.0) - levenshtein(l, r).cast("double") / maxLen)
            .otherwise(lit(0.0))
        case LinkFieldKind.Numeric(scale) =>
          when(bothSet,
            greatest(lit(0.0), lit(1.0) - abs(l.cast("double") - r.cast("double")) / lit(scale)))
            .otherwise(lit(0.0))
      }
    }
    val sims = fields.zipWithIndex.map { case (f, i) => sim(f, i).as(s"sim_${f.leftCol}") }
    val score = fields.zipWithIndex.map { case (f, i) =>
      lit(f.weight) * col(s"sim_${f.leftCol}")
    }.reduceLeft(_ + _) / lit(wsum)
    cands
      .join(lf, "id_a")
      .join(rf, "id_b")
      .select((bcols ++ Seq(col("id_a"), col("id_b"), col("anchor_dist"))) ++ sims: _*)
      .withColumn("match_score_r", round(score, 6) + lit(0.0))
      .filter(col("match_score_r") >= minScore)
  }
}
