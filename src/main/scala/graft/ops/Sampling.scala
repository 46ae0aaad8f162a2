package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/split operators for training-data pipelines.
  *
  * Assignment is a pure function of a stable row id — the first 8 hex
  * chars of `md5(id || salt)` mapped into [0, 1) — NOT Spark's `sample()`:
  * the split is reproducible across runs, cluster sizes, and
  * repartitioning; adding rows never reassigns existing ones; changing the
  * salt re-rolls every assignment; and any engine can re-derive the exact
  * split (the SQL oracle recomputes it in DuckDB). This is the standard
  * production shape for corpus train/val/test carving at 100 TB, where
  * `sample()`'s per-partition RNG state would silently reshuffle whenever
  * the file layout changes.
  */
object Sampling {

  /** Uniform [0, 1) from a stable key: md5 prefix as a 32-bit integer
    * scaled by 2^-32. Codegen'd column arithmetic, no UDF. */
  def unitHash(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Adds a `split` column assigning each row to the first name whose
    * cumulative fraction exceeds the row's unit hash. Fractions summing
    * to less than 1 leave the remainder unassigned (null split) — useful
    * for carving a subsample out of a larger corpus. Prefer dyadic
    * fractions (0.75/0.125/...) if an external system must reproduce the
    * cuts bit-exactly: their cumulative sums are exact in binary. */
  def withSplit(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      salt: String = ""
  ): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    require(fractions.forall(_._2 >= 0.0), "fractions must be non-negative")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val u = unitHash(col(idCol), salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    val chain = fractions.zip(cuts).foldLeft(Option.empty[Column]) {
      case (None, ((name, _), cut))    => Some(when(u < lit(cut), lit(name)))
      case (Some(w), ((name, _), cut)) => Some(w.when(u < lit(cut), lit(name)))
    }.get.otherwise(lit(null).cast("string"))
    df.withColumn("split", chain)
  }

  /** GROUP-coherent split: every row of a group (domain, author, session)
    * lands in the SAME split — the assignment hashes the group key, not
    * the row id. This is the leakage-proof way to carve train/val/test
    * when near-duplicates cluster within groups (same-domain pages,
    * same-user sessions): an id-hashed split scatters a domain's
    * near-identical pages across splits and [[graft.ops.Dedup
    * .splitLeakagePairs]] lights up; a group-hashed split cannot leak
    * within groups by construction. Same determinism contract as
    * [[withSplit]]; null group keys get a null split (unassigned, loud). */
  def withGroupSplit(
      df: DataFrame,
      groupCol: String,
      fractions: Seq[(String, Double)],
      salt: String = ""
  ): DataFrame =
    // withSplit's key needs no uniqueness — hashing the shared group key
    // IS the mechanism (identical key -> identical unit hash -> same cut)
    withSplit(df, groupCol, fractions, salt)

  /** Per-stratum deterministic sampling: keep each row with its stratum's
    * fraction (rows in unlisted strata use `default`). The distributed
    * `df.sampleBy`, minus the nondeterminism. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0,
      salt: String = ""
  ): DataFrame = {
    val u = unitHash(col(idCol), salt)
    val frac = fractions.foldLeft(lit(default): Column) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(u < frac)
  }

  /** Temperature-based source mixing: sample an epoch so that source `s`
    * with `n_s` rows contributes in proportion to `n_s^alpha` (alpha < 1
    * upweights small sources — the multilingual-LM mixing rule). Each
    * row is kept iff `unitHash(id) < a_s` where
    * `a_s = min(1, target * p_s / n_s)`, `p_s = n_s^alpha / sum_t n_t^alpha`
    * — deterministic, reproducible, engine-independent (same contract as
    * [[withSplit]]).
    *
    * Scale shape: one tiny groupBy(source) agg (|sources| rows) collected
    * to the driver, folded in sorted-source order so the normalizing sum
    * is bit-reproducible by any engine, then broadcast back — the 100-TB
    * side is one map-side filter, no shuffle of the corpus. Up to
    * [[TemperatureMixCaseBound]] sources the acceptance table inlines as
    * a literal CASE chain (codegen'd, oracle-friendly); above it the
    * thresholds ship as a broadcast-joined lookup frame instead — a
    * per-source `when` branch each would explode the PLAN itself (codegen
    * blows past the JIT method limit around a few thousand branches).
    * The driver-side collect is |sources| rows: sized for source/corpus
    * mixing (dozens to a few thousand groups), NOT per-domain mixing at
    * millions of groups — cap domains with [[quotaSample]] /
    * [[weightedSample]], whose selection never leaves the cluster.
    * Acceptance thresholds are bit-reproducible when every step is
    * mirrored in order: sqrt/+/x/÷/min are IEEE-deterministic, so an
    * oracle that folds the SAME sorted list and applies the SAME
    * expression tree lands on the identical threshold (alpha = 0.5 uses
    * IEEE-exact sqrt; other alphas inherit pow's platform rounding — keep
    * alpha in {0.5, 1.0, 2.0} if an external engine must re-derive cuts).
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      targetRows: Long,
      salt: String = ""
  ): DataFrame = {
    require(alpha > 0.0, "alpha must be positive")
    require(targetRows > 0, "targetRows must be positive")
    // null source is a legitimate group: wrap in Option so the sorted
    // fold is total (None sorts first — document order is part of the
    // contract) instead of NPE-ing in Ordering[String]. The group key is
    // cast to string IN the aggregation so non-string source columns
    // (int domain ids) work instead of ClassCastException-ing at
    // getString; limit + require bound the driver collect — mixing is a
    // per-SOURCE op, and a per-domain key at web scale must fail loudly
    // here, not OOM the driver (cap domains with quotaSample first)
    val counts = df.groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("n"))
      .limit(MixMaxSources + 1)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
      .sortBy(_._1)
    require(counts.length <= MixMaxSources,
      s"temperatureMix saw > $MixMaxSources distinct sources — this is a " +
        s"per-source mixing op, not a per-domain one; cap domains with " +
        s"quotaSample/weightedSample first")
    // alpha = 0.5 goes through sqrt, not pow: sqrt is IEEE correctly
    // rounded (the scaladoc's bit-reproducibility contract), while pow is
    // only 1-ulp accurate and may disagree with an oracle's sqrt
    val powed = counts.map { case (s, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      (s, n, w)
    }
    // fold left in sorted-source order: the oracle mirrors this exact
    // summation order (list_reduce over a sorted list)
    val z = powed.foldLeft(0.0)(_ + _._3)
    val accept = powed.map { case (s, n, w) =>
      // op order is part of the contract (see scaladoc): target * (w/z) / n
      (s, math.min(1.0, targetRows.toDouble * (w / z) / n.toDouble))
    }
    val u = unitHash(col(idCol), salt)
    applyAcceptance(df, sourceCol, u, accept,
      useJoin = accept.length > TemperatureMixCaseBound)
  }

  /** Max |sources| inlined as a literal CASE chain by [[temperatureMix]]
    * before switching to the broadcast-join acceptance table. */
  private[graft] val TemperatureMixCaseBound = 64

  /** Distinct-source ceiling for the driver-collected mixing ops
    * ([[temperatureMix]], [[tokenBudgetMix]]): far above any real
    * source/corpus mix (dozens–thousands), far below the per-domain
    * cardinalities that would OOM the driver collect. */
  private[graft] val MixMaxSources = 100000

  /** Applies per-source acceptance thresholds either as a literal CASE
    * chain (small |sources| — codegen'd, oracle-friendly) or as a
    * broadcast-joined lookup frame (identical decisions, plan O(1) in
    * |sources|). Factored out so specs can pin the two paths agree. */
  private[graft] def applyAcceptance(
      df: DataFrame,
      sourceCol: String,
      u: Column,
      accept: Seq[(Option[String], Double)],
      useJoin: Boolean
  ): DataFrame =
    if (!useJoin) {
      // null-safe equality: a null source group must match its own rows
      // (plain === never matches null and would silently drop the group)
      val aCol = accept.foldLeft(lit(0.0): Column) {
        case (acc, (s, a)) =>
          // cast the COLUMN side: thresholds were computed on the
          // string-cast group key, so non-string sources must match the
          // same way (int 7 -> "7"), not via implicit coercion
          when(col(sourceCol).cast("string") <=> lit(s.orNull).cast("string"),
            lit(a)).otherwise(acc)
      }
      df.filter(u < aCol)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val acceptDf = accept.map { case (s, a) => (s.orNull, a) }
        .toDF("__graft_src", "__graft_accept")
      df.join(broadcast(acceptDf),
          col(sourceCol).cast("string") <=> col("__graft_src"))
        .filter(u < col("__graft_accept"))
        .drop("__graft_src", "__graft_accept")
    }

  /** Per-source quota cap: keep at most `cap` rows per `sourceCol` group,
    * chosen deterministically — the rows with the LOWEST unit hash (ties
    * toward the smaller id), so the per-source survivor set is a uniform
    * random-looking sample that is stable across runs, cluster sizes, and
    * corpus growth below the cap. This is the domain-cap stage of web-corpus
    * prep (no single site may dominate the training mix).
    *
    * Scale shape: selection runs through the heap top-k aggregate
    * ([[graft.ops.GroupTopK.topKPerGroup]]) — map-side partial heaps mean
    * the shuffle carries at most `cap x |sources|` rows, never the corpus;
    * the winner ids then join back to the full rows (unhinted — AQE
    * broadcasts when the measured winner set actually fits; a forced hint
    * here would OOM at millions of sources x a large cap). A window
    * `row_number` over source would instead
    * sort every source's full row set; at 100 TB a hot domain IS the
    * corpus. Requires globally-unique numeric-castable ids (the same
    * contract every unit-hash operator here carries).
    */
  def quotaSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      salt: String = ""
  ): DataFrame = {
    require(cap > 0, "cap must be positive")
    // heap keeps HIGHEST score: negate the unit hash so lowest-hash wins
    val scored = df.select(col(idCol), col(sourceCol),
      (-unitHash(col(idCol), salt)).as("__neg_u"))
    val winners = graft.ops.GroupTopK
      .topKPerGroup(scored, Seq(sourceCol), idCol, "__neg_u", cap, rankCol = "quota_rank")
      .select(col(idCol), col("quota_rank"))
    // no broadcast hint: the winner set is cap x |sources| rows, which at
    // web scale (millions of domains) can exceed executor memory — let
    // AQE pick broadcast when the measured size actually fits
    df.join(winners, Seq(idCol))
  }

  /** Weighted sampling WITHOUT replacement (k per group): the
    * Efraimidis–Spirakis A-Res scheme — each row draws key
    * `u^(1/w)` from its deterministic unit hash `u` and weight `w`, and
    * the k largest keys per group win, giving inclusion probability
    * proportional to weight. Implemented with the ORDER-EQUIVALENT key
    * `ln(u)/w` (ln is monotone, so maximizing `u^(1/w)` ≡ maximizing
    * `ln(u)/w` for w > 0) because `ln` agrees bit-for-bit across engines
    * on this data where `pow` does not have that track record. Rows with
    * null or non-positive weight cannot be weighted and are excluded.
    * Ties (same key) break toward the smaller id — the [[GroupTopK]]
    * contract; `u = 0` keys `-Infinity` and never wins over any u > 0.
    *
    * Scale shape: map-side key computation + the heap aggregate — the
    * shuffle carries k·|groups| rows, then one join-back of the winner
    * set (unhinted: AQE broadcasts it when its measured size fits).
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      groupCols: Seq[String],
      weightCol: String,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty, "weightedSample needs group columns")
    val w = col(weightCol).cast("double")
    // Spark's log(0) is NULL, not -Infinity — without the coalesce a u = 0
    // row would be silently dropped by the heap aggregate (which keeps
    // -Inf, drops null/NaN) even when its group has fewer than k eligible
    // rows; A-Res (and the DuckDB oracle's ln(0) = -inf) ranks it last but
    // includes it. Null ids stay excluded: their unit hash is null, and
    // promoting them to -Inf would let an unjoinable row occupy a winner
    // slot.
    val key = when(col(idCol).isNotNull,
      coalesce(log(unitHash(col(idCol), salt)), lit(Double.NegativeInfinity))) / w
    val scored = df
      .filter(w.isNotNull && !isnan(w) && w > 0)
      .select((groupCols.map(col) :+ col(idCol) :+ key.as("__ares")): _*)
    val winners = graft.ops.GroupTopK
      .topKPerGroup(scored, groupCols, idCol, "__ares", k, rankCol = "sample_rank")
      .select(col(idCol), col("sample_rank"))
    // no broadcast hint — k x |groups| winner rows; see quotaSample
    df.join(winners, Seq(idCol))
  }

  /** Quality-weighted deterministic sampling: keep each row with
    * probability proportional to its heuristic text quality — acceptance
    * `clamp(qualityScore/100, floor, ceil)` against the md5 unit hash.
    * The FineWeb-style soft quality gate: instead of a hard threshold
    * discarding everything below a cut, low-quality documents survive at
    * a reduced (but nonzero, when `floor` > 0) rate, preserving
    * distributional diversity. Same determinism contract as [[withSplit]]
    * (reproducible across runs/partitioning; null text never passes).
    *
    * Scale shape: one codegen'd map-side filter — the quality score and
    * the hash are pure column arithmetic, no shuffle, no UDF. */
  def qualityWeightedSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      floor: Double = 0.0,
      ceil: Double = 1.0,
      salt: String = ""
  ): DataFrame = {
    require(floor >= 0.0 && ceil <= 1.0 && floor <= ceil,
      "need 0 <= floor <= ceil <= 1")
    val p = least(greatest(
      TextAnalysis.qualityScore(col(textCol)) / lit(100.0), lit(floor)), lit(ceil))
    // explicit null-text drop: greatest/least SKIP nulls in Spark (and
    // DuckDB), so a null score would otherwise clamp UP to `floor` and
    // sample null documents at the floor rate
    df.filter(col(textCol).isNotNull && unitHash(col(idCol), salt) < p)
  }

  /** Exactly-n deterministic uniform sample of the whole frame: the n
    * rows with the smallest [[unitHash]] of their id — "ORDER BY hash
    * LIMIT n" semantics WITHOUT a global sort. The [[GroupTopK]] heap
    * keeps at most n candidates per partition map-side, so the single
    * final merge sees ≤ n·partitions rows and holds one n-row heap —
    * fine for the n a human asks for (eval sets, spot-check samples; for
    * corpus-scale carves use the fractional [[withSplit]]). Adds
    * `sample_rank` (1-based hash order). Deterministic across runs,
    * partitionings, and engines; null ids are excluded; returns all rows
    * (ranked) when the frame has fewer than n. */
  def uniformSampleExact(
      df: DataFrame,
      idCol: String,
      n: Int,
      salt: String = ""
  ): DataFrame = {
    require(n > 0, "n must be positive")
    val scored = df
      .filter(col(idCol).isNotNull)
      .select(lit(1).as("__g"), col(idCol),
        (-unitHash(col(idCol), salt)).as("__neg_u"))
    val winners = GroupTopK
      .topKPerGroup(scored, Seq("__g"), idCol, "__neg_u", n,
        rankCol = "sample_rank")
      .select(col(idCol), col("sample_rank"))
    df.join(winners, Seq(idCol))
  }

  /** Cluster-balanced (diversity) sampling: assign every row to its
    * nearest centroid (one codegen'd literal-centroid argmax —
    * [[Similarity.assignCell]], zero shuffle) and keep a deterministic
    * uniform sample of at most `perCluster` rows per cell — the
    * embedding-space analogue of per-source quotas: a cap per semantic
    * region, so over-represented content (boilerplate clusters, template
    * farms) can't dominate the corpus. Selection ranks the [[unitHash]]
    * of the id ascending (ties toward the smaller id), so the sample is
    * reproducible across runs, partitionings, and engines; centroids come
    * from [[Similarity.trainIvfCentroids]] or any external quantizer.
    *
    * Adds `list_id` (assigned cell) and `sample_rank` (1-based within
    * the cell). Null ids are excluded (their hash is null — unrankable).
    *
    * Scale shape: map-side assignment + the [[GroupTopK]] heap aggregate
    * (shuffle carries perCluster·nLists winner ids), then one join-back
    * (AQE broadcasts the winner set when it fits). */
  def clusterBalancedSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double], Double)],
      perCluster: Int,
      salt: String = ""
  ): DataFrame = {
    require(perCluster > 0, "perCluster must be positive")
    val assigned = df
      .transform(d => graft.ops.Similarity.assignCells(d, vecCol, centroids, "list_id"))
    // GroupTopK keeps the LARGEST scores; rank the unit hash ascending
    // by negating it. Hash of a null id is null -> dropped by the heap.
    val scored = assigned
      .select(col("list_id"), col(idCol),
        (-unitHash(col(idCol), salt)).as("__neg_u"))
    val winners = GroupTopK
      .topKPerGroup(scored, Seq("list_id"), idCol, "__neg_u", perCluster,
        rankCol = "sample_rank")
      .select(col(idCol), col("sample_rank"))
    assigned.join(winners, Seq(idCol))
  }

  /** Token-budget quota sampling: admit each source's documents in
    * deterministic [[unitHash]] order until the source's token budget is
    * spent — the budget-denominated sibling of [[quotaSample]]'s row cap
    * (a data-mixing recipe is usually written in TOKENS per source, not
    * documents). A row is admitted iff the total weight of rows admitted
    * BEFORE it is still under `budget`, so every source overshoots by at
    * most one document and admission is prefix-closed in hash order.
    * Deterministic across runs/partitionings/engines (same md5 contract
    * as [[withSplit]]); rows with null id or null/negative weight are
    * excluded (a negative weight would break prefix-closure).
    *
    * Adds `tokens_before` (exclusive running weight) and `budget_rank`
    * (1-based admission order).
    *
    * Scale shape: one hash-partition by source + per-source ORDERED
    * prefix sum (a window, not a heap — budget admission needs the
    * running total, which no fixed-k aggregate can produce). The sort is
    * per-source and spillable, but a single hot source IS the corpus at
    * web scale: cap such sources first with [[quotaSample]] (heap-only)
    * or pre-filter, as the published mixing pipelines do. */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weightCol: String,
      budget: Long,
      salt: String = ""
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    budgetAdmit(
      df.filter(col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) >= 0),
      idCol, sourceCol, weightCol, lit(budget), salt)
  }

  /** Shared admission core: hash-order prefix per source while the
    * EXCLUSIVE running weight stays under `budget` (a per-row column, so
    * per-source budgets work). Caller pre-filters null/negative rows. */
  private def budgetAdmit(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weightCol: String,
      budget: Column,
      salt: String
  ): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val win = W.partitionBy(col(sourceCol))
      .orderBy(unitHash(col(idCol), salt).asc, col(idCol).asc)
    val prior = coalesce(
      sum(col(weightCol).cast("long"))
        .over(win.rowsBetween(W.unboundedPreceding, -1)),
      lit(0L))
    df.withColumn("tokens_before", prior)
      .withColumn("budget_rank", row_number().over(win))
      .filter(col("tokens_before") < budget)
  }

  /** Temperature mixing in TOKENS: source `s` with token total `T_s`
    * receives budget `target · T_s^α / Σ_t T_t^α` (α < 1 upweights small
    * sources — [[temperatureMix]]'s rule, denominated in tokens because
    * that is what a training-mix recipe actually budgets), and documents
    * admit in deterministic hash order under that budget
    * (prefix-closed, one-document overshoot per source, like
    * [[tokenBudgetSample]]).
    *
    * Determinism contract: per-source totals are exact integer sums; the
    * normalizer folds `T^α` in sorted-source order with IEEE-exact sqrt
    * (keep α ∈ {0.5, 1.0} when an external engine must re-derive
    * budgets — [[temperatureMix]]'s caveat); budgets are |sources| rows
    * collected to the driver and broadcast-joined back, so the corpus
    * side is one window per source. Adds `token_budget`, `tokens_before`,
    * `budget_rank`. */
  def tokenBudgetMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weightCol: String,
      alpha: Double,
      targetTokens: Long,
      salt: String = ""
  ): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    require(alpha > 0.0 && alpha <= 2.0, "alpha must be in (0, 2]")
    val clean = df.filter(col(idCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol) >= 0)
    // group key cast to string IN the aggregation (non-string source
    // columns work instead of ClassCastException-ing at getString), null
    // sources Option-wrapped (None sorts first — temperatureMix's
    // convention), and the driver collect is limit+require-bounded: a
    // per-domain key at web scale must fail loudly, not OOM the driver
    val totals = clean
      .groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(sum(col(weightCol).cast("long")).as("__t"))
      .limit(MixMaxSources + 1)
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
      .sortBy(_._1)
    require(totals.nonEmpty, "no admissible rows")
    require(totals.length <= MixMaxSources,
      s"tokenBudgetMix saw > $MixMaxSources distinct sources — this is a " +
        s"per-source mixing op, not a per-domain one; cap domains with " +
        s"quotaSample/weightedSample first")
    def wpow(t: Long): Double =
      if (alpha == 0.5) math.sqrt(t.toDouble)
      else if (alpha == 1.0) t.toDouble
      else math.pow(t.toDouble, alpha)
    // sorted-source left fold — the bit-reproducible normalizer
    val z = totals.foldLeft(0.0) { case (acc, (_, t)) => acc + wpow(t) }
    // all-zero totals would make every budget NaN and silently admit
    // nothing; that input is a caller bug — fail loudly
    require(z > 0.0, "every source has zero admissible tokens")
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = totals.map { case (s, t) =>
      (s.orNull, targetTokens.toDouble * (wpow(t) / z))
    }.toSeq.toDF("__graft_src", "token_budget")
    // null-safe join on the string-cast key: a null-source group keeps
    // its budget instead of silently vanishing through an equi-join
    budgetAdmit(
      clean.join(broadcast(budgets),
        col(sourceCol).cast("string") <=> col("__graft_src"))
        .drop("__graft_src"),
      idCol, sourceCol, weightCol, col("token_budget"), salt)
  }

  /** Per-source EPOCH REPEATS — the other half of a mixing recipe, where
    * upweighted sources appear MORE than once per epoch (repeat factor
    * 2.3 = two full copies + a 0.3-probability third): each row explodes
    * into `ceil(r_s)` candidate copies and copy `i` survives iff
    * `i < floor(r_s)` or (`i == floor(r_s)` and
    * `unitHash(id + "#i") < frac(r_s)`) — deterministic, reproducible,
    * engine-independent, with every copy tagged by `epoch_copy` so
    * downstream shuffling ([[withShuffleOrder]] keyed by id AND copy)
    * spreads the copies through the epoch. Sources absent from `repeats`
    * default to factor 1 (one copy). Factors must be positive; a factor
    * < 1 admits a single fractional copy (equivalent to
    * [[temperatureMix]]-style downsampling).
    *
    * Scale shape: one explode bounded by ceil(max r) copies — a pure
    * map-side projection, no shuffle, stream-legal. */
  def withEpochRepeats(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      repeats: Map[String, Double],
      salt: String = ""
  ): DataFrame = {
    require(repeats.values.forall(r => r > 0.0 && r <= 64.0),
      "repeat factors must be in (0, 64]")
    val maxCopies = repeats.values.map(r => math.ceil(r).toInt).foldLeft(1)(math.max)
    // per-row factor: literal CASE chain over the (bounded) recipe map
    val factor = repeats.foldLeft(lit(1.0): Column) {
      case (acc, (s, r)) =>
        when(col(sourceCol).cast("string") <=> lit(s), lit(r)).otherwise(acc)
    }
    val copy = col("epoch_copy")
    val keepCopy = copy < floor(factor) ||
      (copy === floor(factor) &&
        unitHash(concat(col(idCol).cast("string"), lit("#"), copy.cast("string")), salt)
          < (factor - floor(factor)))
    df.withColumn("epoch_copy",
        explode(sequence(lit(0L), lit(maxCopies.toLong - 1L))))
      .filter(keepCopy)
  }

  /** Deterministic global shuffle order for training-data serving: adds
    * `shard` (= md5 prefix of the id mod `numShards`) and `shuffle_pos`
    * (1-based rank within the shard, ordered by the full md5 hex then id).
    * Reading shards in order, rows within each shard by `shuffle_pos`,
    * yields a reproducible pseudo-random permutation of the corpus — the
    * standard way to "shuffle" 100 TB without a global sort: the order is
    * a pure function of ids, so any engine (or a resumed training job)
    * re-derives the exact same epoch order.
    *
    * Scale shape: one hash-partition on `shard` + per-shard sort — with
    * `numShards` sized to the cluster (thousands at 100 TB) each sort is a
    * partition-local spillable sort, never a single global ordering. */
  def withShuffleOrder(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      salt: String = ""
  ): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val hex = md5(concat(col(idCol).cast("string"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__hex").asc, col(idCol).asc)
    df.withColumn("__hex", hex)
      .withColumn("shard",
        pmod(conv(substring(col("__hex"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
      .withColumn("shuffle_pos", row_number().over(w).cast("long"))
      .drop("__hex")
  }

  /** CURRICULUM epoch order: stage the corpus into `nStages` score
    * quantile bands (stage 1 = lowest `scoreCol` — put "easy"/"clean"
    * first by scoring accordingly, or negate the score for the reverse),
    * then shuffle deterministically WITHIN each (stage, shard) cell the
    * [[withShuffleOrder]] way. Reading stages ascending, shards
    * ascending, `curriculum_pos` ascending within, yields the epoch
    * order curriculum-training expects — pseudo-random inside a band,
    * strictly banded across, and a pure function of ids + scores (a
    * resumed job re-derives the exact order).
    *
    * Stage boundaries are the EXACT score percentiles rounded to 6
    * decimals (the q93 cross-engine contract — quantile_cont matches at
    * round-6); `stage = 1 + |{cuts < score}|`, so boundary ties land in
    * the lower band in every engine. Rows with null/NaN score get null
    * stage/shard/pos — unassigned, loud, never silently first or last.
    *
    * Scale shape: ONE exact-percentile aggregation (driver holds
    * `nStages−1` doubles), then a map-side stage/shard projection and a
    * per-(stage, shard) partition-local sort — `nStages × numShards`
    * cells sized to the cluster keep every sort spillable-local; no
    * global ordering anywhere. */
  def curriculumOrder(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      nStages: Int,
      numShards: Int,
      salt: String = ""
  ): DataFrame = {
    require(nStages >= 2, "nStages must be >= 2")
    require(numShards > 0, "numShards must be positive")
    val score = col(scoreCol).cast("double")
    val probs = (1 until nStages).map(i => i.toDouble / nStages)
    // Exact percentiles WITHOUT `percentile()`'s single buffer of every
    // value: aggregate to (distinct score, count) — distributed — then
    // cumulative-count the distinct frame (the one narrow window runs
    // over |distinct scores| rows, the Ranks trade) and look up the two
    // order statistics each cut interpolates between. The interpolation
    // is Spark's own percentile formula (pos = (n−1)·p, lower +
    // frac·(upper−lower)) == DuckDB quantile_cont, so the round-6
    // cross-engine boundary contract is unchanged.
    // cached: n and the order-statistic lookup both read the distinct
    // frame, which costs one corpus scan to build — don't pay it twice.
    // Released before returning: the output plan only carries the cut
    // LITERALS, never this frame.
    val counts = df
      .filter(score.isNotNull && !isnan(score))
      .groupBy(score.as("__s")).agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
    val cum = counts
      .withColumn("__hi", sum(col("__c")).over(wCum))
      .withColumn("__lo", col("__hi") - col("__c"))
    val n: Long = try {
      val r = counts.agg(sum(col("__c"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    } catch { case e: Throwable => counts.unpersist(); throw e }
    val cuts: Seq[Double] =
      if (n == 0) { counts.unpersist(); Seq.empty }
      else {
        val wanted: Seq[Long] = probs.flatMap { p =>
          val pos = (n - 1) * p
          val lower = math.floor(pos).toLong
          Seq(lower, math.min(lower + 1, n - 1))
        }.distinct
        // one bounded lookup: the ≤ 2(nStages−1) rows whose [lo, hi)
        // count range covers a wanted order-statistic index
        val cond = wanted.map(i => col("__lo") <= i && col("__hi") > i).reduce(_ || _)
        val stats: Map[Long, Double] = cum.filter(cond)
          .select(col("__s"), col("__lo"), col("__hi"))
          .collect()
          .flatMap { r =>
            val (s, lo, hi) = (r.getDouble(0), r.getLong(1), r.getLong(2))
            wanted.filter(i => i >= lo && i < hi).map(_ -> s)
          }.toMap
        probs.map { p =>
          val pos = (n - 1) * p
          val lower = math.floor(pos).toLong
          val lv = stats(lower)
          val uv = stats(math.min(lower + 1, n - 1))
          val c = lv + (pos - lower) * (uv - lv)
          BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    if (n > 0) counts.unpersist(blocking = false)
    val assigned = score.isNotNull && !isnan(score)
    val stage =
      if (cuts.isEmpty) when(assigned, lit(1)).otherwise(lit(null).cast("int"))
      else when(assigned,
        cuts.map(c => when(score > lit(c), 1).otherwise(0)).reduce(_ + _) + lit(1))
        .otherwise(lit(null).cast("int"))
    val hex = md5(concat(col(idCol).cast("string"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stage", "shard").orderBy(col("__hex").asc, col(idCol).asc)
    df.withColumn("__hex", hex)
      .withColumn("stage", stage)
      .withColumn("shard",
        when(col("stage").isNotNull,
          pmod(conv(substring(col("__hex"), 1, 8), 16, 10).cast("long"),
            lit(numShards.toLong)).cast("int")))
      .withColumn("curriculum_pos",
        when(col("stage").isNotNull, row_number().over(w).cast("long")))
      .drop("__hex")
  }

  /** Weighted sampling WITHOUT replacement, exactly `k` rows per group —
    * the Efraimidis–Spirakis A-ES scheme (2006) on the engine's
    * deterministic unit hash: each row draws `u = unitHash(id, salt)`
    * and ranks by the key `ln(u) ⁄ w` (monotone-equivalent to the
    * classic `u^(1/w)`; the log form avoids `pow`, which is NOT
    * correctly rounded cross-engine — `ln` and the exact division
    * are, the q84 precedent). Taking the k LARGEST keys per group
    * draws a weights-proportional sample without replacement: the
    * probability row i outranks row j is wᵢ/(wᵢ+wⱼ), independently
    * per pair — the property replacement-free quota samplers lose.
    * Deterministic end to end: same ids + weights + salt ⇒ the same
    * sample on any partitioning, engine, or run (the [[withSplit]]
    * contract extended to weighted draws).
    *
    * Weights must be positive — null/zero/negative refuses loudly
    * THROUGH the consumed weight term (the [[htEstimate]] probability
    * guard); ids ride the numeric-id contract via [[GroupTopK]] (its
    * loud cast guard points to [[Ids.withSurrogateId]]).
    *
    * Scale shape: one map-side key computation + the size-k heap with
    * map-side partial aggregation — no window, no full sort, one
    * shuffle at group grain. Output: (groupCols, rank, idCol,
    * es_key_r) — rank 1 is the strongest draw. */
  def weightedSampleNoReplacement(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      groupCols: Seq[String],
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(groupCols.nonEmpty,
      "weightedSampleNoReplacement needs group keys (pass a literal for global)")
    val w = col(weightCol).cast("double")
    val checkedW = when(w.isNull || w <= 0.0 || isnan(w),
      raise_error(concat(
        lit("weightedSampleNoReplacement: weight "),
        coalesce(w.cast("string"), lit("null")),
        lit(" is not positive for id "), col(idCol).cast("string"),
        lit(" — A-ES keys are only defined for positive weights"))))
      .otherwise(w)
    val key = log(unitHash(col(idCol), salt)) / checkedW
    val keyed = df.filter(col(idCol).isNotNull)
      .withColumn("__es_key", key)
    GroupTopK.topKPerGroup(keyed, groupCols, idCol, "__es_key", k)
      .select(groupCols.map(col) :+ col("rank") :+ col(idCol) :+
        (round(col("__es_key"), 6) + lit(0.0)).as("es_key_r"): _*)
  }

  /** Neyman (optimal stratified) sample allocation: given a labeling /
    * review budget of `totalBudget` rows, how many should each stratum
    * get? Proportional allocation wastes budget on large HOMOGENEOUS
    * strata; Neyman allocates `n_h ∝ N_h·σ_h` (stratum size × stratum
    * spread), which minimizes the variance of the stratified estimate —
    * the standard answer for "we can afford to hand-label 10k docs
    * across 20 sources". Output per stratum: `n_rows`, `mean_r`,
    * `sigma_r` (population σ from EXACT integer moments, the q85
    * widening contract), `share_r = N_h·σ_h ⁄ Σ N·σ`, and `alloc_r =
    * budget · share` (fractional by design — apportionment to integers
    * is the caller's policy; a constant stratum earns share 0).
    *
    * Determinism: moments are exact; Σ N·σ folds in STRATUM-SORTED
    * order (the q84 HOF fold — strata are few; a plain sum of doubles
    * would be shuffle-order-dependent). Scale shape: one stats
    * aggregate to stratum grain (map-side combined) + a broadcast of
    * the |strata|-row frame. */
  def neymanAllocation(
      df: DataFrame,
      strataCols: Seq[String],
      valueCol: String,
      totalBudget: Long
  ): DataFrame = {
    require(strataCols.nonEmpty, "neymanAllocation needs strata keys")
    require(totalBudget >= 1, "totalBudget must be >= 1")
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    val raw = col(valueCol)
    val v = when(!isnan(raw.cast("double")), raw)
    val vw = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => v.cast(DecimalType(38, 0))
      case _ => v.cast("double")
    }
    val stats = df
      .groupBy(strataCols.map(col): _*)
      .agg(count(v).as("n_rows"),
        sum(vw).as("__s1"), sum(vw * vw).as("__s2"))
    val mean = col("__s1").cast("double") / col("n_rows").cast("double")
    val variance = col("__s2").cast("double") / col("n_rows").cast("double") - mean * mean
    val sigma = when(variance > 0, sqrt(variance)).otherwise(lit(0.0))
    val weighted = stats
      .withColumn("__w", col("n_rows").cast("double") * sigma)
      .withColumn("__key", concat_ws("", strataCols.map(col(_).cast("string")): _*))
    // stratum-sorted deterministic fold of Σ N·σ (strata are few)
    val total = weighted.agg(
      aggregate(array_sort(collect_list(struct(col("__key"), col("__w").as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("__tw"))
    weighted.crossJoin(broadcast(total))
      .select(strataCols.map(col) ++ Seq(
        col("n_rows"),
        (round(mean, 6) + lit(0.0)).as("mean_r"),
        (round(sigma, 6) + lit(0.0)).as("sigma_r"),
        (round(when(col("__tw") > 0, col("__w") / col("__tw")).otherwise(lit(0.0)), 6)
          + lit(0.0)).as("share_r"),
        (round(when(col("__tw") > 0,
          lit(totalBudget.toDouble) * (col("__w") / col("__tw"))).otherwise(lit(0.0)), 6)
          + lit(0.0)).as("alloc_r")): _*)
  }

  /** Horvitz–Thompson estimation: unbiased FULL-CORPUS totals from a
    * weighted sample — the "measure the 100 TB corpus from the 1% you
    * can afford to scan" tool, and the inverse of this module's
    * samplers (every deterministic-acceptance sampler here IS Poisson
    * sampling with a known per-row inclusion probability).
    * Per `groupCols` group:
    *
    *  - `n_sample` — rows actually in hand;
    *  - `est_rows_r` = Σ 1/pᵢ — estimated population row count;
    *  - `est_sum_r` = Σ vᵢ/pᵢ — estimated population total of `valueCol`;
    *  - `se_sum_r` = √(Σ (1−pᵢ)/pᵢ² · vᵢ²) — the exact HT standard
    *    error under independent (Poisson) inclusion.
    *
    * A probability outside (0, 1] raises loudly THROUGH the consumed
    * term (garbage weights silently produce garbage estimates
    * otherwise), and so does a non-long-castable id — the fold keys by
    * `cast(id as long)`, and a string/UUID id would otherwise cast to
    * null and surface only as a generic null-key error deep in the
    * fold; route string keys through [[graft.ops.Ids.withSurrogateId]]
    * first (the [[GroupTopK]] convention). Every double accumulates
    * through the two-level id-sorted fold (md5 sub-bucket, then bucket
    * order — the [[graft.ops.Reports.corpusDatasheet]] shape), so
    * estimates are bit-reproducible across partitionings and engines.
    * Null values contribute 0 to the value terms but still count toward
    * `est_rows_r`. */
  def htEstimate(
      sample: DataFrame,
      idCol: String,
      probCol: String,
      valueCol: String,
      groupCols: Seq[String],
      foldBuckets: Int = 64
  ): DataFrame = {
    require(groupCols.nonEmpty, "htEstimate needs group keys (pass a literal for global)")
    require(foldBuckets >= 1, "foldBuckets must be >= 1")
    val oks = graft.expressions.OrderedKeyedSum.orderedKeyedSum _
    val p = col(probCol).cast("double")
    val checkedP = when(p.isNull || p <= 0.0 || p > 1.0,
      raise_error(concat(lit("htEstimate: inclusion probability "),
        p.cast("string"), lit(" outside (0, 1] for id "),
        col(idCol).cast("string"),
        lit(" — the estimator is only defined for known positive probabilities"))))
      .otherwise(p)
    val v = coalesce(col(valueCol).cast("double"), lit(0.0))
    val bucket = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(foldBuckets.toLong))
    // the fold key must be a real long: a string/UUID id casts to null
    // and would only surface as the fold's generic null-key error —
    // refuse here, through the consumed key, with the on-ramp pointer
    val checkedId = when(col(idCol).cast("long").isNull, raise_error(concat(
      lit("htEstimate: id "), col(idCol).cast("string"),
      lit(" is not long-castable — the deterministic fold keys by a "),
      lit("numeric id; route string keys through Ids.withSurrogateId first")))
      .cast("long"))
      .otherwise(col(idCol).cast("long"))
    val terms = sample
      .filter(col(idCol).isNotNull)
      .select(groupCols.map(col)
        :+ checkedId.as("__id") :+ bucket.as("__b")
        :+ (lit(1.0) / checkedP).as("__tn")
        :+ (v / checkedP).as("__ts")
        :+ ((lit(1.0) - checkedP) / (checkedP * checkedP) * v * v).as("__tv"): _*)
    def fold(c: String) =
      oks(collect_list(struct(col("__id").as("k"), col(c).as("v"))))
    val lvl1 = terms.groupBy(groupCols.map(col) :+ col("__b"): _*)
      .agg(fold("__tn").as("__pn"), fold("__ts").as("__ps"), fold("__tv").as("__pv"),
        count(lit(1)).as("__n"))
    def fold2(c: String) =
      oks(collect_list(struct(col("__b").as("k"), col(c).as("v"))))
    lvl1.groupBy(groupCols.map(col): _*)
      .agg(sum("__n").as("n_sample"),
        fold2("__pn").as("__en"), fold2("__ps").as("__es"), fold2("__pv").as("__ev"))
      .select(groupCols.map(col) :+ col("n_sample")
        :+ (round(col("__en"), 6) + lit(0.0)).as("est_rows_r")
        :+ (round(col("__es"), 6) + lit(0.0)).as("est_sum_r")
        :+ (round(sqrt(col("__ev")), 6) + lit(0.0)).as("se_sum_r"): _*)
  }
}
