package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model._

/** One evaluation stage: a name, its own single-stage [[Evaluator]], an
  * optional inter-stage filter, and a weight for weighted-combination mode
  * (`/root/reference/bid_evaluation/staged.py:40-47`). */
final case class StageDefinition(
    name: String,
    evaluator: Evaluator,
    filter: Option[StageFilter] = None,
    weight: Double = 1.0
)

/** Per-stage outcome (`/root/reference/bid_evaluation/staged.py:50-57`).
  * The reference stores `pd.Index` objects; the Spark analogue keeps lazy
  * id frames (single `__bid_id` column) so nothing materializes until asked.
  */
final case class StageResult(
    name: String,
    resultDf: DataFrame,
    advancedIds: DataFrame,
    eliminatedIds: DataFrame
)

/** Staged evaluation result (SURVEY.md §7.3 immutability deviation): the
  * final frame, per-stage results, and per-stage statistics keyed
  * `stageName -> criterionName -> Stats`. Call [[unpersist]] when done to
  * release the frames cached during evaluation. */
final case class StagedResult(
    df: DataFrame,
    stageResults: List[StageResult],
    statistics: Map[String, Map[String, Stats]],
    private[graft] val caches: Seq[DataFrame] = Nil,
    private[graft] val checkpoints: Seq[DataFrame] = Nil
) {
  def unpersist(): Unit = {
    caches.foreach(_.unpersist())
    checkpoints.foreach(graft.Checkpoints.free)
  }
}

/** Multi-stage pipeline with inter-stage elimination — the Spark-native
  * counterpart of the reference `StagedEvaluator`
  * (`/root/reference/bid_evaluation/staged.py`).
  *
  * Where the reference slices rows by pandas index and writes scores back
  * index-aligned (`staged.py:317,322-333`), this engine assigns each row a
  * stable `__bid_id` (`monotonically_increasing_id`) once at entry and
  * realizes every merge-back as an equi-join on that id. Stage k's cohort —
  * and therefore all of stage k's statistics — is the set of rows not yet
  * eliminated, exactly like the reference's active mask (`staged.py:292`).
  *
  * Scale design: the base frame is cached (each stage's stats aggregation
  * re-reads it); per-stage score frames are narrow (id + score columns) and
  * cached because they are consumed multiple times (result join, elimination
  * marking, next-cohort anti-join). The driver crosses the cluster boundary
  * once per stage for the stats aggregate (plus two scalar jobs for a top-N
  * 'exclude' filter) — an inherently sequential pipeline, since stage k's
  * statistics depend on stage k-1's filter. Everything else stays lazy.
  */
object StagedEvaluator {
  /** Factory front ends (P13, `staged.py:86-159`). */
  def fromConfig(config: Map[String, Any]): StagedEvaluator =
    graft.config.ConfigLoader.stagedFromConfig(config)
  def fromYaml(path: String): StagedEvaluator =
    graft.config.ConfigLoader.stagedFromYaml(path)
  def fromJson(path: String): StagedEvaluator =
    graft.config.ConfigLoader.stagedFromJson(path)
}

class StagedEvaluator(val finalScoreMode: FinalScoreMode = FinalScoreMode.LastStage) {

  def this(mode: String) = this(FinalScoreMode.fromString(mode))

  private val stages = ArrayBuffer.empty[StageDefinition]
  private var lastResult: Option[StagedResult] = None

  /** Stable row-identity column, the analogue of the pandas index. */
  val BidId = "__bid_id"

  def stageDefinitions: Seq[StageDefinition] = stages.toSeq

  // === Fluent interface (staged.py:163-267) ===

  def addStage(
      name: String,
      filterType: String = null,
      threshold: java.lang.Double = null,
      topN: java.lang.Integer = null,
      onTie: String = "include",
      weight: Double = 1.0
  ): this.type = {
    val filter = Option(filterType).map { ft =>
      StageFilter(ft,
        Option(threshold).map(_.doubleValue()),
        Option(topN).map(_.intValue()), onTie)
    }
    stages += StageDefinition(name, new Evaluator(), filter, weight)
    this
  }

  def addStage(name: String, filter: Option[StageFilter], weight: Double): this.type = {
    stages += StageDefinition(name, new Evaluator(), filter, weight)
    this
  }

  private def currentEvaluator: Evaluator = {
    if (stages.isEmpty)
      throw new IllegalStateException("No stages defined. Call add_stage() first.")
    stages.last.evaluator
  }

  def linear(column: String, weight: Double, name: String = null,
             higherIsBetter: Boolean = true): this.type = {
    currentEvaluator.linear(column, weight, name, higherIsBetter); this
  }

  def threshold(column: String, weight: Double,
                thresholds: Seq[(Double, Double, Double)],
                name: String = null): this.type = {
    currentEvaluator.threshold(column, weight, thresholds, name); this
  }

  def direct(column: String, weight: Double, name: String = null,
             inputScale: Double = 100.0): this.type = {
    currentEvaluator.direct(column, weight, name, inputScale); this
  }

  def minRatio(column: String, weight: Double, name: String = null): this.type = {
    currentEvaluator.minRatio(column, weight, name); this
  }

  def formula(column: String, weight: Double, formula: String = "value",
              variables: Map[String, Double] = Map.empty,
              name: String = null): this.type = {
    currentEvaluator.formula(column, weight, formula, variables, name); this
  }

  def custom(column: String, weight: Double,
             fn: (Column, Stats) => Column): this.type = {
    currentEvaluator.custom(column, weight, fn); this
  }

  def custom(column: String, weight: Double, builtin: String): this.type = {
    currentEvaluator.custom(column, weight, builtin); this
  }

  /** Stage-name -> column-prefix sanitizer (`staged.py:455-457`). */
  def safeName(name: String): String =
    name.toLowerCase.replace(" ", "_").replace("-", "_")

  // === Evaluation (staged.py:271-375) ===

  def evaluate(bids: DataFrame, includeDetails: Boolean = true): DataFrame =
    evaluateResult(bids, includeDetails).df

  def evaluateResult(
      bids: DataFrame,
      includeDetails: Boolean = true
  ): StagedResult = {
    if (stages.isEmpty)
      throw new IllegalStateException("No stages defined. Add stages before evaluating.")

    // P12: empty-input short-circuit (staged.py:459-465).
    if (bids.isEmpty) {
      val empty = bids
        .withColumn("eliminated_at_stage", lit(null).cast("string"))
        .withColumn("final_score", lit(null).cast("double"))
        .withColumn("ranking", lit(null).cast("long"))
      return StagedResult(empty, Nil, Map.empty)
    }

    // Eager checkpoint, not persist: BidId is monotonically_increasing_id,
    // which is NONDETERMINISTIC across recomputes — a persist made a
    // divergent re-assignment merely unlikely (evicted blocks recompute),
    // truncated lineage makes it impossible. Blocks release via
    // StagedResult.unpersist() or the host's Checkpoints.freeAll barrier.
    // lazy: stage 1's statistics aggregation is a full pass over base,
    // so the id assignment freezes inside that first job
    val base = graft.Checkpoints.localCheckpoint(
      bids.withColumn(BidId, monotonically_increasing_id()), eager = false)
    val caches = ArrayBuffer[DataFrame]()

    // Accumulating wide result: original columns + one narrow join per stage.
    var result = base.withColumn("eliminated_at_stage", lit(null).cast("string"))
    // Cohort for the next stage: original columns + BidId only.
    var active = base

    val stageResults = ArrayBuffer.empty[StageResult]
    var lastActiveCount = 0L
    val statsOut = ArrayBuffer.empty[(String, Map[String, Stats])]
    val logger = org.slf4j.LoggerFactory.getLogger(getClass)

    val n = stages.size
    for ((stage, i) <- stages.zipWithIndex) {
      val isLast = i == n - 1
      val safe = safeName(stage.name)

      // One aggregation job per stage: all criterion statistics + the
      // cohort count (used for the emptiness check and top-N cutoffs).
      val (stageStats, activeCount) =
        StatsAgg.computeWithCount(active, stage.evaluator.criteria.map(_._1))
      lastActiveCount = activeCount

      if (activeCount == 0L) {
        // P6: all eliminated — warn, record empty stage, skip (staged.py:301-314).
        logger.warn(
          s"All bids were eliminated before stage '${stage.name}'. " +
            "Skipping this and subsequent stages.")
        val empty = active.limit(0).select(col(BidId))
        stageResults += StageResult(stage.name, active.limit(0), empty, empty)
      } else {
        // Evaluate the surviving cohort with this stage's single-stage engine.
        val er = stage.evaluator.buildResult(active, stageStats, includeDetails,
          Some(activeCount), sortOutput = false)
        statsOut += stage.name -> er.statistics

        // Narrow frame of stage outputs, renamed with the stage prefix
        // (staged.py:322-333): score_X -> {safe}_X, final_score ->
        // {safe}_score, ranking -> {safe}_ranking.
        val renamePairs: Seq[(String, Column)] = er.df.columns.collect {
          case c if c.startsWith("score_") =>
            s"${safe}_${c.stripPrefix("score_")}" -> col(c)
          case c @ "final_score" => s"${safe}_score" -> col(c)
          case c @ "ranking"     => s"${safe}_ranking" -> col(c)
        }.toSeq
        // Prefixed names can collide (e.g. criterion named 'score' makes
        // score_score -> {safe}_score, same as final_score). pandas assigns
        // sequentially so the LAST writer wins while the column keeps its
        // first position — reproduce both.
        val lastByName = renamePairs.groupBy(_._1).view.mapValues(_.last._2).toMap
        val renames: Seq[Column] = renamePairs.map(_._1).distinct
          .map(n => lastByName(n).as(n))
        // persist (not checkpoint): deterministic given the checkpointed
        // base, so a post-release re-execution recomputes correctly; the
        // registry releases it at the host's freeAll barrier for callers
        // that never call StagedResult.unpersist()
        val stageCols = graft.Checkpoints.trackCache(er.df
          .select(col(BidId) +: renames: _*)
          .persist(StorageLevel.MEMORY_AND_DISK))
        caches += stageCols

        // two stages can sanitize to the same prefix; pandas overwrites the
        // columns, so drop the earlier ones before this stage's join
        val overwritten = stageCols.columns
          .filter(c => c != BidId && result.columns.contains(c))
        result = result.drop(overwritten: _*).join(stageCols, Seq(BidId), "left")

        val scoreCol = col(s"${safe}_score")
        val rankCol = col(s"${safe}_ranking")

        // P3-P5: inter-stage filter (never on the last stage, staged.py:336).
        // `elimPred` must evaluate on rows of `stageCols`/`result` alike;
        // a null outcome means "neither advanced nor eliminated" (pandas
        // NaN-score rows fall through the threshold masks and stay active,
        // staged.py:383-385,339-340).
        val filterOpt = if (isLast) None else stage.filter
        val (advPred, elimPred): (Column, Column) = filterOpt match {
          case Some(StageFilter.ScoreThreshold(t)) =>
            (scoreCol >= lit(t), scoreCol < lit(t))

          case Some(StageFilter.TopN(topN, TieMode.Include)) =>
            // P4: the stage's own competition ranking IS the filter ranking
            // (both are rank(desc, method='min') over the cohort,
            // staged.py:389-393). Unranked rows — null OR NaN score, both
            // null-ranked by Ranks — are eliminated: pandas puts them in
            // index.difference(advanced).
            (rankCol <= lit(topN), coalesce(!(rankCol <= lit(topN)), lit(true)))

          case Some(StageFilter.TopN(topN, TieMode.Exclude)) =>
            // P5: cutoff = n-th highest score; if more than n rows sit
            // at-or-above the cutoff the tie spans it -> advance only
            // strictly-above (staged.py:394-409). pandas sorts NaN last
            // (Spark would sort it FIRST), so the cutoff window holds only
            // real scores; fewer than topN real scores means the n-th
            // sorted score is NaN and `scores >= NaN` advances nobody.
            if (activeCount <= topN) (lit(true), lit(false))
            else {
              val window = stageCols
                .filter(scoreCol.isNotNull && !isnan(scoreCol))
                .select(scoreCol.as("s"))
                .orderBy(col("s").desc)
                .limit(topN)
                .agg(min(col("s")).as("cut"), count(lit(1)).as("n"))
                .head()
              if (window.isNullAt(0) || window.getLong(1) < topN) {
                // NaN/null cutoff: eliminate the whole cohort
                (lit(false), lit(true))
              } else {
                val cutoff = window.getDouble(0)
                // guard both the count and the predicate with !isnan:
                // Spark evaluates NaN >= x as TRUE, numpy as False
                val atOrAbove = stageCols
                  .filter(!isnan(scoreCol) && scoreCol >= lit(cutoff)).count()
                val pred = (if (atOrAbove > topN) scoreCol > lit(cutoff)
                            else scoreCol >= lit(cutoff)) && !isnan(scoreCol)
                (pred, coalesce(!pred, lit(true)))
              }
            }

          case _ => (lit(true), lit(false))
        }

        val advanced = stageCols.filter(advPred).select(col(BidId))
        val eliminated = stageCols.filter(elimPred).select(col(BidId))

        if (filterOpt.isDefined) {
          // Mark eliminations on the wide result (it already carries this
          // stage's columns, so the same predicate applies; rows eliminated
          // in earlier stages are shielded by the isNull guard).
          result = result.withColumn(
            "eliminated_at_stage",
            when(col("eliminated_at_stage").isNull && coalesce(elimPred, lit(false)),
              lit(stage.name)
            ).otherwise(col("eliminated_at_stage")))
          // Next cohort = active minus eliminated (NOT "advanced only":
          // pandas keeps neither-bucket rows active, staged.py:339-340).
          active = active.join(eliminated, Seq(BidId), "left_anti")
        }

        stageResults += StageResult(stage.name, er.df, advanced, eliminated)
      }
    }

    // P7/P8: final score (staged.py:415-453).
    val lastSafe = safeName(stages.last.name)
    val resultCols = result.columns.toSet
    val finalScore: Column = finalScoreMode match {
      case FinalScoreMode.LastStage =>
        if (resultCols.contains(s"${lastSafe}_score")) col(s"${lastSafe}_score")
        else lit(null).cast("double")
      case FinalScoreMode.WeightedCombination =>
        val totalWeight = stages.map(_.weight).sum
        val present = stages.toSeq
          .filter(s => resultCols.contains(s"${safeName(s.name)}_score"))
        if (totalWeight == 0 || present.isEmpty) lit(Double.NaN)
        else
          present.foldLeft(lit(0.0): Column) { (acc, s) =>
            val c = col(s"${safeName(s.name)}_score")
            // pandas fillna(0) covers both missing (null) and NaN.
            acc + coalesce(nanvl(c, lit(0.0)), lit(0.0)) * lit(s.weight / totalWeight)
          }
    }
    result = result.withColumn("final_score", finalScore)

    // P9: rank survivors only (staged.py:357-365); eliminated keep null.
    val survivors = result
      .filter(col("eliminated_at_stage").isNull)
      .select(col(BidId), col("final_score"))
    val rangeThreshold = bids.sparkSession.conf
      .get("graft.rank.rangeThreshold", "2000000").toLong
    val survivorRanks = Ranks
      .withCompetitionRank(survivors, "final_score", "ranking",
        scalable = lastActiveCount > rangeThreshold)
      .select(col(BidId), col("ranking"))
    result = result.join(survivorRanks, Seq(BidId), "left")

    // P10: final sort (staged.py:367-372). nanvl maps NaN final scores to
    // null so they sort LAST like pandas na_position='last' (raw Spark desc
    // would put NaN above every real score).
    val sorted = result
      .orderBy(col("ranking").asc_nulls_last,
        nanvl(col("final_score"), lit(null).cast("double")).desc_nulls_last)
      .drop(BidId)

    val res = StagedResult(sorted, stageResults.toList, statsOut.toMap,
      caches.toSeq, checkpoints = Seq(base))
    lastResult = Some(res)
    res
  }

  /** P15: per-stage statistics, post-evaluate only
    * (`staged.py:498-505`, must-raise contract tested at
    * `tests/test_staged.py:491-497`). Prefer reading
    * [[StagedResult.statistics]] off the result object. */
  def getStatistics: Map[String, Map[String, Stats]] =
    lastResult.getOrElse(throw new IllegalStateException(
      "Call evaluate() before get_statistics().")).statistics

  /** P15: stage results, post-evaluate only (`staged.py:507-511`). */
  def getStageResults: List[StageResult] =
    lastResult.getOrElse(throw new IllegalStateException(
      "Call evaluate() before get_stage_results().")).stageResults

  // === Informational (staged.py:469-496) ===

  def summary(spark: SparkSession): DataFrame = {
    val rows = stages.toSeq.flatMap { stage =>
      val filterDesc = stage.filter match {
        case Some(StageFilter.ScoreThreshold(t)) => s"score >= $t"
        case Some(StageFilter.TopN(tn, tie))     => s"top $tn (on_tie=${tie.key})"
        case None                                => "None"
      }
      stage.evaluator.criteria.map { case (column, c) =>
        (stage.name, stage.weight, filterDesc, column, c.name, c.typeName, c.weight)
      }
    }
    spark.createDataFrame(rows).toDF(
      "stage", "stage_weight", "filter", "column",
      "criterion_name", "criterion_type", "criterion_weight")
  }
}
