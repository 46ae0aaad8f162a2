package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.{BpeExpressions, WordGrams}

/** Distributed byte-pair-encoding tokenizer training and application
  * (Sennrich et al. 2016) — the subword-vocabulary step of an LLM data
  * pipeline, built Spark-first:
  *
  *  - Training never touches the corpus after ONE tokenizing pass: it
  *    runs on the distinct-WORD histogram (weights = corpus frequencies),
  *    which is what every published BPE trainer does — at 100 TB the
  *    histogram is ~10⁸ rows where the corpus is ~10¹¹ documents, and the
  *    histogram shuffle is a map-side-combined word count.
  *  - Each merge round is ONE aggregation job over the histogram
  *    (adjacent-pair counts via `zip_with` of two slices — codegen'd,
  *    no HOF re-evaluation) plus a `TakeOrderedAndProject` argmax; the
  *    winning pair comes to the driver as a single row.
  *  - The symbol-rewrite step is a native greedy-pass expression
  *    ([[graft.expressions.BpeMergeStep]]); the histogram is
  *    lineage-truncated through the managed [[graft.Checkpoints]]
  *    registry every [[CheckpointEvery]] rounds (the superseded round is
  *    freed immediately — ≤ 2 rounds' blocks ever live, the dupClusters
  *    contract).
  *  - Encoding applies the learned merge list in rank order with one
  *    native expression pass per word over the DISTINCT words again
  *    (corpus token streams then come from a word → tokens join that AQE
  *    broadcasts when the vocabulary fits — the standard word-cache
  *    encode shape).
  *
  * Determinism contract (what makes the whole recipe DuckDB-replayable):
  * greedy left-to-right merge semantics, code-point symbolization, and
  * the argmax tie-break (count DESC, then left ASC, then right ASC in
  * binary string order) are all engine-portable — the oracle re-trains
  * from scratch and must land on the identical merge table.
  */
object BpeTrain {

  /** Re-checkpoint the rewritten histogram every this many merge rounds:
    * between checkpoints a round's plan is a short chain of greedy-pass
    * projections over the last checkpoint (cheap to recompute), and each
    * checkpoint frees its predecessor so block storage stays bounded. */
  private val CheckpointEvery = 8

  /** One learned merge: `left + right → left||right` at `rank` (1-based),
    * with the pair's corpus frequency at the time it won. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Case-preserving word histogram of a corpus: (word, cnt), counted
    * WITH multiplicity by the shared native tokenizer. The only pass
    * over the full corpus in the whole training recipe. */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(WordGrams.wordGramsMulti(col(textCol), 1)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of `symsCol` weighted by `cntCol`:
    * (left_sym, right_sym, pair_count). Single-symbol rows contribute
    * nothing (the zipped slices are empty and `explode` drops the row). */
  def pairCounts(df: DataFrame, symsCol: String, cntCol: String): DataFrame = {
    val n = size(col(symsCol))
    val pairs = zip_with(
      slice(col(symsCol), lit(1), n - 1),
      slice(col(symsCol), lit(2), n - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
    df.select(col(cntCol), explode(pairs).as("p"))
      .groupBy(col("p.a").as("left_sym"), col("p.b").as("right_sym"))
      .agg(sum(col(cntCol)).as("pair_count"))
  }

  /** First-round pair counts straight off a corpus (the merge-candidate
    * table): code-point symbols + end marker, weighted by word frequency. */
  def initialPairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCounts(
      wordHistogram(df, textCol)
        .withColumn("syms", BpeExpressions.bpeSymbols(col("word"))),
      "syms", "cnt")

  /** Train `numMerges` BPE merges on the corpus. Returns the merge list
    * in rank order (possibly shorter if the histogram runs out of pairs).
    *
    * BATCHED rounds, exact greedy semantics: one merge per Spark job
    * ladder is the wrong asymptote at a production vocabulary (32k
    * merges = 32k sequential jobs of pure scheduling), so each round
    * commits a PREFIX of the ranked top-`maxBatch` candidate list that
    * provably matches what sequential greedy training would pick
    * (spec-pinned ≡ [[trainSequential]] on interacting corpora):
    *
    *  - candidates are taken strictly in rank order (count DESC, then
    *    left/right ASC) and the prefix STOPS at the first rejection —
    *    never skips — so everything ranked above an accepted merge is
    *    itself in the batch;
    *  - a candidate sharing a symbol with any earlier batch member is
    *    rejected: merging `(a,b)` only rewrites occurrences touching
    *    `a` or `b`, so a symbol-disjoint pair's count is exactly
    *    unchanged by the earlier merges — its rank claim still holds.
    *    "Sharing" includes the CREATED symbol `a||b`: BPE symbols are
    *    strings, and the same string is reachable via different merge
    *    paths (symbol `ab` can pre-exist while `(a,b)` merges), so a
    *    later candidate whose left or right symbol EQUALS an accepted
    *    member's concatenation could have its count increased by that
    *    member and must not ride the batch;
    *  - a candidate whose count does not STRICTLY exceed the largest
    *    possible count of any pair CREATED by earlier batch members is
    *    rejected: a new pair `(x, a||b)` inherits occurrences of the
    *    old pair `(x, a)` and `(a||b, y)` of `(b, y)`, so
    *    `max(maxRight(a), maxLeft(b))` over the CURRENT pair table
    *    bounds every pair a merge can create — if the candidate clears
    *    that bound, no new pair can outrank it (ties reject: a new
    *    pair at equal count could win the binary-order tie-break).
    *
    * Per round the cost is one chained rewrite projection applying the
    * batch in rank order (exactly the sequential rewrites) plus the
    * pair-table refresh: the table is DELTA-MAINTAINED — seeded by one
    * full aggregation, then updated each round from only the words the
    * batch actually rewrote (retract old adjacencies, assert new ones;
    * untouched words contribute identically by the batch's disjointness,
    * so the maintained table equals a full re-aggregation by induction,
    * spec-pinned). Late rounds merge rare pairs touching a sliver of
    * the histogram, so per-round cost tracks the sliver, not the
    * corpus — the other half of the 32k-vocabulary asymptote.
    *
    * Exact batches are CORPUS-DEPENDENT: merge cascades bound them —
    * after `(e, r)` wins, the brand-new `(er, </w>)` may legitimately
    * outrank every standing candidate, so the prefix rule must stop
    * (measured ~1.7 merges/round on natural English text, 3+ on
    * structured corpora). `exactGreedy = false` is the documented
    * escape for production-scale vocabularies: the scan SKIPS
    * conflicting candidates instead of stopping and drops the
    * new-pair bound, committing up to `maxBatch` merges per round —
    * rounds ≈ merges/maxBatch, still fully deterministic (a pure
    * function of the ranked table; spec-pinned partition-invariant),
    * but the merge RANKING is no longer greedy-faithful, so it is
    * opt-in and every DuckDB-oracle query stays on the exact path. */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxBatch: Int = 64,
      exactGreedy: Boolean = true
  ): Seq[Merge] = trainCounted(df, textCol, numMerges, maxBatch, exactGreedy)._1

  /** [[train]] plus the number of aggregation ROUNDS it took — the
    * merges-per-job diagnostic ScaleSmoke reports (the whole point of
    * batching is rounds ≪ merges). */
  private[graft] def trainCounted(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxBatch: Int = 64,
      exactGreedy: Boolean = true,
      deltaPairs: Boolean = true
  ): (Seq[Merge], Int) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val base = wordHistogram(df, textCol)
      .withColumn("syms", BpeExpressions.bpeSymbols(col("word")))
    // first action below is the full-pass pairs aggregation → lazy blocks
    var anchor = graft.Checkpoints.localCheckpoint(base, eager = false)
    var state = anchor
    // DELTA-MAINTAINED pair table (the default): ONE full aggregation
    // seeds it, then each round subtracts the rewritten words' old
    // pairs and adds their new ones — a word the batch doesn't touch
    // contributes identically before and after (batch members are
    // symbol- and created-concat-disjoint, so no untouched word can
    // gain or lose an adjacency), so the maintained table equals the
    // full re-aggregation by induction, at the cost of aggregating only
    // the CHANGED words per round. That is the 32k-vocabulary
    // asymptote: late rounds merge rare pairs that touch a sliver of
    // the histogram, and the per-round cost tracks that sliver instead
    // of the corpus. `deltaPairs = false` keeps the re-aggregating
    // loop (the ScaleSmoke comparison baseline and the induction spec's
    // reference).
    var pairsTbl: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var sinceCheckpoint = 0
    var exhausted = false
    var rounds = 0
    while (merges.size < numMerges && !exhausted) {
      rounds += 1
      val pairs =
        if (deltaPairs) {
          if (pairsTbl == null)
            pairsTbl = graft.Checkpoints.localCheckpoint(
              pairCounts(state, "syms", "cnt"), eager = true)
          pairsTbl
        } else pairCounts(state, "syms", "cnt").persist()
      val want = math.min(maxBatch, numMerges - merges.size)
      val top = pairs
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(want)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) {
        exhausted = true
        if (!deltaPairs) pairs.unpersist(blocking = false)
      } else {
        // symbol-grain maxes over the candidates' symbols only: the
        // tightest count any merge-created pair can reach
        val lefts = top.map(_._2).distinct // maxLeft(b): pairs (b, y)
        val rights = top.map(_._1).distinct // maxRight(a): pairs (x, a)
        val maxLeft = pairs.filter(col("left_sym").isin(lefts.toSeq: _*))
          .groupBy("left_sym").agg(max("pair_count").as("m"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val maxRight = pairs.filter(col("right_sym").isin(rights.toSeq: _*))
          .groupBy("right_sym").agg(max("pair_count").as("m"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        if (!deltaPairs) pairs.unpersist(blocking = false)
        // merging (a, b) changes ONLY pairs (x, a) — the a is consumed
        // when followed by b — and (b, y): a candidate (c, d) is
        // affected by an earlier batch member iff d equals its LEFT
        // symbol or c equals its RIGHT symbol; merely sharing a right
        // symbol (e.g. two `(·, </w>)` pairs) never interacts, which is
        // what makes natural-text batches large
        val lefts2 = scala.collection.mutable.Set.empty[String]
        val rights2 = scala.collection.mutable.Set.empty[String]
        // concatenations a||b of accepted members: a later candidate
        // whose own symbol equals one is NOT count-stable — the earlier
        // merge mints new copies of that exact string (reachable via a
        // different merge path), so its standing count can INCREASE and
        // its rank claim no longer holds
        val created = scala.collection.mutable.Set.empty[String]
        var newPairBound = Long.MinValue
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var open = true
        for (cand <- top if open) {
          val (a, b, c) = cand
          val rejected = batch.nonEmpty && (lefts2(b) || rights2(a) ||
            created(a) || created(b) ||
            (exactGreedy && c <= newPairBound))
          if (rejected) {
            // exact mode: the prefix STOPS (never skips) — everything
            // ranked above an accepted merge must itself be in the
            // batch for the rank claim to hold. Approximate mode keeps
            // scanning: a non-conflicting candidate further down still
            // applies cleanly, only the greedy RANK fidelity is given
            // up (and the new-pair bound with it).
            if (exactGreedy) open = false
          } else {
            batch += cand
            lefts2 += a; rights2 += b; created += (a + b)
            // a new pair (x, a||b) inherits occurrences of BOTH (x, a)
            // and the merge itself, so min(count, adjacent max) is the
            // tight bound
            newPairBound = math.max(newPairBound, math.min(c,
              math.max(maxRight.getOrElse(a, 0L), maxLeft.getOrElse(b, 0L))))
          }
        }
        batch.foreach { case (a, b, c) =>
          merges += Merge(merges.size + 1, a, b, c)
        }
        // one projection, greedy passes chained in rank order (disjoint
        // symbols ⇒ identical to applying them in separate passes)
        val chained = batch.foldLeft(col("syms")) { case (acc, (a, b, _)) =>
          BpeExpressions.bpeMergeStep(acc, a, b)
        }
        if (deltaPairs) {
          // delta the pair table off ONLY the words the batch rewrote:
          // a changed row retracts its old adjacencies and asserts its
          // new ones; integer sums, rows reaching zero drop
          val staged = state.withColumn("__new", chained)
          val changed = staged.filter(col("__new") =!= col("syms"))
          val d3 = Seq(col("left_sym"), col("right_sym"), col("d"))
          val newPairs = pairsTbl
            .select(col("left_sym"), col("right_sym"), col("pair_count").as("d"))
            .unionByName(pairCounts(changed.select(col("cnt"), col("syms")),
              "syms", "cnt")
              .select(col("left_sym"), col("right_sym"), (-col("pair_count")).as("d"))
              .select(d3: _*))
            .unionByName(pairCounts(
              changed.select(col("cnt"), col("__new").as("syms")), "syms", "cnt")
              .select(col("left_sym"), col("right_sym"), col("pair_count").as("d"))
              .select(d3: _*))
            .groupBy("left_sym", "right_sym")
            .agg(sum(col("d")).as("pair_count"))
            .filter(col("pair_count") > 0)
          val np = graft.Checkpoints.localCheckpoint(newPairs, eager = true)
          graft.Checkpoints.free(pairsTbl)
          pairsTbl = np
          state = staged.select(col("word"), col("cnt"), col("__new").as("syms"))
        } else {
          state = state.withColumn("syms", chained)
        }
        sinceCheckpoint += batch.size
        if (sinceCheckpoint >= CheckpointEvery && merges.size < numMerges) {
          val next = graft.Checkpoints.localCheckpoint(state, eager = true)
          graft.Checkpoints.free(anchor)
          anchor = next
          state = next
          sinceCheckpoint = 0
        }
      }
    }
    graft.Checkpoints.free(anchor)
    if (pairsTbl != null) graft.Checkpoints.free(pairsTbl)
    (merges.toSeq, rounds)
  }

  /** The historical one-merge-per-round loop — kept as the semantics
    * REFERENCE the batched [[train]] is spec-pinned against (and the
    * honest fallback if a corpus somehow defeats the batch prefix
    * rule: `maxBatch = 1` in [[train]] is this, minus one extra
    * aggregation per round). */
  private[graft] def trainSequential(
      df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val base = wordHistogram(df, textCol)
      .withColumn("syms", BpeExpressions.bpeSymbols(col("word")))
    var anchor = graft.Checkpoints.localCheckpoint(base, eager = false)
    var state = anchor
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val top = pairCounts(state, "syms", "cnt")
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1)
        .collect()
      if (top.isEmpty) {
        exhausted = true
      } else {
        val row = top(0)
        val (a, b) = (row.getString(0), row.getString(1))
        merges += Merge(r, a, b, row.getLong(2))
        state = state.withColumn(
          "syms", BpeExpressions.bpeMergeStep(col("syms"), a, b))
        if (r % CheckpointEvery == 0 && r < numMerges) {
          val next = graft.Checkpoints.localCheckpoint(state, eager = true)
          graft.Checkpoints.free(anchor)
          anchor = next
          state = next
        }
        r += 1
      }
    }
    graft.Checkpoints.free(anchor)
    merges.toSeq
  }

  /** The learned merge table as a DataFrame:
    * (rank, left_sym, right_sym, pair_count). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map(m => Row(m.rank, m.left, m.right, m.pairCount)), 1),
      schema)
  }

  /** Persist a trained BPE merge list as a SERVING ARTIFACT — the
    * [[graft.ops.UnigramTrain.saveTokenizer]] treatment for the merge
    * family: train once, freeze, and every later encode job loads the
    * identical ordered merges instead of re-running the pair-count
    * rounds. Layout: `merges/` = the [[mergeTable]] frame; `stats/` =
    * one row `(n_merges)` written LAST as the commit marker —
    * [[loadBpe]] refuses a merges/stats mismatch (an encode under half
    * a merge list segments differently). */
  def saveBpe(spark: SparkSession, merges: Seq[Merge], path: String): Unit = {
    mergeTable(spark, merges)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(merges.size.toLong)), 1),
      StructType(Seq(StructField("n_merges", LongType, nullable = false))))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a [[saveBpe]] artifact in rank order — merge-list-bounded
    * driver state, the [[train]] contract. Refuses loudly on a torn
    * merges/stats pair. */
  def loadBpe(spark: SparkSession, path: String): Seq[Merge] = {
    val expected = spark.read.parquet(s"$path/stats").head().getAs[Long]("n_merges")
    val rows = spark.read.parquet(s"$path/merges")
      .orderBy(col("merge_rank")).collect()
    require(rows.length.toLong == expected,
      s"loadBpe: artifact at '$path' is torn — stats row pins $expected " +
        s"merges but merges/ holds ${rows.length}; re-save with saveBpe")
    rows.map(r => Merge(r.getAs[Int]("merge_rank"), r.getAs[String]("left_sym"),
      r.getAs[String]("right_sym"), r.getAs[Long]("pair_count"))).toSeq
  }

  /** Distinct-word encodings under a learned merge list:
    * (word, cnt, tokens) — the word-cache frame corpus encodes join
    * against. One native encode pass per distinct word. */
  def encodeWords(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    wordHistogram(df, textCol)
      .withColumn("tokens",
        BpeExpressions.bpeEncode(col("word"), merges.map(m => (m.left, m.right))))

  /** Corpus-wide subword token frequencies after BPE encoding:
    * (token, freq), frequency-weighted by the word histogram — the
    * vocabulary-coverage report for a trained tokenizer. Never touches
    * the corpus beyond the histogram pass. */
  def tokenFrequencies(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    encodeWords(df, textCol, merges)
      .select(col("cnt"), explode(col("tokens")).as("token"))
      .groupBy("token")
      .agg(sum("cnt").as("freq"))

  /** Per-document BPE token counts: explode each document's words (with
    * multiplicity), join the word-cache encodings, sum token counts —
    * the sequence-length profile a packing/sharding stage consumes.
    * Documents with no tokens report 0.
    *
    * Scale shape: the per-word token LENGTH (one int) is joined back,
    * not the token arrays; AQE broadcasts the distinct-word side when it
    * fits. */
  def tokensPerDoc(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val wordLens = encodeWords(df, textCol, merges)
      .select(col("word"), size(col("tokens")).as("n_tok"))
    val docWords = df
      .select(col(idCol),
        explode_outer(WordGrams.wordGramsMulti(coalesce(col(textCol), lit("")), 1))
          .as("word"))
    docWords
      .join(wordLens, Seq("word"), "left")
      .groupBy(idCol)
      .agg(coalesce(sum("n_tok"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Tokenizer FERTILITY report — the standard tokenizer-quality metric
    * (BPE tokens per whitespace word; 1.0 = every word is one token,
    * higher = the vocabulary fragments this source's text): per source,
    * exact integer token/word totals and their rounded ratio. A source
    * whose fertility is far above the corpus mean is poorly served by
    * the trained vocabulary (wrong language/script for the merges) —
    * the signal that drives vocab-size and mixing decisions.
    *
    * Scale shape: [[tokensPerDoc]]'s distinct-word join + two exact
    * integer sums per source; output bounded at |sources| rows. Sources
    * with zero words report null fertility (nothing to judge). */
  def fertility(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      merges: Seq[Merge]
  ): DataFrame = {
    val bpe = tokensPerDoc(df, idCol, textCol, merges)
    val words = df.select(col(idCol), col(sourceCol).as("source"),
      when(col(textCol).isNull, lit(0))
        .otherwise(TextAnalysis.tokenCount(col(textCol))).as("__w"))
    words.join(bpe, Seq(idCol))
      .groupBy("source")
      .agg(sum("__w").cast("long").as("n_words"),
        sum("n_bpe_tokens").as("n_bpe_tokens"))
      .withColumn("fertility_r",
        round(col("n_bpe_tokens") / col("n_words"), 6) + lit(0.0))
  }
}
