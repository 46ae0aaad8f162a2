package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay documents end-to-end in a
  * deterministic order and cut fixed token-budget chunks — the standard
  * "concat then chunk" packing that turns a ragged corpus into uniform
  * training sequences.
  *
  * Each document gets its exclusive prefix-sum offset within its SHARD
  * (`offset = Σ tokens of earlier docs`), and from it the chunk range it
  * lands in: `chunk_first = offset / budget`, `chunk_last = (offset +
  * tokens - 1) / budget`. Docs straddling a boundary span two+ chunks
  * (`n_chunks`), exactly like the flattened token stream would.
  *
  * Scale: a single global concat order would funnel the corpus through
  * one partition (the prefix sum is inherently sequential), so packing is
  * sharded — the window partitions by `shardCol` and each shard packs
  * independently. That is also what production packing does: shard by
  * hash/source first, pack within shards, train on shard-local chunks.
  */
object Packing {

  def sequencePacking(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      shardCol: String,
      budget: Long,
      orderCol: String
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix: running sum minus own contribution; `div` keeps
    // the chunk math in exact integer arithmetic (a double division +
    // cast would round differently across engines)
    val offset = sum(col(tokenCol).cast("long")).over(w) - col(tokenCol).cast("long")
    df.withColumn("offset", offset)
      .withColumn("__last_tok",
        col("offset") + greatest(col(tokenCol).cast("long"), lit(1L)) - lit(1L))
      .withColumn("chunk_first", expr(s"offset div $budget"))
      .withColumn("chunk_last", expr(s"__last_tok div $budget"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + lit(1L))
      .drop("__last_tok")
  }

  /** Chunk PROVENANCE — the data-lineage record a training-data release
    * keeps alongside its packed sequences: which document contributed
    * which token span of which chunk. One row per (chunk, contributing
    * doc): `chunk_start` (the doc's first in-chunk token position) and
    * `n_from_doc` (how many of its tokens land in this chunk) — pure
    * integer arithmetic over [[sequencePacking]]'s offsets, so "which
    * training sequence contains document X" (takedowns, contamination
    * forensics) is an index lookup, not a re-tokenization. Zero-token
    * docs contribute nothing. Map-side explode bounded by each doc's
    * `n_chunks`; no shuffle. */
  def chunkProvenance(
      packed: DataFrame,
      idCol: String,
      tokenCol: String,
      shardCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    packed
      .filter(col(tokenCol) > 0)
      .select(col(shardCol).as("shard"), col(idCol), col("offset"),
        col(tokenCol).cast("long").as("__n"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk_id"))
      .withColumn("__cstart", col("chunk_id") * budget)
      .withColumn("__sg", greatest(col("offset"), col("__cstart")))
      .withColumn("__eg",
        least(col("offset") + col("__n"), col("__cstart") + lit(budget)))
      .select(col("shard"), col("chunk_id"), col(idCol),
        (col("__sg") - col("__cstart")).as("chunk_start"),
        (col("__eg") - col("__sg")).as("n_from_doc"))
  }

  /** MATERIALIZE the packed training sequences — the last step of
    * "tokenize, shuffle, pack": each document's token array (any element
    * type) lands on its global stream positions (`offset + position`)
    * and every (shard, chunk) collects its tokens in exact stream order.
    * Output: (shard, chunk_id, n_tokens, tokens) — full chunks carry
    * `budget` tokens, each shard's tail chunk runs short.
    *
    * Order is explicit (array_sort on the unique global position), never
    * exec arrival order — the engine-wide determinism contract. Scale
    * shape: one token explode (linear in corpus tokens — the size of the
    * thing being produced) into one aggregation; each (shard, chunk)
    * buffer holds ≤ `budget` tokens. */
  def materializeChunks(
      packed: DataFrame,
      tokensCol: String,
      shardCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    packed
      .select(col(shardCol).as("shard"), col("offset"),
        posexplode(col(tokensCol)).as(Seq("__pos", "__tok")))
      .withColumn("__gpos", col("offset") + col("__pos"))
      .withColumn("chunk_id", expr(s"__gpos div $budget"))
      .groupBy("shard", "chunk_id")
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        transform(array_sort(collect_list(struct(col("__gpos"), col("__tok")))),
          x => x.getField("__tok")).as("tokens"))
  }

  /** DOCUMENT-INTACT packing — the SFT/instruction-tuning sibling of
    * [[sequencePacking]]: examples must never split across training
    * sequences, so instead of concat-then-chunk, documents bin by
    * NEXT-FIT in id order within their shard (a doc that would
    * overflow the open bin closes it and starts the next; a single
    * doc longer than `budget` gets a bin of its own — the caller's
    * truncation policy applies downstream). The assignment is a pure
    * function of (shard, id order, token counts): deterministic,
    * replayable, and partition-invariant.
    *
    * Output: `(shardCol, idCol, nTokCol, bin)` — bin is 0-based per
    * shard. Null ids/shards/token counts refuse loudly (a silent null
    * would shift every later bin in the shard).
    *
    * Scale shape: next-fit is a SEQUENTIAL recurrence, so each shard
    * packs in one pass on one task (`repartition(shard)` +
    * in-partition sort — shards are the parallelism unit, the same
    * contract as [[sequencePacking]]'s per-shard prefix sums); size
    * shards so one shard's doc LIST fits a task, which any real
    * sharding already guarantees. The per-row state is two longs. */
  def packDocsIntact(
      df: DataFrame,
      idCol: String,
      nTokCol: String,
      shardCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val proj = df.select(
      when(col(shardCol).isNull || col(idCol).isNull || col(nTokCol).isNull,
        raise_error(lit("packDocsIntact: null shard/id/token count — a " +
          "silent null would shift every later bin in the shard; fill or " +
          "drop upstream"))).otherwise(col(shardCol)).as(shardCol),
      col(idCol), col(nTokCol).cast("long").as(nTokCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      proj.schema.fields :+ org.apache.spark.sql.types.StructField(
        "bin", org.apache.spark.sql.types.LongType, nullable = false))
    proj
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(idCol))
      .mapPartitions { rows =>
        // a partition holds whole shards (hash-routed); shards arrive
        // contiguously after the sort, so two longs of running state
        // per shard suffice
        var cur: Any = null
        var started = false
        var bin = 0L
        var fill = 0L
        rows.map { r =>
          val sh = r.get(0)
          val n = r.getLong(2)
          if (!started || sh != cur) {
            started = true; cur = sh; bin = 0L; fill = n
          } else if (fill + n <= budget) {
            fill += n
          } else {
            bin += 1L; fill = n
          }
          org.apache.spark.sql.Row(sh, r.get(1), n, bin)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** LENGTH-BUCKETED batch assignment — the inference/eval-side packing
    * discipline next to the training-side packers: a batch pads every
    * sequence to its longest member, so batching ARRIVAL order wastes
    * compute on padding while batching LENGTH order puts like-sized
    * sequences together (the "sorted batching" every serving stack
    * runs). Docs sort by (length DESC, id ASC — deterministic ties)
    * within their shard and consecutive runs of `batchSize` form a
    * batch: `batch_idx = (row_number − 1) div batchSize`.
    *
    * Scale shape: one per-shard window (shards are the parallelism
    * unit, the [[sequencePacking]] contract — a global sort would
    * funnel the corpus through one partition); everything else is
    * map-side integer arithmetic. Null shard/id/length refuses loudly —
    * a silent null would shift every later batch in the shard. */
  def lengthBucketedBatches(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      shardCol: String,
      batchSize: Int
  ): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val guarded = df.select(
      when(col(shardCol).isNull || col(idCol).isNull || col(lenCol).isNull,
        raise_error(lit("lengthBucketedBatches: null shard/id/length — a " +
          "silent null would shift every later batch in the shard; fill " +
          "or drop upstream"))).otherwise(col(shardCol)).as(shardCol),
      col(idCol), col(lenCol).cast("long").as(lenCol))
    val w = Window.partitionBy(shardCol)
      .orderBy(col(lenCol).desc, col(idCol).asc)
    guarded
      .withColumn("__rn0", (row_number().over(w) - 1).cast("long"))
      .withColumn("batch_idx", expr(s"__rn0 div ${batchSize.toLong}"))
      .drop("__rn0")
  }

  /** Per-batch PADDING report over a [[lengthBucketedBatches]] (or any
    * batch-assigned) frame: exact integer doc counts, max and summed
    * lengths, and the padding fraction `(n·max − Σlen) / (n·max)` — the
    * share of the batch's compute spent on pad tokens (one double
    * division off exact integers, 6dp). Sorted batching drives this
    * toward 0; compare against an arrival-order assignment to size the
    * win. Output: `(shardCol, batchCol, n_docs, max_len, sum_len,
    * pad_frac_r)` — one hash aggregation at batch grain. A batch of
    * all-zero-length docs (legal [[lengthBucketedBatches]] input) has
    * no compute to pad: it reports 0.0, not 0/0 = NaN. */
  def paddingReport(
      df: DataFrame,
      lenCol: String,
      shardCol: String,
      batchCol: String = "batch_idx"
  ): DataFrame =
    df.groupBy(col(shardCol), col(batchCol))
      .agg(count(lit(1)).as("n_docs"),
        max(col(lenCol).cast("long")).as("max_len"),
        sum(col(lenCol).cast("long")).as("sum_len"))
      .withColumn("pad_frac_r",
        when(col("n_docs") * col("max_len") === 0L, lit(0.0)).otherwise(
          round((col("n_docs") * col("max_len") - col("sum_len")).cast("double") /
            (col("n_docs") * col("max_len")).cast("double"), 6) + lit(0.0)))
}
