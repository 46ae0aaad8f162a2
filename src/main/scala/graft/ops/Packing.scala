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
}
