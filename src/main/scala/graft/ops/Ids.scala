package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Surrogate-id on-ramp for the engine-wide numeric-id contract.
  *
  * Every dedup/ANN/top-k operator here keys its heaps, folds, and band
  * joins by a numeric unique id (longs travel through primitive
  * encoders; [[GroupTopK]] refuses non-numeric ids loudly). A web corpus
  * is usually keyed by URL or UUID — this is the missing bridge: map the
  * string key to a DENSE, DETERMINISTIC long once, run the numeric
  * operators, then join the original key back.
  *
  * The surrogate of an id is its 0-based RANK IN THE SORTED ORDER of the
  * distinct ids (binary/UTF8 string order — SQL `row_number() OVER
  * (ORDER BY id) - 1`). Chosen over `monotonically_increasing_id` /
  * raw `zipWithIndex` because rank is a PURE FUNCTION of the id set:
  *  - stable across recomputes, partitionings, and runs — no eager
  *    checkpoint needed to freeze it (the `__bid_id` precedent needs one
  *    precisely because mid is execution-order-dependent);
  *  - order-compatible: `min(surrogate)` ≡ `min(original id)` per group,
  *    so min-id keeper semantics survive the mapping;
  *  - engine-replayable: a SQL oracle can re-derive every value.
  *
  * Scale shape: ranks come from a range-repartitioned sort of the
  * DISTINCT id frame (narrow: one string column) + per-partition
  * zipWithIndex — partition index offsets are exact because range
  * partitions are globally ordered; no single-partition window, no
  * driver collect beyond one count per partition (the
  * [[graft.Ranks]] scalable-rank shape). The mapping join is a plain
  * equi-join on the id — broadcast when small, shuffle once when not.
  */
object Ids {

  /** A surrogate-keyed frame plus the (id → sid) mapping to join back. */
  final case class SurrogateResult(df: DataFrame, mapping: DataFrame)

  /** The (distinct id → dense 0-based sorted-rank long) mapping.
    * Null ids are refused loudly — the numeric-id contract is non-null. */
  def surrogateMapping(df: DataFrame, idCol: String, sidCol: String = "sid"): DataFrame = {
    val ids = df
      .select(when(col(idCol).isNull,
        raise_error(lit(s"withSurrogateId: id column '$idCol' must be non-null")))
        .otherwise(col(idCol).cast("string")).as(idCol))
      .distinct()
    val spark = df.sparkSession
    val parts = math.max(1, ids.rdd.getNumPartitions)
    // Global sorted order: range partitions are ordered, rows sorted
    // within each, so partition-local index + the prefix count of all
    // earlier partitions IS the global rank. zipWithIndex computes
    // exactly that (one count job, no collect of data).
    val ranked = ids
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
      .rdd
      .zipWithIndex()
      .map { case (r: Row, i: Long) => Row(r.getString(0), i) }
    spark.createDataFrame(ranked, StructType(Seq(
      StructField(idCol, org.apache.spark.sql.types.StringType, nullable = false),
      StructField(sidCol, LongType, nullable = false))))
  }

  /** Adds `sidCol` = the dense deterministic surrogate long for `idCol`;
    * returns the augmented frame AND the mapping for [[restoreId]]. */
  def withSurrogateId(
      df: DataFrame,
      idCol: String,
      sidCol: String = "sid"
  ): SurrogateResult = {
    val mapping = surrogateMapping(df, idCol, sidCol)
    val joined = df
      .withColumn("__sid_key", col(idCol).cast("string"))
      .join(mapping.withColumnRenamed(idCol, "__sid_key"), Seq("__sid_key"))
      .drop("__sid_key")
    SurrogateResult(joined, mapping)
  }

  /** Join-back: replaces `sidCol` in `result` with the original id under
    * its original name. Surrogates that never existed in the mapping are
    * a contract violation (the operator invented an id) — inner join
    * would hide them, so it raises via a null check after a left join. */
  def restoreId(result: DataFrame, mapping: DataFrame, sidCol: String = "sid"): DataFrame = {
    val idCol = mapping.columns.filterNot(_ == sidCol).head
    require(!result.columns.contains(idCol),
      s"restoreId: result already has a '$idCol' column")
    result
      .join(mapping, Seq(sidCol), "left")
      .withColumn(idCol,
        when(col(idCol).isNull,
          raise_error(concat(lit("restoreId: surrogate with no mapping entry: "),
            col(sidCol).cast("string"))))
          .otherwise(col(idCol)))
      .drop(sidCol)
  }
}
