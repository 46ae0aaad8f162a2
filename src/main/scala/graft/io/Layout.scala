package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output-layout helpers for corpus sinks. At 100 TB the WRITE layout is
  * a first-class design decision: Hive-style partition directories give
  * readers partition pruning for free, and the file count per partition
  * decides whether the next job reads a handful of fat files or drowns
  * in small-file overhead.
  */
object Layout {

  /** Writes `df` as parquet partitioned by `partitionCols`
    * (`.../col=value/` directories → partition-pruned scans), with at most
    * `filesPerPartition` output files per partition value.
    *
    * The repartition BEFORE the write is the load-bearing part: without
    * it every input task writes its own file into every partition
    * directory it touches — tasks × partitions small files; with it,
    * rows hash-route to `filesPerPartition` buckets inside their
    * partition first, bounding each directory's file count.
    *
    * The file bucket hashes the row's HASHABLE values (not
    * `spark_partition_id`, whose distinct values are capped by the
    * upstream partition count — a coalesced or single-file input would
    * collapse every directory to one file regardless of the setting).
    * Row-value hashing is independent of input partitioning; directories
    * can still come up short only when a partition value genuinely has
    * too few distinct rows, or on hash collisions between buckets.
    * Columns containing a MapType anywhere in their type are excluded
    * from the bucket hash — Spark's `hash()` rejects maps at analysis
    * time (map iteration order is undefined) — and a frame with NO
    * hashable column falls back to `spark_partition_id` routing. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      filesPerPartition: Int = 1
  ): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val keys = partitionCols.map(col)
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val bucket =
      if (hashCols.nonEmpty) pmod(hash(hashCols.toSeq: _*), lit(filesPerPartition))
      else pmod(spark_partition_id(), lit(filesPerPartition))
    // explicit partition count when fanning out: an AQE-sized repartition
    // (REPARTITION_BY_COL) coalesces small shuffles back to one task,
    // which re-merges the buckets this call exists to split apart
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val routed =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else df.repartition(math.max(n, filesPerPartition), (keys :+ bucket): _*)
    routed.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
