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
    * (`.../col=value/` directories → partition-pruned scans), with
    * `filesPerPartition` output files per partition value.
    *
    * The repartition BEFORE the write is the load-bearing part: without
    * it every input task writes its own file into every partition
    * directory it touches — tasks × partitions small files; with it,
    * rows hash-route to `filesPerPartition` buckets inside their
    * partition first, so each directory gets exactly that many
    * well-sized files. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      filesPerPartition: Int = 1
  ): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val keys = partitionCols.map(col)
    val routed =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else df.repartition((keys :+ (spark_partition_id() % filesPerPartition)): _*)
    routed.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
