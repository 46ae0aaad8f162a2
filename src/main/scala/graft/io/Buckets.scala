package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located-join design for joins that
  * repeat at 100 TB (fact-to-fact on a shared key). Writing both sides
  * bucketed AND sorted by the join key lets Spark's bucketed scan satisfy
  * the join's distribution requirement directly — the physical plan
  * contains NO Exchange; with
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
  * default since Spark 3.0) the per-query Sort disappears too. The
  * one-time write cost amortizes over every subsequent join.
  *
  * (Plain parquet + AQE remains the default for ad-hoc work; bucketing is
  * the tool for standing pipelines over stable keys.)
  */
object Buckets {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    // repartition on the bucket key first: otherwise every write task emits
    // its own file per bucket and a bucket becomes many small files
    df.repartition(numBuckets, bucketCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket key. With matching
    * bucket counts this plans as an exchange-free sort-merge join. */
  def cocolocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
