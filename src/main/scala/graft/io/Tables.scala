package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loader for the shared testdata tables with a stable `ts` contract.
  *
  * The fixture generator has shipped `events.ts` under two physical parquet
  * encodings across rounds:
  *   - TIMESTAMP(NANOS), which `spark.sql.legacy.parquet.nanosAsLong=true`
  *     surfaces as BIGINT epoch-nanoseconds;
  *   - TIMESTAMP(MICROS), which surfaces as TIMESTAMP / TIMESTAMP_NTZ.
  * Every downstream operator and every DuckDB oracle (`epoch_ns(ts)` /
  * `epoch_us(ts)` work on either encoding there) assumes ONE logical
  * contract: `ts` is epoch nanoseconds as a long. This loader normalizes
  * whichever encoding arrives to that contract, so a fixture regeneration
  * cannot silently break the temporal operators again.
  *
  * TIMESTAMP_NTZ note: extracting an epoch from a zone-less wall clock
  * needs a zone; all graft entry points pin `spark.sql.session.timeZone=UTC`
  * ([[graft.GraftSession]]), making the reinterpretation deterministic —
  * and equal to DuckDB's, which also treats the NTZ wall clock as UTC.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Rewrite a timestamp-typed `ts` column to epoch-nanos long, in place
    * (column order preserved). Long / absent `ts` passes through untouched. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
}
