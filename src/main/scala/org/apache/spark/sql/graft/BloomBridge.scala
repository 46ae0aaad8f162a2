package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge to Spark's internal Bloom-filter expressions — the same pair
  * the optimizer's runtime-filter injection uses
  * (`InjectRuntimeFilter`): a distributed [[BloomFilterAggregate]] that
  * builds one serialized sketch over xxhash64 values, and the codegen'd
  * [[BloomFilterMightContain]] probe. Neither is registered in the
  * public function registry, hence the package bridge (same technique as
  * [[ColumnBridge]]).
  */
object BloomBridge {

  /** Aggregate a LongType hash column into one serialized Bloom filter
    * (binary). `estimatedItems` and `numBits` must stay within
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
    * (defaults 4e6 / 67108864). */
  def bloomAgg(hashes: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashes),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a CONSTANT serialized Bloom filter with a LongType hash
    * column (the expression requires a foldable filter side — a literal
    * here, a scalar subquery in the optimizer's use). Null filter or
    * null hash yields null. */
  def mightContain(bloom: Array[Byte], hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(hash)))
}
