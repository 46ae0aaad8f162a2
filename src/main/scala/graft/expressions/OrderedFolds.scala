package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native deterministic sum: sort `array<struct<k: long, v: double>>` by
  * key, then left-fold `0.0 + v` in key order — exactly the engine's
  * `aggregate(array_sort(collect_list(struct(k, v))), 0.0, _+_)`
  * convention (== DuckDB `list_reduce(list_prepend(0.0,
  * list(v ORDER BY k)), +)`), which is the bit-reproducible cross-engine
  * sum every deterministic-FP operator here uses.
  *
  * Why native: `aggregate` is a higher-order function — its lambda
  * evaluates INTERPRETED per element, and a centroid-style fold over 10⁸
  * exploded elements spends its whole budget in lambda dispatch
  * (measured: labelCentroids at 12M rows × 8 dims took 330s through the
  * HOF chain; the loop itself is milliseconds). One codegen'd compute
  * call replaces the whole sort+fold.
  *
  * Contract: keys are unique within one array (the engine's unique-id
  * contract) — the sort is stable, so equal keys would still fold in
  * collect_list arrival order, which is NOT deterministic; don't feed
  * duplicate keys. Null structs/fields are absent by construction
  * (collect_list never emits null elements; struct fields come from
  * non-null columns) and make the result null defensively if present. */
case class OrderedKeyedSum(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(k, v)), _)
        if k.dataType == LongType && v.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ordered_keyed_sum requires array<struct<long, double>>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // null is reachable (defensive corrupt-input path) even from
  // non-nullable children — see DotProduct.nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ordered_keyed_sum"

  override protected def nullSafeEval(a: Any): Any =
    OrderedKeyedSum.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("oks")
      s"""
         |Object $tmp = graft.expressions.OrderedKeyedSum.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Double) $tmp).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedKeyedSum =
    copy(child = newChild)
}

object OrderedKeyedSum {

  /** Sort by key, fold 0.0 + v left-to-right. Returns java.lang.Double
    * (null on corrupt input) for codegen-friendly boxing at the boundary
    * only. */
  def compute(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    val keys = new Array[Long](n)
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val st = arr.getStruct(i, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      keys(i) = st.getLong(0)
      vals(i) = st.getDouble(1)
      i += 1
    }
    // index sort by key (stable for safety; keys are unique by contract)
    val idx = Array.range(0, n)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (x: Integer, y: Integer) =>
      java.lang.Long.compare(keys(x.intValue()), keys(y.intValue())))
    var s = 0.0
    var j = 0
    while (j < n) { s += vals(boxed(j).intValue()); j += 1 }
    java.lang.Double.valueOf(s)
  }

  /** Column API: deterministic keyed sum of (k: castable-to-long,
    * v: double) — drop-in for the HOF sorted-fold chain. */
  def orderedKeyedSum(kv: Column): Column =
    ColumnBridge.column(OrderedKeyedSum(ColumnBridge.expression(kv)))
}

/** Vector sibling of [[OrderedKeyedSum]]: sort
  * `array<struct<k: long, v: array<double>>>` by key, then fold the
  * vectors ELEMENTWISE in key order with the engine's unseeded
  * `v0 + v1 + ...` convention (the first vector is copied, not added to
  * zeros). Output: `struct<_1: array<double> sum, _2: bigint count>` —
  * the shape [[graft.ops.Labels.labelCentroids]]'s level-1 fold hands to
  * level 2.
  *
  * Why this exists: the previous level-1 fold was an Aggregator whose
  * per-group summation order was whatever row order the aggregate exec
  * delivered — correct only while `repartition + sortWithinPartitions`
  * order survived into the hash aggregate, which
  * ObjectHashAggregateExec's sort-based fallback (default threshold 128
  * distinct keys per partition) does not guarantee. Here order is
  * explicit: collect_list may deliver the structs in ANY order (hash
  * fallback, partial-merge interleaving — all irrelevant), the sort by
  * unique key fixes the fold order, so the doubles are bit-identical
  * across runs, partitionings, exec strategies, and engines.
  *
  * Contract: keys unique within one array (the engine-wide unique-id
  * contract); all vectors same length, all keys/vectors/elements
  * non-null — ANY violation throws loudly (a silently-nulled group
  * would drop a whole (label, bucket) partial from a centroid; one
  * non-numeric id that cast to null must fail the job, the same
  * convention as [[graft.ops.GroupTopK]]'s raise_error id guard). */
case class OrderedKeyedVecSum(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(k, v)), _)
        if k.dataType == LongType &&
          v.dataType.isInstanceOf[ArrayType] &&
          v.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ordered_keyed_vec_sum requires array<struct<long, array<double>>>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("_1", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("_2", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ordered_keyed_vec_sum"

  override protected def nullSafeEval(a: Any): Any =
    OrderedKeyedVecSum.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("okvs")
      s"""
         |Object $tmp = graft.expressions.OrderedKeyedVecSum.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedKeyedVecSum =
    copy(child = newChild)
}

object OrderedKeyedVecSum {

  /** Sort by key, copy the first vector, add the rest elementwise in key
    * order. Returns an InternalRow (sum array, count); null only for an
    * empty array. Corrupt input (null key/vector/element — e.g. a
    * non-numeric id cast to null long) throws rather than dropping the
    * group's partial silently. */
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val keys = new Array[Long](n)
    val vecs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_ordered_keyed_vec_sum: null entry in keyed-vector array (corrupt upstream fold)")
      val st = arr.getStruct(i, 2)
      if (st.isNullAt(0))
        throw new IllegalArgumentException(
          "graft_ordered_keyed_vec_sum: null key — a non-numeric id cast to null long? " +
            "Route through a surrogate id (Ids.withSurrogateId) first")
      if (st.isNullAt(1))
        throw new IllegalArgumentException(
          "graft_ordered_keyed_vec_sum: null vector for key " + st.getLong(0))
      keys(i) = st.getLong(0)
      vecs(i) = st.getArray(1)
      i += 1
    }
    val idx = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Long.compare(keys(x.intValue()), keys(y.intValue())))
    val first = vecs(idx(0).intValue())
    val dim = first.numElements()
    checkNoNullElements(first, keys(idx(0).intValue()))
    val s = first.toDoubleArray()
    var j = 1
    while (j < n) {
      val v = vecs(idx(j).intValue())
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"vector length mismatch: ${v.numElements()} vs $dim")
      checkNoNullElements(v, keys(idx(j).intValue()))
      var d = 0
      while (d < dim) { s(d) += v.getDouble(d); d += 1 }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(s),
      n.toLong)
  }

  /** The declared output has containsNull=false; reading a null element
    * via getDouble would silently yield 0 — refuse instead. */
  private def checkNoNullElements(v: ArrayData, key: Long): Unit = {
    var d = 0
    val dim = v.numElements()
    while (d < dim) {
      if (v.isNullAt(d))
        throw new IllegalArgumentException(
          s"graft_ordered_keyed_vec_sum: null vector element at index $d for key $key")
      d += 1
    }
  }

  /** Column API: deterministic keyed vector sum of (k: long,
    * v: array<double>) → struct(sum, count). */
  def orderedKeyedVecSum(kv: Column): Column =
    ColumnBridge.column(OrderedKeyedVecSum(ColumnBridge.expression(kv)))
}
