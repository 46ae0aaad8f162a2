package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of an (already canonicalized) string in ONE
  * pass — the native replacement for the nested HOF formulation, whose
  * inner lambda re-evaluates the canonical form per shingle position and
  * whose outer lambda re-evaluates the ENTIRE shingle transform per
  * window position: O(len³) with a regex in the hot loop. Here:
  * character k-shingles hashed with Spark's own XXH64 (seed 42 — the
  * `xxhash64` function's constant, so values are bit-identical to the
  * HOF formulation, which stays as the differential oracle), minimum per
  * sliding window of `w` shingles, deduplicated in first-occurrence
  * order. O(len·k + shingles·w) per document.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1, "shingle size k must be >= 1")
  require(w >= 1, "window size w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnowing requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowing"

  override protected def nullSafeEval(a: Any): Any =
    WinnowingFingerprints.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WinnowingFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

object WinnowingFingerprints {

  /** Static entry point shared by interpreted eval and generated code.
    * Mirrors the HOF formulation exactly: shingle i = chars [i, i+k)
    * (clamped at the end — sub-k texts yield one short shingle), XXH64
    * seed 42 over the shingle's UTF-8 bytes, window j = min of shingle
    * hashes [j, j+w) (clamped), first-occurrence dedup. */
  def compute(canon: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = canon.numChars()
    val nShingles = math.max(nChars - k, 0) + 1
    val hashes = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val sub = canon.substring(i, i + k)
      hashes(i) = XXH64.hashUnsafeBytes(
        sub.getBaseObject, sub.getBaseOffset, sub.numBytes, 42L)
      i += 1
    }
    val nWindows = math.max(nShingles - w, 0) + 1
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWindows) {
      var m = Long.MaxValue
      var t = j
      val end = math.min(j + w, nShingles)
      while (t < end) { if (hashes(t) < m) m = hashes(t); t += 1 }
      out.add(m)
      j += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(arr)
  }

  def winnowing(canon: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowingFingerprints(ColumnBridge.expression(canon), k, w))
}
