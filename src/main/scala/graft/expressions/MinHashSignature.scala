package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: canonicalize -> distinct k-shingles ->
  * `numHashes` affine min-hashes, all in ONE compiled per-row loop.
  *
  * Value-identical to the higher-order-function formulation in
  * [[graft.ops.Dedup.minhashSignatureHof]] (same canonicalization as
  * `lower`/`regexp_replace`, same `xxhash64` seed 42, same
  * `(a_j*h + b_j) mod (2^31-1)` permutations — differential-tested), but
  * evaluated as straight JVM code instead of per-element interpreted
  * lambda trees: the shingle array, hash array, and 64 intermediate
  * accumulator arrays never materialize. CodegenFallback is deliberate —
  * one virtual call per row into a tight loop beats generated code that
  * would still interpret HOF lambdas. */
case class MinHashSignature(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  private val P = 2147483647L // 2^31 - 1
  @transient private lazy val ws = Pattern.compile("\\s+")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    // mirror TextAnalysis.canonicalize exactly: lower, collapse \s+ runs
    // to ' ', then Spark trim (strips ' ' — after the collapse every edge
    // whitespace IS a space)
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val collapsed = ws.matcher(lowered).replaceAll(" ")
    var st = 0
    var en = collapsed.length
    while (st < en && collapsed.charAt(st) == ' ') st += 1
    while (en > st && collapsed.charAt(en - 1) == ' ') en -= 1
    val canon = collapsed.substring(st, en)

    val shingles = new java.util.HashSet[String]()
    if (canon.length < k) shingles.add(canon)
    else {
      var i = 0
      while (i <= canon.length - k) { shingles.add(canon.substring(i, i + k)); i += 1 }
    }

    val sig = Array.fill(numHashes)(P)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sh = it.next()
      val raw = XxHash64Function.hash(UTF8String.fromString(sh), StringType, 42L)
      val h = { val m = raw % P; if (m < 0) m + P else m }
      var j = 0
      while (j < numHashes) {
        // h < 2^31 and the multiplier is tiny: no overflow, % == pmod
        val v = (h * (2L * j + 1L) + 7919L * (j + 1L)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(text: Column, numHashes: Int, k: Int): Column =
    ColumnBridge.column(new MinHashSignature(ColumnBridge.expression(text), numHashes, k))
}
