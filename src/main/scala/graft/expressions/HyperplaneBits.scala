package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused hyperplane-LSH bucket key: sign bits of the vector against
  * `planes.size` +-1 hyperplanes, accumulated in ONE pass over the vector
  * (per element, all plane sums advance) instead of nBits independent
  * full-vector dot products. Per-plane accumulation order matches the
  * composed [[DotProduct]] formulation element-for-element, so bucket keys
  * are identical (differential-tested). */
case class HyperplaneBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback with Serializable {

  require(planes.nonEmpty && planes.size <= 63, "1..63 planes")
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bits requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nBits = planeArr.length
    val sums = new Array[Double](nBits)
    var i = 0
    val n = v.numElements()
    while (i < n) {
      val x = v.getDouble(i)
      var b = 0
      while (b < nBits) {
        val p = planeArr(b)
        if (i < p.length) sums(b) += x * p(i)
        b += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      // Spark orders NaN above all doubles, so the composed when(dot >= 0)
      // sets the bit for NaN sums; mirror that (Java NaN >= 0 is false)
      if (sums(b) >= 0 || java.lang.Double.isNaN(sums(b))) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

object HyperplaneBits {
  def apply(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(new HyperplaneBits(
      ColumnBridge.expression(vec.cast("array<double>")), planes))
}
