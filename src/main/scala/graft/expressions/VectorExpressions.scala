package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is semantically identical but evaluates OUTSIDE whole-stage codegen —
  * higher-order functions interpret their lambda per element and allocate
  * intermediate arrays. For 100 TB of embeddings the dot product is the
  * innermost loop of every similarity operator, so it gets a real
  * `BinaryExpression` with `doGenCode`: a tight primitive `for` loop over
  * `ArrayData`, fully fused into the surrounding generated code.
  *
  * Summation order is element order, matching both the HOF formulation and
  * the DuckDB oracle's `list_dot_product`, so results stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  // AbstractDataType (and therefore ImplicitCastInputTypes) is
  // private[sql]; inputs are validated here and cast by the public
  // wrapper [[VectorExpressions.dot]] instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // can return null on length mismatch / null elements EVEN when both
  // children are non-nullable; without this override codegen declares
  // ev.isNull as the `false` literal and `ev.isNull = true` fails to
  // compile (silent interpreter fallback on e.g. collect_list inputs)
  override def nullable: Boolean = true

  // Mismatched lengths and null elements yield NULL — identical to the
  // zip_with/aggregate formulation (zip_with pads the shorter array with
  // nulls; null arithmetic is null), so the HOF oracle really is an oracle.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** One-pass cosine similarity: dot, |a|^2 and |b|^2 accumulate in a single
  * element loop, then `dot / (sqrt(aa) * sqrt(bb))` — the same combining
  * formula (and therefore the same bits) as composing three [[DotProduct]]
  * calls, with one array traversal instead of three. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // see DotProduct.nullable: null is reachable from non-nullable children
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd elementwise scale `arr · s` — `transform(arr, x => x * s)`
  * without the per-element interpreted lambda (the classifier trainer's
  * per-doc gradient vector `(p−y)·f` runs this nDocs × dim times per
  * iteration; measured: the HOF transform dominated training wall-clock
  * the moment the margin join was removed). Null elements and a null
  * scalar yield a null result (mirrors null arithmetic through the HOF). */
case class ScaleArray(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_scale requires (array<double>, double), got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_scale"
  // null on null elements even from non-nullable children (see DotProduct)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val s = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      out(i) = x.getDouble(i) * s
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = $a.getDouble($i) * $b;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaleArray =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product of two numeric-array columns (cast to
    * array<double> here, so float embeddings work directly). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Codegen'd elementwise scale (see [[ScaleArray]]). */
  def scale(a: Column, s: Column): Column =
    ColumnBridge.column(ScaleArray(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(s.cast("double"))))

  /** One-pass codegen'd cosine similarity (see [[CosineSimilarity]]). */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
