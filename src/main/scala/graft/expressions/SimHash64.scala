package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens: per bit, the sign of the
  * sum of +-1 votes from each token hash. Value-identical to the
  * higher-order-function formulation ([[graft.ops.Dedup.simhashHof]],
  * differential-tested) but the tokenize + hash + 64-bit vote loop runs as
  * one compiled pass per row instead of 64 interpreted array folds. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val edgeWs = Pattern.compile("^\\s+|\\s+$")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    // mirror TextAnalysis.tokens(lower(text)) EXACTLY: edge whitespace of
    // ALL kinds is stripped (regexp "^\s+|\s+$"), then split on \s+ —
    // limit -1 like Spark's split (no empties can remain after the trim,
    // but the contract stays aligned).
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val trimmed = edgeWs.matcher(lowered).replaceAll("")
    val votes = new Array[Int](64)
    if (trimmed.nonEmpty) {
      val toks = ws.split(trimmed, -1)
      var t = 0
      while (t < toks.length) {
        val h = XxHash64Function.hash(UTF8String.fromString(toks(t)), StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
        t += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(new SimHash64(ColumnBridge.expression(text)))
}
