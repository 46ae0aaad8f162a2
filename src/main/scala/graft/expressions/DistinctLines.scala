package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WITHIN-document line dedup: drop every repeat of an already-seen
  * non-blank line, preserving order and blank lines — the map-side
  * complement of the CORPUS-level frequent-line dedup
  * ([[graft.ops.Dedup.dropFrequentLines]]): that one removes boilerplate
  * shared across documents (needs a corpus aggregate); this one removes a
  * document's internal repetition (navigation chrome repeated per
  * section, copy-paste loops — the within-doc half of the published
  * repetition-removal recipes) and is a pure projection: no shuffle, no
  * state, stream-legal.
  *
  * Conventions: lines split on '\n' exactly (no trimming — two lines
  * differing in whitespace are different lines); blank lines always
  * survive (they are paragraph structure, not content); first occurrence
  * wins; a trailing newline therefore survives as its blank tail. Output
  * joins with '\n'. One pass, O(lines) hashing per document.
  */
case class DistinctLines(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_distinct_lines requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_distinct_lines"

  override protected def nullSafeEval(a: Any): Any =
    DistinctLines.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.DistinctLines.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): DistinctLines =
    copy(child = newChild)
}

object DistinctLines {

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (s.indexOf('\n') < 0) return text // single line: nothing to dedup
    val lines = s.split("\n", -1) // -1 keeps trailing empty segments
    val seen = new java.util.HashSet[String]()
    val out = new java.lang.StringBuilder(s.length)
    var first = true
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.isEmpty || seen.add(line)) {
        if (!first) out.append('\n')
        out.append(line)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  def distinctLines(text: Column): Column =
    ColumnBridge.column(DistinctLines(ColumnBridge.expression(text)))
}
