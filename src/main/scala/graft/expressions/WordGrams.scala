package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of lowercased text in ONE pass — the native
  * replacement for the HOF chain
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i+1, n))))`, which evaluates interpreted per element and
  * whose `array_distinct` is O(tokens²) string comparisons per document
  * (measured: ~9s just to trigram 5k real documents — the single hottest
  * spot in the set-similarity operators).
  *
  * Semantics mirror the HOF formulation exactly (differential-tested):
  * Spark `lower` (UTF8String.toLowerCase), Java-regex `\s` edge trim and
  * `\s+` splitting, one short gram for documents with fewer than n
  * tokens, empty array for empty/whitespace-only text, first-occurrence
  * dedup order.
  */
case class WordGrams(child: Expression, n: Int, lowercase: Boolean = true,
    distinct: Boolean = true)
    extends UnaryExpression with Serializable {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_grams requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(a: Any): Any =
    WordGrams.compute(a.asInstanceOf[UTF8String], n, lowercase, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WordGrams.compute($a, $n, $lowercase, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {

  // exactly Java regex \s — NOT Character.isWhitespace (U+001C-1F differ)
  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, lowercase: Boolean): ArrayData =
    compute(text, n, lowercase, distinct = true)

  def compute(text: UTF8String, n: Int, lowercase: Boolean, distinct: Boolean): ArrayData = {
    val s = (if (lowercase) text.toLowerCase else text).toString
    var st = 0
    var en = s.length
    while (st < en && isJavaWs(s.charAt(st))) st += 1
    while (en > st && isJavaWs(s.charAt(en - 1))) en -= 1
    if (st == en) return new GenericArrayData(Array.empty[Any])

    // split on \s+ runs within [st, en)
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = st
    var tokStart = st
    while (i < en) {
      if (isJavaWs(s.charAt(i))) {
        if (i > tokStart) toks += s.substring(tokStart, i)
        while (i < en && isJavaWs(s.charAt(i))) i += 1
        tokStart = i
      } else i += 1
    }
    if (en > tokStart) toks += s.substring(tokStart, en)

    val grams = scala.collection.mutable.ArrayBuffer.empty[String]
    if (n == 1) {
      var j = 0
      while (j < toks.length) { grams += toks(j); j += 1 }
    } else {
      // i in 0..max(len-n, 0); documents shorter than n yield one short gram
      val last = math.max(toks.length - n, 0)
      var j = 0
      while (j <= last) {
        val sb = new java.lang.StringBuilder
        var k = j
        val end = math.min(j + n, toks.length)
        while (k < end) {
          if (k > j) sb.append(' ')
          sb.append(toks(k))
          k += 1
        }
        grams += sb.toString
        j += 1
      }
    }
    if (distinct) {
      val out = new java.util.LinkedHashSet[String]()
      grams.foreach(out.add)
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(arr)
    } else {
      val arr = new Array[Any](grams.length)
      var j = 0
      while (j < grams.length) { arr(j) = UTF8String.fromString(grams(j)); j += 1 }
      new GenericArrayData(arr)
    }
  }

  def wordGrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n))

  /** Case-preserving distinct tokens (n=1, no lowercasing) — the native
    * backing for [[graft.ops.TextAnalysis.distinctTokenCount]]. */
  def distinctTokens(text: Column): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), 1, lowercase = false))

  /** Case-preserving word n-grams WITH multiplicity (document order, no
    * dedup) — the feature extractor for count-based models
    * ([[graft.ops.Dsir]]). Same tokenization/short-document semantics as
    * the distinct variant. */
  def wordGramsMulti(text: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n,
      lowercase = false, distinct = false))

  /** Lowercased word n-grams WITH multiplicity in document order — the
    * positioned-window form: element i is the window starting at token i,
    * so `posexplode` recovers exact token offsets
    * ([[graft.ops.Dedup.repeatedSpanRemovals]]). */
  def wordGramsMultiLower(text: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n,
      lowercase = true, distinct = false))
}
