package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for byte-pair-encoding tokenizer training/encoding
  * (Sennrich et al. 2016 — the published subword recipe every LLM data
  * pipeline runs some variant of).
  *
  * Conventions (shared with the DuckDB oracle, which replays training
  * round-for-round):
  *  - a word symbolizes to its Unicode CODE POINTS (not UTF-16 units —
  *    DuckDB splits by code point, and a surrogate half is not a token)
  *    followed by the end-of-word marker `</w>`;
  *  - one merge step rewrites the symbol list GREEDILY LEFT TO RIGHT:
  *    scan once, fuse the first eligible (left, right) adjacency, skip
  *    past it, continue — so "aaaa" under (a,a) becomes [aa, aa], never
  *    [a, aa, a];
  *  - encoding applies the learned merges in rank order, each as one
  *    greedy pass, so `encode(word, merges(1..k))` is bit-identical to
  *    the training state after k merges.
  *
  * All three expressions are pure projections (no shuffle, stream-legal)
  * and run inside whole-stage codegen via static `compute` calls.
  */
object BpeExpressions {

  val EndMarker = "</w>"
  private val EndMarkerU = UTF8String.fromString(EndMarker)

  /** Code-point symbols of `word` plus the end-of-word marker. */
  def symbols(word: UTF8String): ArrayData = {
    val s = word.toString
    val out = new java.util.ArrayList[Any](s.length + 1)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(UTF8String.fromString(s.substring(i, i + n)))
      i += n
    }
    out.add(EndMarkerU)
    new GenericArrayData(out.toArray)
  }

  /** One greedy left-to-right merge pass over a symbol array. */
  def mergeStep(arr: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(left) && arr.getUTF8String(i + 1).equals(right)) {
        out.add(UTF8String.concat(left, right))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Whole-vocabulary encode: symbolize, then apply every merge in rank
    * order as one greedy pass each — the hot path for tokenizing a
    * distinct-word histogram (O(|word| × |merges|) worst case, no
    * intermediate ArrayData allocations between passes). */
  def encode(word: UTF8String, lefts: Array[UTF8String], rights: Array[UTF8String]): ArrayData = {
    val s = word.toString
    var syms = new java.util.ArrayList[UTF8String](s.length + 1)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(UTF8String.fromString(s.substring(i, i + n)))
      i += n
    }
    syms.add(EndMarkerU)
    var m = 0
    while (m < lefts.length) {
      val a = lefts(m)
      val b = rights(m)
      val n = syms.size()
      val next = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        val cur = syms.get(j)
        if (j + 1 < n && cur.equals(a) && syms.get(j + 1).equals(b)) {
          next.add(UTF8String.concat(a, b))
          j += 2
        } else {
          next.add(cur)
          j += 1
        }
      }
      syms = next
      m += 1
    }
    val out = new Array[Any](syms.size())
    var k = 0
    while (k < out.length) { out(k) = syms.get(k); k += 1 }
    new GenericArrayData(out)
  }

  def bpeSymbols(word: Column): Column =
    ColumnBridge.column(BpeSymbols(ColumnBridge.expression(word)))

  def bpeMergeStep(syms: Column, left: String, right: String): Column =
    ColumnBridge.column(BpeMergeStep(ColumnBridge.expression(syms), left, right))

  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(word), merges))
}

/** `word → [codepoint…, '</w>']` — the BPE base alphabet. */
case class BpeSymbols(child: Expression) extends UnaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_symbols requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_symbols"
  override protected def nullSafeEval(a: Any): Any =
    BpeExpressions.symbols(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BpeExpressions.symbols($a);")
  override protected def withNewChildInternal(newChild: Expression): BpeSymbols =
    copy(child = newChild)
}

/** One greedy merge pass fusing every non-overlapping (left, right)
  * adjacency, leftmost first. */
case class BpeMergeStep(child: Expression, left: String, right: String)
    extends UnaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_merge_step requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_step"

  @transient private lazy val leftU = UTF8String.fromString(left)
  @transient private lazy val rightU = UTF8String.fromString(right)

  override protected def nullSafeEval(a: Any): Any =
    BpeExpressions.mergeStep(a.asInstanceOf[ArrayData], leftU, rightU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLeft", leftU, classOf[UTF8String].getName)
    val r = ctx.addReferenceObj("bpeRight", rightU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BpeExpressions.mergeStep($a, $l, $r);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMergeStep =
    copy(child = newChild)
}

/** Full BPE encode of one word under a learned merge list (rank order). */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val leftsU: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rightsU: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray

  override protected def nullSafeEval(a: Any): Any =
    BpeExpressions.encode(a.asInstanceOf[UTF8String], leftsU, rightsU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: classOf[Array[...]].getName is the JVM-internal "[L...;" form,
    // which is not valid Java SOURCE — codegen needs the []-suffixed type
    val utf8Arr = classOf[UTF8String].getName + "[]"
    val l = ctx.addReferenceObj("bpeLefts", leftsU, utf8Arr)
    val r = ctx.addReferenceObj("bpeRights", rightsU, utf8Arr)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BpeExpressions.encode($a, $l, $r);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}
