package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram language model —
  * the per-word kernel of [[graft.ops.UnigramTrain]] (SentencePiece-
  * style hard-EM, Kudo 2018). Native for the [[BpeEncodeWord]] reason:
  * the per-word DP is inherently imperative, and a HOF formulation
  * would re-scan the piece table per position per element.
  *
  * ENGINE-PORTABILITY CONTRACT (the DuckDB oracle replays this DP
  * table-for-table): `best(0) = 0`, `best(i) = max over piece lengths
  * l = 1..min(maxPieceLen, i)` of `best(i−l) + lnScore(piece)` where
  * the piece is the exact substring; ties prefer the SMALLEST l
  * (strict `>` while iterating l ascending ≡ SQL `ORDER BY cand DESC,
  * l ASC`); every lnScore is `ln(count) − ln(total)` of exact integers
  * (ln agrees cross-engine to the last ulp where exp/pow do not — the
  * q84/q237 discipline), and each `best` value is ONE addition of two
  * identically-derived doubles, so the argmax chain is bit-identical.
  *
  * A position with no in-vocabulary piece (an out-of-corpus character
  * at ENCODE time — training corpora are covered by construction)
  * falls back to the single character at a large deterministic penalty
  * so encoding is total. */
case class UnigramViterbi(
    child: Expression,
    pieces: Seq[(String, Double)],
    maxPieceLen: Int
) extends UnaryExpression with Serializable {

  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_viterbi requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_viterbi"

  @transient private lazy val scoreMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Double.valueOf(s)) }
    m
  }

  override protected def nullSafeEval(a: Any): Any =
    UnigramExpressions.viterbi(a.asInstanceOf[UTF8String], scoreMap, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramScores", scoreMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.UnigramExpressions.viterbi($a, $m, $maxPieceLen);")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramExpressions {

  /** Deterministic out-of-vocabulary single-character penalty: far below
    * any real ln-probability, identical across engines (a plain
    * literal, no transcendental). */
  val OovPenalty: Double = -1.0e9

  /** Static DP shared by interpreted eval and generated code. */
  def viterbi(
      word: UTF8String,
      scores: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int
  ): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      back(i) = 0
      var l = 1
      val lmax = math.min(maxPieceLen, i)
      while (l <= lmax) {
        val sc = scores.get(s.substring(i - l, i))
        if (sc != null && best(i - l) != Double.NegativeInfinity) {
          val cand = best(i - l) + sc.doubleValue()
          // strict >: the SMALLEST l wins ties (the oracle's
          // ORDER BY cand DESC, l ASC)
          if (cand > best(i)) { best(i) = cand; back(i) = l }
        }
        l += 1
      }
      if (back(i) == 0) {
        // uncovered position: single-char OOV fallback keeps encode total
        best(i) = best(i - 1) + OovPenalty
        back(i) = 1
      }
      i += 1
    }
    // backtrack: piece count <= n
    val rev = new java.util.ArrayList[UTF8String](8)
    var p = n
    while (p > 0) {
      val l = back(p)
      rev.add(UTF8String.fromString(s.substring(p - l, p)))
      p -= l
    }
    val out = new Array[Any](rev.size())
    var k = 0
    while (k < out.length) { out(k) = rev.get(rev.size() - 1 - k); k += 1 }
    new GenericArrayData(out)
  }

  def unigramViterbi(word: Column, pieces: Seq[(String, Double)], maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramViterbi(ColumnBridge.expression(word), pieces, maxPieceLen))
}
