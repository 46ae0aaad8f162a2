package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen expression — the canonicalization step that belongs BEFORE any
  * hash-based operator: "é" as U+00E9 and as "e"+U+0301 render
  * identically but hash, shingle, and window differently, so
  * un-normalized corpora leak duplicates past every exact/minhash/span
  * dedup in the engine.
  *
  * NFC (not NFKC): canonical equivalence only — ligatures, full-width
  * forms, and compatibility characters are preserved, matching DuckDB's
  * `nfc_normalize`, which serves as the oracle. Both implementations
  * follow UAX #15, so results agree byte-for-byte.
  *
  * The `isNormalized` fast path makes the common case (ASCII / already
  * composed text, i.e. almost all real corpora) an allocation-free check.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc_normalize requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(a: Any): Any =
    NfcNormalize.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.NfcNormalize.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def normalizeNfc(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
