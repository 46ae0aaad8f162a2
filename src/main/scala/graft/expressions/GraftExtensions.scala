package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - config-time: `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (the standard extension-injection hook);
  *  - runtime: [[GraftFunctions.register]] on an existing session (useful
  *    in notebooks/tests where the session already exists).
  *
  * After either, SQL pipelines can call e.g.
  * `SELECT graft_dot(a, b)` / `graft_cosine(a, b)` on array<double>
  * columns directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage, "")

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot",
        "graft_dot(a, b) - sequential dot product of two array<double> columns."),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_cosine"),
      info(classOf[CosineSimilarity], "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two array<double> columns."),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("graft_scale"),
      info(classOf[ScaleArray], "graft_scale",
        "graft_scale(v, s) - elementwise scale of an array<double> column by a double."),
      (children: Seq[Expression]) => ScaleArray(children(0), children(1))),
    (FunctionIdentifier("graft_maxabs"),
      info(classOf[MaxAbs], "graft_maxabs",
        "graft_maxabs(v) - max absolute value of an array<double> column (int8 quantization scale)."),
      (children: Seq[Expression]) => MaxAbs(children(0))),
    (FunctionIdentifier("graft_int8_codes"),
      info(classOf[Int8Codes], "graft_int8_codes",
        "graft_int8_codes(v) - symmetric int8 quantization codes of an array<double> column, as array<double>."),
      (children: Seq[Expression]) => Int8Codes(children(0))),
    (FunctionIdentifier("graft_sig_agreement"),
      info(classOf[SignatureAgreement], "graft_sig_agreement",
        "graft_sig_agreement(a, b) - number of agreeing positions of two array<bigint> minhash signatures."),
      (children: Seq[Expression]) => SignatureAgreement(children(0), children(1))),
    (FunctionIdentifier("graft_poly_minhash"),
      info(classOf[PolyMinHashSignature], "graft_poly_minhash",
        "graft_poly_minhash(text, numPerms, k) - engine-independent md5 minhash signature over char k-shingles (numPerms and k must be integer literals)."),
      (children: Seq[Expression]) => {
        def lit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_poly_minhash $what must be an integer literal, got $other")
        }
        PolyMinHashSignature(children(0),
          lit(children(1), "numPerms"), lit(children(2), "k"))
      }),
    (FunctionIdentifier("graft_distinct_lines"),
      info(classOf[DistinctLines], "graft_distinct_lines",
        "graft_distinct_lines(text) - drop within-document repeats of non-blank lines (first occurrence wins, blanks survive)."),
      (children: Seq[Expression]) => DistinctLines(children(0))),
    (FunctionIdentifier("graft_nfc"),
      info(classOf[NfcNormalize], "graft_nfc",
        "graft_nfc(text) - Unicode NFC canonicalization (pre-hash normalization)."),
      (children: Seq[Expression]) => NfcNormalize(children(0))),
    (FunctionIdentifier("graft_word_grams"),
      info(classOf[WordGrams], "graft_word_grams",
        "graft_word_grams(text, n) - distinct lowercased word n-grams (n must be an integer literal)."),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_word_grams n must be an integer literal, got $other")
        }
        WordGrams(children(0), n)
      }),
    (FunctionIdentifier("graft_bpe_symbols"),
      info(classOf[BpeSymbols], "graft_bpe_symbols",
        "graft_bpe_symbols(word) - code-point symbols of a word plus the '</w>' end marker (BPE base alphabet)."),
      (children: Seq[Expression]) => BpeSymbols(children(0))),
    (FunctionIdentifier("graft_ordered_keyed_sum"),
      info(classOf[OrderedKeyedSum], "graft_ordered_keyed_sum",
        "graft_ordered_keyed_sum(kv) - deterministic sum of array<struct<k bigint, v double>>: sort by k, left-fold 0.0 + v."),
      (children: Seq[Expression]) => OrderedKeyedSum(children(0))),
    (FunctionIdentifier("graft_ordered_keyed_vec_sum"),
      info(classOf[OrderedKeyedVecSum], "graft_ordered_keyed_vec_sum",
        "graft_ordered_keyed_vec_sum(kv) - deterministic elementwise vector sum of array<struct<k bigint, v array<double>>>: sort by k, fold v0 + v1 + ...; returns struct(sum, count)."),
      (children: Seq[Expression]) => OrderedKeyedVecSum(children(0)))
  )

  /** Idempotently register the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, inf, builder) =>
      org.apache.spark.sql.graft.FunctionRegistryBridge
        .register(spark, id, inf, builder)
    }
}
