package graft

import org.apache.spark.sql.functions._

import graft.expressions.NfcNormalize.normalizeNfc

/** All non-ASCII is written as \u escapes: source-file normalization by
  * any tool would otherwise silently merge the composed/decomposed pairs
  * these tests exist to distinguish. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(normalizeNfc(col("t"))).as[String].head()

  test("decomposed sequences compose; composed and ASCII pass through") {
    assert(nfc("e\u0301clair") == "\u00e9clair")
    assert(nfc("\u00e9clair") == "\u00e9clair")
    assert(nfc("plain ascii") == "plain ascii")
    // Hangul conjoining jamo compose to the syllable block
    assert(nfc("\u1100\u1161") == "\uac00")
  }

  test("NFC preserves compatibility characters (it is not NFKC)") {
    assert(nfc("\ufb01n") == "\ufb01n") // fi ligature survives
    assert(nfc("\uff21") == "\uff21")   // full-width A survives
  }

  test("idempotent, null-safe, and dedup-relevant") {
    assert(nfc(nfc("e\u0301")) == nfc("e\u0301"))
    val n = Seq[String](null).toDF("t").select(normalizeNfc(col("t")).as("o"))
      .filter(col("o").isNull).count()
    assert(n == 1)
    // the motivating property: two renderings of the same word hash
    // identically only after normalization
    val hashes = Seq("caf\u00e9", "cafe\u0301").toDF("t")
      .select(md5(normalizeNfc(col("t")))).distinct().count()
    assert(hashes == 1)
  }
}
