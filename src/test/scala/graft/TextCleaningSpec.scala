package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pipelines, TextCleaning}

/** TextCleaning operator specs: HTML stripping, entity-decode ordering,
  * PII redaction (including the year-range case the first PhonePat cut got
  * wrong), boilerplate removal, and the composition into Pipelines. */
class TextCleaningSpec extends SparkSpec {

  import spark.implicits._

  private def cleanOne(raw: String): String = {
    val df = Seq((0L, raw)).toDF("doc_id", "text")
    TextCleaning.clean(df, "text").head().getAs[String]("clean_text")
  }

  private def applyCol(raw: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(raw).toDF("t").select(f(col("t")).as("r")).head().getString(0)

  test("stripTags drops script/style with content, then remaining tags") {
    val out = applyCol(
      "<p>keep</p><script type='x'>var a = 1;</script><style>.c{}</style><b>bold</b>",
      c => TextCleaning.normalizeWhitespace(TextCleaning.stripTags(c)))
    assert(out == "keep bold")
    // case-insensitive + newline-spanning script body
    val out2 = applyCol("<SCRIPT>\nmultiline()\n</SCRIPT>ok",
      c => TextCleaning.normalizeWhitespace(TextCleaning.stripTags(c)))
    assert(out2 == "ok")
  }

  test("decodeEntities: ampersand last, so &amp;lt; decodes to the literal &lt;") {
    assert(applyCol("&amp;lt;tag&gt;", TextCleaning.decodeEntities) == "&lt;tag>")
    assert(applyCol("a &lt; b &amp;&amp; c &gt; d", TextCleaning.decodeEntities)
      == "a < b && c > d")
    assert(applyCol("&quot;x&quot; &#39;y&apos; &nbsp;", TextCleaning.decodeEntities)
      == "\"x\" 'y'  ")
  }

  test("phone redaction: 9+ digit numbers go, 8-digit year ranges stay") {
    // the scaladoc contract the first {6,14}-inner-chars pattern violated
    assert(applyCol("seasons 2020-2024 continued", TextCleaning.redactPhones(_))
      == "seasons 2020-2024 continued")
    assert(applyCol("call 555-123-4567 now", TextCleaning.redactPhones(_))
      == "call <PHONE> now")
    // the optional + and the ") " double separator are both consumed
    assert(applyCol("intl +1 (555) 123-4567 ok", TextCleaning.redactPhones(_))
      == "intl <PHONE> ok")
    // 8 digits unseparated: below the 9-digit floor, stays
    assert(applyCol("order 20201224 shipped", TextCleaning.redactPhones(_))
      == "order 20201224 shipped")
  }

  test("email and IP redaction, and the email-first composition order") {
    assert(applyCol("mail bob.smith+tag@example.co.uk please", TextCleaning.redactEmails(_))
      == "mail <EMAIL> please")
    assert(applyCol("host 10.0.0.1 up", TextCleaning.redactIpv4(_)) == "host <IP> up")
    val all = applyCol("bob@example.com or 555-123-4567 at 10.0.0.1", TextCleaning.redactPii)
    assert(all == "<EMAIL> or <PHONE> at <IP>")
  }

  test("piiCounts counts each kind") {
    val r = Seq("a@b.co and c@d.org, call 555-123-4567, ping 10.0.0.1")
      .toDF("t").select(TextCleaning.piiCounts(col("t")).as("p"))
      .select("p.emails", "p.phones", "p.ipv4").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }

  test("9+-digit IPv4 is labeled <IP>, not <PHONE>, and never double-counted") {
    // 192.168.100.200 has 10 digits with '.' separators — inside
    // PhonePat's grammar, so IP must redact first (review finding)
    assert(applyCol("server 192.168.100.200 down", TextCleaning.redactPii)
      == "server <IP> down")
    val r = Seq("call 555-123-4567 at 192.168.100.200")
      .toDF("t").select(TextCleaning.piiCounts(col("t")).as("p"))
      .select("p.emails", "p.phones", "p.ipv4").head()
    // sequenced counts: the IP span is not ALSO counted as a phone
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((0, 1, 1)))
  }

  test("removeBoilerplate drops blank + chrome lines; fraction reports them") {
    val doc = "Real content here\n\n  Privacy Policy  \nSubscribe to our newsletter\nMore content"
    val kept = applyCol(doc, c => TextCleaning.removeBoilerplate(c))
    assert(kept == "Real content here\nMore content")
    val frac = Seq(doc).toDF("t")
      .select(TextCleaning.boilerplateLineFraction(col("t")).as("f")).head().getDouble(0)
    assertNear(frac, 3.0 / 5.0, 1e-12)
  }

  test("clean composition: tags -> entities -> boilerplate -> PII -> whitespace") {
    val cleaned = cleanOne(
      "<div>Call 555-123-4567</div>\nCopyright 2024 All rights reserved\nrange 2020-2024 &amp;lt;x&gt; ok")
    assert(cleaned == "Call <PHONE> range 2020-2024 &lt;x> ok")
    // entities decoded before boilerplate matching, tags stripped first
    assert(!cleaned.contains("Copyright"))
  }

  test("null text degrades to null output, pipeline drops it without crashing") {
    val df = Seq((0L, Option("x <b>y</b> z of the day")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = TextCleaning.clean(df, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "x y z of the day")
    assert(out(1).getAs[String]("clean_text") == null)
    // cleanCorpus: the null-text row is unrankable by the quality gate
    // (null comparison) and silently drops; no NPE anywhere in the chain
    val kept = Pipelines.cleanCorpus(df, "text", "doc_id",
      nearDupThreshold = 0.99, minQuality = 0.0).df
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L))
  }

  test("Pipelines htmlClean stage: markup-only variants collapse to exact dups") {
    val docs = Seq(
      (0L, "<p>hello  world of spark</p>"),
      (1L, "hello world   of <b>spark</b>"), // same text modulo markup/ws
      (2L, "completely different content")
    ).toDF("doc_id", "text")
    val out = Pipelines.cleanCorpus(docs, "text", "doc_id",
      nearDupThreshold = 0.99, minQuality = 0.0, htmlClean = true).df
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 2L), s"markup variants must dedup, got $kept")
    // cleaned text replaces the column; pii audit column is appended
    assert(out.columns.contains("text_pii"))
    val text0 = out.filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(text0 == "hello world of spark")
  }
}
