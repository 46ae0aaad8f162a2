package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, GroupTopK, Ids}

/** Specs for the surrogate-id on-ramp ([[graft.ops.Ids]]): determinism
  * across recomputes/partitionings, order-compatibility with the string
  * keys, and the full string-keyed dedup + top-k chain. */
class IdsSpec extends SparkSpec {

  import spark.implicits._

  def docs = Seq(
    ("u-cc", "gamma text", "a", 10),
    ("u-aa", "alpha text", "a", 30),
    ("u-bb", "alpha text", "a", 20), // exact dup of u-aa (same text)
    ("u-dd", "delta text", "b", 40),
    ("u-ee", "epsilon text", "b", 40) // score tie with u-dd
  ).toDF("uid", "text", "source", "n_chars")

  test("surrogate is the 0-based sorted rank, stable across recomputes and partitionings") {
    val m1 = Ids.surrogateMapping(docs, "uid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m1 == Map("u-aa" -> 0L, "u-bb" -> 1L, "u-cc" -> 2L, "u-dd" -> 3L, "u-ee" -> 4L))
    // rank is a pure function of the id set: any partitioning, same bits
    val m2 = Ids.surrogateMapping(docs.repartition(7), "uid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m2 == m1)
    // duplicate key rows map to the SAME surrogate (mapping is distinct)
    val m3 = Ids.surrogateMapping(docs.unionAll(docs), "uid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m3 == m1)
  }

  test("withSurrogateId + restoreId round-trips; null ids refuse loudly") {
    val sr = Ids.withSurrogateId(docs, "uid")
    assert(sr.df.count() == 5)
    // min-surrogate ≡ min-uid (order-compatibility)
    val restored = Ids.restoreId(sr.df.drop("uid"), sr.mapping)
      .select("uid").collect().map(_.getString(0)).sorted
    assert(restored.toSeq == Seq("u-aa", "u-bb", "u-cc", "u-dd", "u-ee"))

    val withNull = docs.unionAll(
      Seq((null.asInstanceOf[String], "x", "a", 1)).toDF("uid", "text", "source", "n_chars"))
    val e = intercept[Exception] { Ids.surrogateMapping(withNull, "uid").collect() }
    assert(e.getMessage.contains("must be non-null"))
  }

  test("string-keyed dedup + grouped top-k chain via the surrogate") {
    // GroupTopK alone refuses the string key...
    val e = intercept[Exception] {
      GroupTopK.topKPerGroup(docs, Seq("source"), "uid", "n_chars", k = 2).collect()
    }
    assert(e.getMessage.contains("Ids.withSurrogateId"))
    // ...and the on-ramp makes the whole chain work in key semantics:
    val sr = Ids.withSurrogateId(docs, "uid")
    val deduped = Dedup.dropExactDups(sr.df, "text", "sid")
    val top = GroupTopK.topKPerGroup(deduped, Seq("source"), "sid", "n_chars", k = 2)
    val out = Ids.restoreId(top, sr.mapping)
      .select("source", "rank", "uid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // dedup keeps u-aa (min key of the alpha-text class); source a top-2 by
    // n_chars = (u-aa 30, u-cc 10); source b tie at 40 breaks toward u-dd
    assert(out == Set(
      ("a", 1L, "u-aa"), ("a", 2L, "u-cc"),
      ("b", 1L, "u-dd"), ("b", 2L, "u-ee")))
  }
}
