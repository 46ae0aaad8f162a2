package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 24-dim vectors in 3 well-separated clusters, slight per-row jitter
  private def mkEmb(n: Int) = (0 until n).map { i =>
    val blob = i % 3
    (i.toLong, Seq.tabulate(24) { d =>
      (if ((d / 8) == blob) 5.0 else 0.0) + 0.01 * ((i * 7 + d) % 5)
    })
  }.toDF("vec_id", "embedding")

  test("pq encode: codes bounded by k, deterministic, shuffle-free projection") {
    val emb = mkEmb(90)
    val cbs = Similarity.trainPqCodebooks(
      emb, "vec_id", "embedding", dim = 24, m = 3, k = 4, iters = 3)
    assert(cbs.size == 3 && cbs.forall(_.size == 4))
    val enc = Similarity.pqEncode(emb, "embedding", cbs)
    val codes = enc.select("pq_codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.size == 3 && c.forall(x => x >= 0 && x < 4)))
    // pure projection after training: no exchange in the encode plan
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
    // bit-deterministic under repartition
    val enc2 = Similarity.pqEncode(emb.repartition(7), "embedding", cbs)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    val enc1 = enc.select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    assert(enc1 == enc2)
  }

  test("pq ADC search finds same-cluster neighbors first") {
    val emb = mkEmb(90)
    val cbs = Similarity.trainPqCodebooks(
      emb, "vec_id", "embedding", dim = 24, m = 3, k = 4, iters = 3)
    val codes = Similarity.pqEncode(emb, "embedding", cbs)
    val top = Similarity.pqTopK(codes, emb.filter(col("vec_id") < 3), cbs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // every returned neighbor of anchor i shares its cluster (i % 3)
    assert(top.nonEmpty)
    assert(top.forall { case (q, n, _) => q % 3 == n % 3 })
    // k results per query, ranks 1..5
    val byQ = top.groupBy(_._1)
    assert(byQ.values.forall(g => g.map(_._3).sorted.toSeq == (1L to 5L)))
  }

  test("ivf-pq: probed-cell search agrees with full ADC on covered candidates") {
    val emb = mkEmb(90)
    val coarse = Similarity.trainKmeansPortable(emb, "vec_id", "embedding", k = 3, iters = 3)
    val cbs = Similarity.trainPqCodebooks(
      emb, "vec_id", "embedding", dim = 24, m = 3, k = 4, iters = 3)
    val codes = Similarity.pqEncode(emb, "embedding", cbs)
    val full = Similarity.pqTopK(codes, emb.filter(col("vec_id") < 3), cbs, k = 90)
      .select("query_id", "vec_id", "adist_r")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 3), coarse, cbs,
      k = 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // every ivf-pq distance equals the full ADC distance for that pair
    assert(ivf.forall { case (q, n, d) => full((q, n)) == d })
    // with 3 tight blobs and nProbe=1, neighbors stay in the query's blob
    assert(ivf.forall { case (q, n, _) => q % 3 == n % 3 })
  }

  test("pq training rejects a dimension that does not split into m") {
    val emb = mkEmb(10)
    intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooks(emb, "vec_id", "embedding", dim = 24, m = 5, k = 2, iters = 1)
    }
  }
}
