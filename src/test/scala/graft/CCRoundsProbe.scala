package graft

import org.apache.spark.sql.functions._

/** Round-count pins for the star-contraction connected-components loop:
  * the O(log² n) bound must hold on exactly the shapes that defeat
  * min-label flooding (whose rounds are eccentricity-bound). */
class CCRoundsProbe extends SparkSpec {
  import spark.implicits._

  test("star contraction converges in logarithmic rounds on chain shapes") {
    var rounds = 0
    graft.ops.Graphs.ccRoundProbe = i => { rounds = i + 1 }
    try {
      // a 200-node path: flooding needs ~ecc = 199 relax hops (the old
      // pointer-jump variant measured ~11 from a fresh start and ONE
      // hop per round on refloods); star contraction must stay ~log²
      val path = (1L until 200L).map(i => (i, i + 1)).toDF("s", "d")
      val cc = graft.ops.Graphs.connectedComponents(path, "s", "d")
      assert(cc.filter(col("component") =!= 1L).count() == 0L)
      assert(cc.count() == 200L)
      assert(rounds <= 10, s"path-200 took $rounds star rounds (want <= 10)")

      // the q226 production shape: sf0.001 fuzzy-name chains (the
      // same pair derivation as the query) — a handful of rounds, not
      // the eccentricity of the longest name chain
      rounds = 0
      val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select(col("c_nationkey").as("nationkey"), col("c_custkey"), col("c_name"))
      val pairs = graft.ops.Joins.editDistanceSelfJoin(c, Seq("nationkey"),
        "c_custkey", "c_name", maxDist = 1)
      graft.ops.Graphs.connectedComponents(pairs, "id_a", "id_b").count()
      assert(rounds <= 8, s"fuzzy graph took $rounds star rounds (want <= 8)")
    } finally graft.ops.Graphs.ccRoundProbe = _ => ()
  }
}
