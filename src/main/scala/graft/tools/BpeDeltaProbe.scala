package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: where does the delta-maintained BPE pair table beat the
  * full per-round re-aggregation? Early rounds merge frequent pairs that
  * touch most of the histogram (delta pays two sub-aggregations for one
  * saved full one); late rounds merge rare pairs touching a sliver. Run:
  * `sbt "runMain graft.tools.BpeDeltaProbe [sfDir] [numMerges]"`. */
object BpeDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nm = args.drop(1).headOption.map(_.toInt).getOrElse(96)
    val spark = graft.GraftSession.builder("32", "graft-bpe-delta-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    // salted variant: each word gains a per-doc numeric suffix, blowing
    // the distinct-word histogram up ~1000x — the regime where the full
    // per-round aggregation is a real shuffle and the delta's
    // changed-words sliver is the asymptote
    val salted = base.select(concat_ws(" ",
      transform(split(col("text"), "\\s+"),
        w => concat(w, lit("q"),
          pmod(hash(col("doc_id"), w), lit(1000)).cast("string")))).as("text"))
    for ((name, docs) <- Seq("natural" -> base, "salted" -> salted);
         delta <- Seq(false, true, false, true)) {
      val t0 = System.nanoTime()
      val (m, rounds) = graft.ops.BpeTrain.trainCounted(
        docs, "text", nm, maxBatch = 8, deltaPairs = delta)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name deltaPairs=$delta: $dt%.1fs, ${m.size} merges in $rounds rounds " +
        f"(${dt / rounds}%.2fs/round)")
      graft.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
