package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: batched-BPE rounds vs merges on the real testdata corpus —
  * how hard the batch prefix rule engages on natural text (the
  * merges/round ratio the 32k-vocab asymptote depends on). */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val nm = if (args.length > 1) args(1).toInt else 96
    val spark = graft.GraftSession.builder("8", "bpe-batch-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (exact <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val (merges, rounds) = graft.ops.BpeTrain.trainCounted(
        docs, "text", nm, exactGreedy = exact)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"bpe probe (exact=$exact): ${merges.size} merges in $rounds " +
        f"rounds (${merges.size.toDouble / rounds}%.2f merges/round), $dt%.1fs")
    }
    spark.stop()
  }
}
