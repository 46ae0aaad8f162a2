package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for q73 phases (dev-only). */
object Q73Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32", "q73-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.1", "documents")
      .filter(col("doc_id") < 1000)
    (1 to 3).foreach { run =>
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.polyMinhashNearDupPairs(docs, "text", "doc_id", threshold = 0.9)
      val np = pairs.count()
      val t1 = System.nanoTime()
      var last = t1
      graft.ops.Dedup.roundProbe = i => {
        val now = System.nanoTime()
        println(f"[q73]   round $i starts at +${(now - last) / 1e9}%.2fs")
        last = now
      }
      val nc = graft.ops.Dedup.dupClusters(pairs).count()
      val t2 = System.nanoTime()
      println(f"[q73] run $run: pairs ${(t1 - t0) / 1e9}%.2fs ($np), clusters ${(t2 - t1) / 1e9}%.2fs ($nc)")
      graft.ops.Dedup.roundProbe = _ => ()
      graft.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
