package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: bench-style min-of-3 timing for one query (dev-only). */
object ClfProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q165_classifier_train"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("32", "clf-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(s"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}s (rows=$n)")
      graft.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
