package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // pandas/NumPy-compatible arithmetic (x/0 -> null, no overflow errors)
      .config("spark.sql.ansi.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS): read as long nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timed region: JVM/codegen/parquet-footer costs are
    // one-time, not per-query; run one representative query untimed.
    try { SparkEntry.queries.head._2(spark, sfDir).count() }
    catch { case _: Throwable => () }
    // Each query runs `iters` times and reports the MIN: the first
    // iteration of the alphabetically-first query per table otherwise
    // absorbs residual codegen/footer warmup, and min-of-3 damps the
    // machine-contention noise that inflated round 3's total by 31% with
    // zero plan changes (±10% run-to-run stability is the target).
    val iters = scala.util.Try(sys.env("SPARK_GRAFT_BENCH_ITERS").trim.toInt)
      .toOption.getOrElse(3).max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).iterator.map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          // a crashing query must not masquerade as a fast success
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      }.takeWhile(_ >= 0.0).toSeq // don't re-run a failing query
      name -> (if (times.size < iters) -1.0 else times.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
