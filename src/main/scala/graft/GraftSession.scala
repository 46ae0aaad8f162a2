package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession recipe for every graft entry point (Bench, Verify,
  * graft.tools.*, examples). The semantics knobs below change query results,
  * not just performance — a query that reproduces under one harness must
  * behave identically under the others, so no entry point may hand-roll its
  * own subset (round 6: RunOne pinned UTC while other tools did not, and a
  * timezone-sensitive failure reproduced only in some harnesses).
  *
  * Callers append their own perf-only configs (AQE knobs, rank thresholds)
  * on the returned builder.
  */
object GraftSession {

  /** `cores` feeds both `local[n]` and `spark.sql.shuffle.partitions`:
    * partitions sized to the actual parallelism, not the 200 default. */
  def builder(cores: String, appName: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      // every epoch extraction from a TIMESTAMP_NTZ wall clock (Tables.table)
      // reinterprets it in the session zone — pin it so results are
      // machine-independent
      .config("spark.sql.session.timeZone", "UTC")
      // pandas/NumPy-compatible arithmetic (x/0 -> null, no overflow errors)
      .config("spark.sql.ansi.enabled", "false")
      // accept TIMESTAMP(NANOS) parquet as long nanoseconds; Tables.table
      // normalizes either fixture encoding to the long-nanos `ts` contract
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ContextCleaner fallback for checkpoint blocks on a big heap where
      // the driver may never GC mid-session (Checkpoints.freeAll is the
      // primary cleanup path)
      .config("spark.cleaner.periodicGC.interval", "60s")
      // file-split floor: the default 4 MB openCostInBytes caps a small
      // single-file scan at 1-3 splits (maxSplitBytes = max(openCost,
      // bytes/parallelism)), so any heavy PER-ROW work fused into the
      // scan stage (salt explodes, md5 shuffles, n-gram probes) rides
      // ONE core and its wall time tracks single-core speed — the
      // r11-bench queries that inflated 3-5x on a contended box while
      // wide queries amortized. 64 KB lets a 10 MB file split ~32 ways;
      // on a real multi-file cluster dataset this floor never binds.
      .config("spark.sql.files.openCostInBytes", "65536")
}
