package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir). Extra args are a dev-only query
    // name filter (exact names) for targeted oracle checks.
    val sfDir = args(0)
    val outDir = args(1)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus, "graft-verify").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // result written: drop the query's checkpoint blocks so the
        // 100+-query dump doesn't accumulate session state
        Checkpoints.freeAll(spark)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A crashed query is a MISSING parquet dir, which the downstream compare
    // silently drops from the correctness report (round 6: 5 queries vanished
    // behind an all-clear rc). Leave a durable marker next to the results and
    // shout on stderr; rc stays 0 so the healthy queries still get compared.
    val failJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/_verify_failures.json"), failJson)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} FAILED queries (absent from results): ${failed.sorted.mkString(", ")}")
    spark.stop()
  }
}
