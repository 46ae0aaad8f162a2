package graft.tools
import scala.util.control.NonFatal

/** Dev tool: run named SparkEntry queries and report rows or the failure
  * chain. Exits 1 if any query failed (fatal errors propagate and kill the
  * JVM — an OOM must not be reported as a per-query failure). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("4", "graft-runone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    var anyFailed = false
    args.foreach { name =>
      try {
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(s"[runone] $name OK rows=$n")
      } catch { case NonFatal(e) =>
        anyFailed = true
        println(s"[runone] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        var c = e.getCause
        while (c != null) { println(s"  caused by: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
      }
    }
    spark.stop()
    if (anyFailed) sys.exit(1)
  }
}
