package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for selected queries.
  * {{{ sbt "runMain graft.tools.PlanDump q01_linear q20_staged_threshold" }}} */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("4", "graft-plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n########## $name ##########")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
