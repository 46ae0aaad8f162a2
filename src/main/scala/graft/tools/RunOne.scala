package graft.tools
import org.apache.spark.sql.SparkSession
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      try {
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(s"[runone] $name OK rows=$n")
      } catch { case e: Throwable =>
        println(s"[runone] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        var c = e.getCause
        while (c != null) { println(s"  caused by: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
      }
    }
    spark.stop()
  }
}
