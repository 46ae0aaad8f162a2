package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev diagnostic: per-query Spark JOB / STAGE / TASK counts — the
  * fixed-overhead multipliers that make a query environment-sensitive
  * (a contended driver box taxes every job/stage launch; a query of 15
  * jobs inflates 15× that tax while a one-job scan hides it). Run:
  * {{{ sbt "runMain graft.tools.JobCount q184_curriculum_order ..." }}}
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-jobcount")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })
    args.foreach { name =>
      // warm once so listener counts the steady-state shape, not IO warmup
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      graft.Checkpoints.freeAll(spark)
      Thread.sleep(300)
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let straggler listener events drain
      println(f"$name: jobs=$jobs stages=$stages tasks=$tasks time=$sec%.2fs")
      graft.Checkpoints.freeAll(spark)
    }
    spark.stop()
  }
}
