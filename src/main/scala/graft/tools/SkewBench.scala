package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join shootout: the same hot-key equi-join (one key owning half the
  * left side) through (a) a plain shuffle join with AQE skew splitting OFF
  * — the failure mode, one straggler reducer — (b) the same join with AQE
  * skew splitting ON, and (c) [[graft.ops.Salting.saltedJoin]].
  *
  * The right side is forced off the broadcast path
  * (autoBroadcastJoinThreshold = -1) because that is the regime both
  * remedies exist for — a broadcastable build side has no skew problem.
  * AQE's skew thresholds are lowered to make it fire at local data sizes
  * (its defaults target 256 MB partitions); a real cluster hits them
  * naturally.
  *
  * Run: {{{ sbt "runMain graft.tools.SkewBench [factor]" }}}
  * (factor multiplies the 600k-row sf0.1 lineitem; 10 ≈ 6M rows with 3M
  * on the hot key.)
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    def session(skewJoin: Boolean): SparkSession = {
      val b = graft.GraftSession.builder(cpus, s"graft-skew-bench-$skewJoin")
        // the no-broadcast regime (a broadcastable right side has no skew
        // problem to solve)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
        // make AQE's splitter fire at local sizes (defaults are tuned for
        // 256 MB cluster partitions)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      b.getOrCreate()
    }

    def fixture(spark: SparkSession): (DataFrame, DataFrame) = {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .crossJoin(spark.range(factor).select(col("id").as("__rep")))
        .withColumn("l_orderkey", col("l_orderkey") * factor + col("__rep"))
        .drop("__rep")
      // 100x-style skew: half the rows collapse onto key 0, the rest
      // spread over 10k keys
      val left = li.withColumn("k",
        when(col("l_orderkey") % 2 === 0, lit(0L))
          .otherwise(col("l_orderkey") % 10000L))
      val right = spark.range(10000).select(col("id").as("k"),
        (col("id") * 7 % 100).cast("double").as("dim_v"))
      (left, right)
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def consume(df: DataFrame): Long =
      df.agg(count(lit(1)), sum(col("l_quantity") * col("dim_v"))).head().getLong(0)

    // separate sessions per AQE setting (the flag is read at planning time)
    Seq(false, true).foreach { skew =>
      val spark = session(skew)
      spark.sparkContext.setLogLevel("ERROR")
      val (left, right) = fixture(spark)
      // warmup the scan path
      left.agg(count(lit(1))).collect()
      val (tPlain, nPlain) = time(consume(left.join(right, Seq("k"))))
      println(f"plain join, AQE skewJoin=$skew%-5s: $tPlain%6.1fs ($nPlain rows)")
      if (skew) {
        val (tSalt, nSalt) = time(consume(
          graft.ops.Salting.saltedJoin(left, right, Seq("k"), buckets = 16)))
        println(f"salted join (16 buckets)       : $tSalt%6.1fs ($nSalt rows)")
        assert(nSalt == nPlain, s"row-count drift: $nSalt vs $nPlain")
      }
      spark.stop()
    }
  }
}
