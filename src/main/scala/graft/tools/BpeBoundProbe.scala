package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: why does the batch prefix stop — conflicts or the
  * new-pair bound? Prints the round-0 top pairs with their adjacent
  * maxes on the real corpus. */
object BpeBoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8", "bpe-bound-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.ops.BpeTrain.initialPairCounts(docs, "text").persist()
    val top = pairs.orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
      .limit(20).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val lefts = top.map(_._2).distinct
    val rights = top.map(_._1).distinct
    val maxLeft = pairs.filter(col("left_sym").isin(lefts.toSeq: _*))
      .groupBy("left_sym").agg(max("pair_count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxRight = pairs.filter(col("right_sym").isin(rights.toSeq: _*))
      .groupBy("right_sym").agg(max("pair_count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    top.foreach { case (a, b, c) =>
      val bound = math.min(c,
        math.max(maxRight.getOrElse(a, 0L), maxLeft.getOrElse(b, 0L)))
      println(f"pair ('$a','$b') c=$c%d maxRight(a)=${maxRight.getOrElse(a, 0L)}%d " +
        f"maxLeft(b)=${maxLeft.getOrElse(b, 0L)}%d bound=$bound%d")
    }
    spark.stop()
  }
}
