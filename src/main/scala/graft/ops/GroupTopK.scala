package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heap-based grouped top-k — the scalable alternative to
  * `row_number().over(Window.partitionBy(g).orderBy(s.desc)) <= k`.
  *
  * The window formulation SORTS every group in full (O(n log n) per group
  * after a shuffle of all rows) just to discard everything past rank k.
  * This aggregator keeps a size-k min-heap per group instead — O(n log k)
  * — and, because it is an ordinary aggregate, Spark runs it with
  * map-side partial aggregation: each input partition reduces to at most
  * k rows per group BEFORE the shuffle, so the exchange carries k·groups
  * rows instead of n. At 100 TB with k=10 that is the difference between
  * shuffling everything and shuffling almost nothing.
  *
  * Ties on score break toward the smaller id, matching the window
  * formulation's `orderBy(score.desc, id.asc)` — results are identical
  * row-for-row (a tested invariant), only the plan differs.
  */
object GroupTopK {

  /** One scored candidate; `id` is the tiebreak and join-back key. */
  final case class ScoredId(score: Double, id: Long)

  /** `lt(a, b)` = "a is better than b": higher score, then smaller id. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private class TopKAggregator(k: Int)
      extends Aggregator[ScoredId, mutable.PriorityQueue[(Double, Long)], Seq[ScoredId]]
      with Serializable {
    // dequeue yields the WORST kept element (the eviction candidate)
    private def ord: Ordering[(Double, Long)] =
      Ordering.fromLessThan[(Double, Long)]((a, b) => better(a, b))

    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty(ord)

    override def reduce(
        q: mutable.PriorityQueue[(Double, Long)],
        x: ScoredId): mutable.PriorityQueue[(Double, Long)] = {
      val t = (x.score, x.id)
      if (q.size < k) q.enqueue(t)
      else if (better(t, q.head)) { q.dequeue(); q.enqueue(t) }
      q
    }

    override def merge(
        a: mutable.PriorityQueue[(Double, Long)],
        b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
      b.foreach { t =>
        if (a.size < k) a.enqueue(t)
        else if (better(t, a.head)) { a.dequeue(); a.enqueue(t) }
      }
      a
    }

    override def finish(q: mutable.PriorityQueue[(Double, Long)]): Seq[ScoredId] =
      // sort with the same comparator the heap evicts by: sortBy's
      // java.lang.Double total order would distinguish -0.0 from 0.0,
      // where `better` (like Spark's SQL ordering) ties them
      q.toSeq.sortWith(better).map(t => ScoredId(t._1, t._2))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      org.apache.spark.sql.Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Top `k` (id, score) rows per group of `groupCols`, highest score
    * first, ties toward the smaller id. Output columns: the group cols +
    * `idCol`, `scoreCol`, and `rankCol` (1-based). Carry other payload by
    * joining back on (group, id). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      scoreCol: String,
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = udaf(new TopKAggregator(k), ExpressionEncoder[ScoredId]())
    // null/NaN scores are unrankable (engine-wide NaN ≡ null contract);
    // dropping them here also keeps the aggregator's primitive input
    // encoder from silently turning null into 0.0
    df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("__topk"))
      .select((groupCols.map(col) :+ posexplode(col("__topk"))): _*)
      .select((groupCols.map(col) :+
        (col("pos") + 1).cast("long").as(rankCol) :+
        col("col.id").as(idCol) :+
        col("col.score").as(scoreCol)): _*)
  }
}
