package graft.ops

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

  /** Aggregation buffer: a binary heap over parallel primitive arrays,
    * worst kept element at the root. Primitive arrays (not a boxed
    * PriorityQueue behind a Kryo encoder) keep the spill/merge
    * serialization a flat UnsafeRow copy — the aggregate is the engine's
    * most-reused (every ANN stage, BM25, sampling), and at 100-TB group
    * counts every sort-based-fallback spill pays this encoder. */
  final case class TopKBuf(scores: Array[Double], ids: Array[Long], var n: Int)

  /** `lt(a, b)` = "a is better than b": higher score, then smaller id.
    * Primitive-arg twin of the tuple version for the heap's hot path —
    * `==` on primitive doubles ties -0.0 with 0.0, like Spark's SQL
    * ordering (java.lang.Double.compare would split them). */
  private def better(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean =
    aScore > bScore || (aScore == bScore && aId < bId)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    better(a._1, a._2, b._1, b._2)

  private class TopKAggregator(k: Int)
      extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]]
      with Serializable {

    override def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0)

    /** Heap invariant: parent is worse than (or ties) its children, so
      * index 0 is the eviction candidate. */
    private def insert(b: TopKBuf, s: Double, id: Long): Unit = {
      val sc = b.scores
      val ii = b.ids
      if (b.n < k) {
        var i = b.n
        sc(i) = s; ii(i) = id
        b.n += 1
        // sift up while the parent is BETTER than the child (the worse
        // element must sit above)
        var cont = i > 0
        while (cont) {
          val p = (i - 1) >> 1
          if (better(sc(p), ii(p), sc(i), ii(i))) {
            val ts = sc(p); sc(p) = sc(i); sc(i) = ts
            val ti = ii(p); ii(p) = ii(i); ii(i) = ti
            i = p
            cont = i > 0
          } else cont = false
        }
      } else if (better(s, id, sc(0), ii(0))) {
        sc(0) = s; ii(0) = id
        // sift down toward the worst child
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < b.n && better(sc(w), ii(w), sc(l), ii(l))) w = l
          if (r < b.n && better(sc(w), ii(w), sc(r), ii(r))) w = r
          if (w == i) cont = false
          else {
            val ts = sc(i); sc(i) = sc(w); sc(w) = ts
            val ti = ii(i); ii(i) = ii(w); ii(w) = ti
            i = w
          }
        }
      }
    }

    override def reduce(b: TopKBuf, x: ScoredId): TopKBuf = {
      insert(b, x.score, x.id)
      b
    }

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var i = 0
      while (i < b.n) { insert(a, b.scores(i), b.ids(i)); i += 1 }
      a
    }

    override def finish(b: TopKBuf): Seq[ScoredId] =
      // sort with the same comparator the heap evicts by (see `better`)
      (0 until b.n).map(i => (b.scores(i), b.ids(i)))
        .sortWith(better).map(t => ScoredId(t._1, t._2))

    override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
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
    // The id travels through the heap as a long (the engine-wide
    // numeric-unique-id contract). A NON-numeric id (a UUID string)
    // casts to null in non-ANSI mode, and a null feeding the
    // aggregator's primitive encoder would CORRUPT silently (every such
    // id collapses to one value) — raise loudly instead, naming the
    // offending value. Map such corpora through a dense surrogate id
    // first: [[Ids.withSurrogateId]] / [[Ids.restoreId]].
    val idLong = col(idCol).cast("long")
    val checkedId = when(col(idCol).isNotNull && idLong.isNull,
      raise_error(concat(
        lit(s"GroupTopK id column '$idCol' must be numeric-castable " +
          "(route string keys through Ids.withSurrogateId first); got: "),
        col(idCol).cast("string")))).otherwise(idLong)
    // null/NaN scores are unrankable (engine-wide NaN ≡ null contract);
    // dropping them here also keeps the aggregator's primitive input
    // encoder from silently turning null into 0.0
    df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), checkedId).as("__topk"))
      .select((groupCols.map(col) :+ posexplode(col("__topk"))): _*)
      .select((groupCols.map(col) :+
        (col("pos") + 1).cast("long").as(rankCol) :+
        col("col.id").as(idCol) :+
        col("col.score").as(scoreCol)): _*)
  }

  // ------------------------------------------------------- string keys

  /** One scored candidate keyed by a STRING (an n-gram, a URL, a domain —
    * the heavy-hitter payloads that have no numeric id). */
  final case class ScoredKey(score: Double, key: String)

  /** Buffer keys are UTF-8 byte arrays so the tie-break comparator is
    * binary (= code-point) order — the order Spark's `UTF8String`, the
    * engine SQL `ORDER BY`, and every external oracle agree on.
    * `String.compareTo` (UTF-16 code units) would diverge above the BMP. */
  final case class TopKStrBuf(scores: Array[Double], keys: Array[Array[Byte]], var n: Int)

  /** Unsigned lexicographic byte compare: a < b. */
  private def bytesLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** "a is better than b": higher score, then binary-smaller key. */
  private def betterK(aScore: Double, aKey: Array[Byte], bScore: Double, bKey: Array[Byte]): Boolean =
    aScore > bScore || (aScore == bScore && bytesLess(aKey, bKey))

  private class TopKStrAggregator(k: Int)
      extends Aggregator[ScoredKey, TopKStrBuf, Seq[ScoredKey]]
      with Serializable {

    override def zero: TopKStrBuf =
      TopKStrBuf(new Array[Double](k), new Array[Array[Byte]](k), 0)

    private def insert(b: TopKStrBuf, s: Double, key: Array[Byte]): Unit = {
      val sc = b.scores
      val kk = b.keys
      if (b.n < k) {
        var i = b.n
        sc(i) = s; kk(i) = key
        b.n += 1
        var cont = i > 0
        while (cont) {
          val p = (i - 1) >> 1
          if (betterK(sc(p), kk(p), sc(i), kk(i))) {
            val ts = sc(p); sc(p) = sc(i); sc(i) = ts
            val tk = kk(p); kk(p) = kk(i); kk(i) = tk
            i = p
            cont = i > 0
          } else cont = false
        }
      } else if (betterK(s, key, sc(0), kk(0))) {
        sc(0) = s; kk(0) = key
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < b.n && betterK(sc(w), kk(w), sc(l), kk(l))) w = l
          if (r < b.n && betterK(sc(w), kk(w), sc(r), kk(r))) w = r
          if (w == i) cont = false
          else {
            val ts = sc(i); sc(i) = sc(w); sc(w) = ts
            val tk = kk(i); kk(i) = kk(w); kk(w) = tk
            i = w
          }
        }
      }
    }

    override def reduce(b: TopKStrBuf, x: ScoredKey): TopKStrBuf = {
      insert(b, x.score, x.key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      b
    }

    override def merge(a: TopKStrBuf, b: TopKStrBuf): TopKStrBuf = {
      var i = 0
      while (i < b.n) { insert(a, b.scores(i), b.keys(i)); i += 1 }
      a
    }

    override def finish(b: TopKStrBuf): Seq[ScoredKey] =
      (0 until b.n).map(i => (b.scores(i), b.keys(i)))
        .sortWith((x, y) => betterK(x._1, x._2, y._1, y._2))
        .map(t => ScoredKey(t._1, new String(t._2, java.nio.charset.StandardCharsets.UTF_8)))

    override def bufferEncoder: Encoder[TopKStrBuf] = ExpressionEncoder[TopKStrBuf]()
    override def outputEncoder: Encoder[Seq[ScoredKey]] =
      ExpressionEncoder[Seq[ScoredKey]]()
  }

  // ------------------------------------------ string keys with payload

  /** A string-keyed candidate carrying one LONG payload through the heap
    * (a raw count — n_pair, tf) so the winner's payload needs no
    * join-back re-evaluation of the scored subtree. The payload rides
    * inertly: ordering and eviction are [[ScoredKey]]'s exactly, so the
    * selected (key, score, rank) set is identical to
    * [[topKPerGroupString]]'s. */
  final case class ScoredKeyP(score: Double, key: String, payload: Long)

  final case class TopKStrPBuf(
      scores: Array[Double], keys: Array[Array[Byte]], payloads: Array[Long], var n: Int)

  private class TopKStrPayloadAggregator(k: Int)
      extends Aggregator[ScoredKeyP, TopKStrPBuf, Seq[ScoredKeyP]]
      with Serializable {

    override def zero: TopKStrPBuf =
      TopKStrPBuf(new Array[Double](k), new Array[Array[Byte]](k), new Array[Long](k), 0)

    private def insert(b: TopKStrPBuf, s: Double, key: Array[Byte], p: Long): Unit = {
      val sc = b.scores
      val kk = b.keys
      val pp = b.payloads
      if (b.n < k) {
        var i = b.n
        sc(i) = s; kk(i) = key; pp(i) = p
        b.n += 1
        var cont = i > 0
        while (cont) {
          val q = (i - 1) >> 1
          if (betterK(sc(q), kk(q), sc(i), kk(i))) {
            val ts = sc(q); sc(q) = sc(i); sc(i) = ts
            val tk = kk(q); kk(q) = kk(i); kk(i) = tk
            val tp = pp(q); pp(q) = pp(i); pp(i) = tp
            i = q
            cont = i > 0
          } else cont = false
        }
      } else if (betterK(s, key, sc(0), kk(0))) {
        sc(0) = s; kk(0) = key; pp(0) = p
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < b.n && betterK(sc(w), kk(w), sc(l), kk(l))) w = l
          if (r < b.n && betterK(sc(w), kk(w), sc(r), kk(r))) w = r
          if (w == i) cont = false
          else {
            val ts = sc(i); sc(i) = sc(w); sc(w) = ts
            val tk = kk(i); kk(i) = kk(w); kk(w) = tk
            val tp = pp(i); pp(i) = pp(w); pp(w) = tp
            i = w
          }
        }
      }
    }

    override def reduce(b: TopKStrPBuf, x: ScoredKeyP): TopKStrPBuf = {
      insert(b, x.score,
        x.key.getBytes(java.nio.charset.StandardCharsets.UTF_8), x.payload)
      b
    }

    override def merge(a: TopKStrPBuf, b: TopKStrPBuf): TopKStrPBuf = {
      var i = 0
      while (i < b.n) { insert(a, b.scores(i), b.keys(i), b.payloads(i)); i += 1 }
      a
    }

    override def finish(b: TopKStrPBuf): Seq[ScoredKeyP] =
      (0 until b.n).map(i => (b.scores(i), b.keys(i), b.payloads(i)))
        .sortWith((x, y) => betterK(x._1, x._2, y._1, y._2))
        .map(t => ScoredKeyP(t._1,
          new String(t._2, java.nio.charset.StandardCharsets.UTF_8), t._3))

    override def bufferEncoder: Encoder[TopKStrPBuf] = ExpressionEncoder[TopKStrPBuf]()
    override def outputEncoder: Encoder[Seq[ScoredKeyP]] =
      ExpressionEncoder[Seq[ScoredKeyP]]()
  }

  /** [[topKPerGroupString]] carrying one LONG `payloadCol` through the
    * heap — for callers that would otherwise JOIN BACK to the scored
    * frame just to recover a count column (collocations' n_pair, TF-IDF's
    * tf): the join-back re-evaluates the whole scored subtree a second
    * time and adds an exchange, where the payload rides the aggregate for
    * free. Selection, ordering and ties are identical to
    * [[topKPerGroupString]] (the payload never enters the comparator).
    * Output: group cols + `rankCol`, `keyCol`, `scoreCol`, `payloadCol`.
    * Null payloads are not representable (LONG through the primitive
    * buffer) — payloads are raw counts, never null by construction; a
    * null payload row refuses loudly rather than silently becoming 0. */
  def topKPerGroupStringPayload(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      scoreCol: String,
      payloadCol: String,
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = udaf(new TopKStrPayloadAggregator(k), ExpressionEncoder[ScoredKeyP]())
    val checkedPayload = when(col(payloadCol).isNull,
      raise_error(concat(
        lit(s"GroupTopK payload column '$payloadCol' must be non-null " +
          "(it rides a primitive LONG buffer); got null for key: "),
        col(keyCol).cast("string")))).otherwise(col(payloadCol).cast("long"))
    df.filter(col(keyCol).isNotNull && col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(keyCol).cast("string"),
        checkedPayload).as("__topk"))
      .select((groupCols.map(col) :+ posexplode(col("__topk"))): _*)
      .select((groupCols.map(col) :+
        (col("pos") + 1).cast("long").as(rankCol) :+
        col("col.key").as(keyCol) :+
        col("col.score").as(scoreCol) :+
        col("col.payload").as(payloadCol)): _*)
  }

  /** [[topKPerGroup]] for STRING-keyed candidates (heavy hitters: top
    * n-grams, top URLs/domains per group) — same size-k min-heap with
    * map-side partial aggregation, ties toward the binary-smaller key.
    * Null keys and null/NaN scores are unrankable and dropped (the
    * engine-wide NaN ≡ null contract). */
  def topKPerGroupString(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      scoreCol: String,
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = udaf(new TopKStrAggregator(k), ExpressionEncoder[ScoredKey]())
    df.filter(col(keyCol).isNotNull && col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(keyCol).cast("string")).as("__topk"))
      .select((groupCols.map(col) :+ posexplode(col("__topk"))): _*)
      .select((groupCols.map(col) :+
        (col("pos") + 1).cast("long").as(rankCol) :+
        col("col.key").as(keyCol) :+
        col("col.score").as(scoreCol)): _*)
  }
}
