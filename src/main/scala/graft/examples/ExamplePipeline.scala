package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Joins, Packing, Pipelines, Retrieval, Sampling, Similarity, Snapshot}

/** Training-data-pipeline usage trace: the end-to-end flow a corpus team
  * would run — clean, check contamination, split, pack, and quantize —
  * over the shared testdata. Run:
  * {{{ sbt "runMain graft.examples.ExamplePipeline" }}}
  */
object ExamplePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-example-pipeline")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS): read as long nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // 1. clean + enrich + deterministic split, one lazy plan
    // (htmlClean = web-text stage 0: tag strip, entity decode,
    // boilerplate lines, PII redaction — before dedup so markup-only
    // variants collapse to exact duplicates; lineDedup strips
    // corpus-frequent chrome lines, the source quota caps any one
    // domain, shuffleShards emits the deterministic epoch order)
    val prepared = Pipelines.prepareTrainingCorpus(
      docs, nearDupThreshold = 0.9, minQuality = 30.0, htmlClean = true,
      lineDedupMaxDocFreq = Some(50L),
      sourceQuota = Some(("source", 100)),
      shuffleShards = Some(8),
      maxPerplexity = Some(1e6), // bigram-LM gate (loose here: tiny corpus)
      maxLengthZ = Some(4.0))    // per-language token-count outlier gate
    val stats = prepared.stats()
    println(s"funnel: in=${stats.input} exact=${stats.afterExactDedup} " +
      s"near=${stats.afterNearDedup} quality=${stats.afterQuality} out=${stats.output}")
    prepared.df.groupBy("split").count().orderBy("split").show()

    // 2. contamination: is the held-out tail leaked into the training head?
    // report the leaks, then drop the contaminated training docs
    val leaks = Dedup.contaminationPairs(
      docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
      "text", "doc_id", threshold = 0.5, ngram = 3, maxDocFreq = Some(100L))
    println(s"contaminated benchmark docs: ${leaks.select("bench_id").distinct().count()}")
    val decontaminated = Dedup.decontaminate(
      docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
      "text", "doc_id", threshold = 0.5, ngram = 3, maxDocFreq = Some(100L))
    println(s"training docs after decontamination: ${decontaminated.count()}")

    // 3. pack the training split into 512-token sequences per source shard
    val packed = Packing.sequencePacking(
      prepared.df.filter(col("split") === "train")
        .select(col("doc_id"), col("source"), col("n_tokens")),
      "doc_id", "n_tokens", "source", budget = 512L, orderCol = "doc_id")
    packed.select(sum("n_chunks")).show()

    // 4. quantize embeddings for the retrieval index; search via the
    //    int8 prefilter + exact rerank
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 2), k = 5, rerank = 20)
      .orderBy("query_id", "nn_rank").show()

    // 5. as-of alignment on the event stream (latest purchase before click)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"), col("value"))
    Joins.asofJoinBackward(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      "user_id", "us", "us", "event_id", payloadCols = Seq("event_id", "value"))
      .select("event_id", "user_id", "asof_event_id", "asof_value")
      .show(5)

    // 6. deterministic stratified subsample for an eval set
    val sampled = Sampling.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.25), default = 0.05)
    println(s"stratified sample: ${sampled.count()} docs")

    // 7. keyword retrieval over the cleaned corpus (BM25, heap top-k)
    import spark.implicits._
    val queries = Seq((1L, "query hash join"), (2L, "window agg fast"))
      .toDF("qid", "qtext")
    Retrieval.bm25Search(prepared.df, "doc_id", "text", queries, "qid", "qtext", topK = 3)
      .orderBy("qid", "rank").show()

    // 8. compact the event log to its latest state per user
    val latest = Snapshot.latestByKey(ev, Seq("user_id"), col("us"), "event_id")
    println(s"latest-state rows: ${latest.count()} (from ${ev.count()} events)")

    spark.stop()
  }
}
