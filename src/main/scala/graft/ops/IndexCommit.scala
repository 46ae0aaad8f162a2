package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe staged commits for PERSISTED SERVING INDEXES (the BM25
  * postings tree, the IVF corpus) — the generalization of
  * [[graft.streaming.StreamingEval.compactSpanIndex]]'s authoritative-
  * marker pattern to multi-table index roots.
  *
  * A maintenance operation (append / compact / takedown) writes every
  * table it will publish under `<root>/op_staging/<table>`, then writes
  * a `_COMMIT` marker naming one action per table, then calls
  * [[commit]]. From the moment the marker exists the stage is
  * AUTHORITATIVE: every action is idempotent (a rename whose source is
  * gone already happened; a file move skips files already moved), so a
  * crash anywhere is recovered by replaying the marker — which
  * [[recover]] does as the preamble of every maintenance entry point. A
  * stage WITHOUT a marker is an incomplete write and is discarded (the
  * live tables are untouched until the marker lands, so discarding
  * loses nothing).
  *
  * Actions:
  *  - `swap <table>`: replace the live table wholesale (delete live dir,
  *    rename staged dir in) — for tables rewritten at their own grain
  *    (terms, stats, a compacted postings tree);
  *  - `merge <table>`: move the staged files INTO the live table,
  *    mirroring partition subdirectories — for append-shaped tables
  *    (postings, doclens), where the increment's files simply join the
  *    live file-set. Spark part-file names carry a per-job UUID, so
  *    staged files can never collide with live ones.
  *
  * Concurrency contract: ONE maintenance operation at a time per index
  * root (stop the writer before compacting, etc. — the
  * [[graft.streaming.StreamingEval.compactSpanIndex]] rule). Readers of
  * a mid-commit index may see a torn view; serving reads and
  * maintenance are expected to be fenced by the caller. */
object IndexCommit {

  val StagingName = "op_staging"
  private val MarkerName = "_COMMIT"

  def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  def stagingDir(root: String): String = s"$root/$StagingName"

  /** Preamble for every maintenance op and for readers that want a
    * consistent view after an unclean shutdown: replay a marked stage,
    * discard an unmarked one. Returns true iff a pending commit was
    * replayed. */
  def recover(spark: SparkSession, root: String): Boolean = {
    val fs = fsFor(spark, root)
    val staging = new Path(root, StagingName)
    if (!fs.exists(staging)) return false
    val marker = new Path(staging, MarkerName)
    if (!fs.exists(marker)) {
      fs.delete(staging, true) // incomplete stage: live tables untouched
      false
    } else {
      replay(fs, new Path(root))
      true
    }
  }

  /** Write the authoritative marker (one "verb table" line per action,
    * applied in order) and run the commit. Call once every staged table
    * is fully written. */
  def commit(fs: FileSystem, root: Path, actions: Seq[(String, String)]): Unit = {
    writeMarker(fs, root, actions)
    replay(fs, root)
  }

  /** The marker write alone — the commit's point of no return, split out
    * so crash-recovery specs can stop the world exactly here (and at
    * hand-made partial-replay states after it) and assert [[recover]]
    * converges. Production code calls [[commit]]. */
  private[graft] def writeMarker(
      fs: FileSystem, root: Path, actions: Seq[(String, String)]): Unit = {
    require(actions.nonEmpty, "commit needs at least one action")
    require(actions.forall(a => a._1 == "swap" || a._1 == "merge"),
      s"unknown verbs in ${actions.map(_._1).distinct}")
    val marker = new Path(new Path(root, StagingName), MarkerName)
    atomicWrite(fs, marker,
      actions.map(a => s"${a._1} ${a._2}").mkString("\n").getBytes("UTF-8"))
  }

  /** Exactly-once fencing for STREAMING appenders: has `tag` already
    * committed into this root's `batches/` table? A tag's row rides the
    * same atomic marker replay as the data it fences ([[stageTag]]), so
    * a crash-retried micro-batch that finds its tag knows the whole
    * append landed — and one that doesn't knows none of it did.
    *
    * Cost contract: the check reads the `batches/` table, which gains
    * one small file per committed batch — so each check costs O(batches
    * since the last compaction) file listings/footers. Every index
    * family's compactor folds the table back to one file (the
    * [[stageTagCompaction]] rider), which bounds the check: a
    * long-lived stream must run its artifact's compaction on a cadence
    * (every ~10³ batches keeps the per-batch check at a few thousand
    * footer reads worst-case), the same stop-the-writer maintenance
    * window the data files need anyway. */
  def tagCommitted(spark: SparkSession, root: String, tag: Long): Boolean = {
    val fs = fsFor(spark, root)
    fs.exists(new Path(s"$root/batches")) &&
      spark.read.parquet(s"$root/batches")
        .filter(org.apache.spark.sql.functions.col("batch_tag") === tag)
        .limit(1).count() > 0
  }

  /** Stage `tag`'s one-row `batches/` increment under the root's staging
    * dir; returns the commit action to append to the operation's list. */
  def stageTag(spark: SparkSession, root: String, tag: Long): (String, String) = {
    spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(tag)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch_tag",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${stagingDir(root)}/batches")
    "merge" -> "batches"
  }

  /** Compaction rider for the tag table: a long-lived stream leaves one
    * tiny `batches/` file per micro-batch; fold them to one file in the
    * same staged commit as the index compaction (tags keep fencing —
    * the rows are identical). Returns the action to append, or None
    * when the root has no tag history. */
  def stageTagCompaction(
      spark: SparkSession, root: String): Option[(String, String)] = {
    if (!fsFor(spark, root).exists(new Path(s"$root/batches"))) return None
    spark.read.parquet(s"$root/batches")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${stagingDir(root)}/batches")
    Some("swap" -> "batches")
  }

  /** A FRESH artifact save owns its root: drop any tag history a
    * previous index/export at the same path accumulated — a restarted
    * stream against a rebuilt artifact must not skip batches because an
    * OLD incarnation saw their tags. */
  def clearTags(spark: SparkSession, root: String): Unit = {
    fsFor(spark, root).delete(new Path(s"$root/batches"), true)
    ()
  }

  /** Publish a marker file ATOMICALLY: write the bytes to `<name>.tmp`
    * and rename into place. A marker is AUTHORITATIVE the instant it
    * exists, so it must appear fully written or not at all — a crash
    * mid-`create` would otherwise leave a truncated marker that recovery
    * replays as a partial (and therefore wrong) action list. Rename is
    * atomic on HDFS and local filesystems; the orphaned `.tmp` from a
    * pre-rename crash dies with its staging dir. */
  private[graft] def atomicWrite(
      fs: FileSystem, marker: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(marker.getParent, marker.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(bytes); out.close()
    if (fs.exists(marker)) fs.delete(marker, false)
    if (!fs.rename(tmp, marker))
      throw new IllegalStateException(s"could not publish marker $marker")
  }

  /** The idempotent commit sequence the marker describes. Private: the
    * public faces are [[commit]] (first run) and [[recover]] (replay). */
  private def replay(fs: FileSystem, root: Path): Unit = {
    val staging = new Path(root, StagingName)
    val marker = new Path(staging, MarkerName)
    val lines = new String(org.apache.hadoop.io.IOUtils
      .readFullyToByteArray(fs.open(marker)), "UTF-8")
      .split("\n").map(_.trim).filter(_.nonEmpty)
    lines.foreach { line =>
      val Array(verb, name) = line.split(" ", 2)
      val src = new Path(staging, name)
      val dst = new Path(root, name)
      verb match {
        case "swap" =>
          if (fs.exists(src)) { // source gone => this swap already ran
            if (fs.exists(dst)) fs.delete(dst, true)
            fs.rename(src, dst)
            ()
          }
        case "merge" =>
          if (fs.exists(src)) {
            moveTree(fs, src, dst)
            fs.delete(src, true)
            ()
          }
        case other =>
          throw new IllegalStateException(s"corrupt _COMMIT marker verb '$other'")
      }
    }
    fs.delete(staging, true)
    ()
  }

  /** Move every DATA file under `src` into the mirrored location under
    * `dst`, creating directories as needed. Bookkeeping files
    * (`_SUCCESS`, checksums) stay behind and die with the staging dir —
    * the live table keeps its own. Idempotent: files already moved are
    * no longer listed. */
  private def moveTree(fs: FileSystem, src: Path, dst: Path): Unit = {
    fs.mkdirs(dst)
    fs.listStatus(src).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory) moveTree(fs, st.getPath, new Path(dst, n))
      else if (!n.startsWith("_") && !n.startsWith(".")) {
        fs.rename(st.getPath, new Path(dst, n))
        ()
      }
    }
  }
}
