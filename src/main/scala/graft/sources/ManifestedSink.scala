package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming append sink that keeps a zone+bloom [[Manifest]]
  * TRANSACTIONALLY in step with the data directory — the manifest
  * doubles as the commit log, which is the core trick of every table
  * format (Delta/Iceberg) expressed in plain Spark + rename-atomic
  * filesystem ops.
  *
  * Invariant after every committed batch: manifest file set == data
  * directory file set (so [[Manifest.prunedRead]]/[[Manifest
  * .prunedReadEq]]'s staleness guard passes and pruning is always
  * live, even mid-ingest), and every file is tagged with the batch id
  * that wrote it.
  *
  * Exactly-once on replay: foreachBatch re-delivers a batch after a
  * crash. Recovery is manifest-driven, run at the START of every
  * append:
  *  1. files in the directory but NOT in the manifest = a batch that
  *     crashed after writing data but before publishing its manifest
  *     → deleted (they were never committed);
  *  2. manifest rows carrying THIS batch id = a previous COMPLETE
  *     attempt whose checkpoint commit didn't land → its files are
  *     deleted and its rows dropped, then the batch applies fresh.
  * The manifest itself publishes via a staged sibling + rename dance
  * (the [[Compact]] discipline): a crash mid-publish leaves either
  * the old manifest (batch rolls back as case 1) or the staged one
  * recoverable.
  *
  * Scale shape: per batch, one listing of the data directory, one
  * stats pass over the NEW files only, and a driver-side rewrite of
  * the manifest (file-count-sized, the same bound every consult
  * already carries).
  */
object ManifestedSink {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(fs: FileSystem, dir: Path): Set[String] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => s.getPath.toUri.getPath).toSet

  /** Load the live manifest, finishing a crashed publish if the
    * staged sibling is the only copy. Returns None before the first
    * committed batch.
    */
  def readManifest(spark: SparkSession, manifestDir: String): Option[DataFrame] = {
    val fs = fsOf(spark, manifestDir)
    val live = new Path(manifestDir)
    val stage = new Path(manifestDir + ".stage")
    def hasData(p: Path) = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isFile && !s.getPath.getName.startsWith("_"))
    if (!hasData(live) && hasData(stage)) {
      if (fs.exists(live)) fs.delete(live, true) // empty husk blocks the rename
      fs.rename(stage, live)
    }
    if (hasData(live)) Some(spark.read.parquet(manifestDir)) else None
  }

  /** Append one micro-batch under the manifest transaction (the
    * foreachBatch body; idempotent per `batchId`).
    */
  def appendBatch(
      batch: DataFrame,
      dir: String,
      manifestDir: String,
      cols: Seq[String],
      bloomCols: Seq[String],
      batchId: Long,
      expectedPerFile: Long = 100000L,
      fpp: Double = 0.01): Unit = {
    val spark = batch.sparkSession
    val fs = fsOf(spark, dir)
    val dirPath = new Path(dir)

    // ---- recovery: the manifest is the truth ----
    // survivors = committed batches other than this one; everything
    // else in the directory (uncommitted orphans from a crash before
    // manifest publish, or a previous complete attempt of THIS batch
    // whose checkpoint commit never landed) is swept before re-apply
    val prior = readManifest(spark, manifestDir)
    val survivors = prior.map(_.filter(col("batch_id") =!= batchId))
    val survivorFiles = survivors.map(
      _.select("file").collect().map(r =>
        new Path(r.getString(0)).toUri.getPath).toSet).getOrElse(Set.empty)
    (dataFiles(fs, dirPath) -- survivorFiles).foreach { f =>
      fs.delete(new Path(f), false)
    }

    // ---- write the batch, catalog only the new files ----
    batch.write.mode("append").parquet(dir)
    val newFiles = (dataFiles(fs, dirPath) -- survivorFiles).toSeq.sorted
    val stats =
      if (newFiles.isEmpty) None
      else Some(Manifest.buildWithBlooms(
          spark, dir, cols, bloomCols, expectedPerFile, fpp,
          files = Some(newFiles))
        .withColumn("batch_id", lit(batchId)))

    // ---- publish: staged write + rename (crash-safe) ----
    val next = (survivors, stats) match {
      case (Some(s), Some(n)) => s.unionByName(n)
      case (Some(s), None)    => s
      case (None, Some(n))    => n
      case (None, None)       => return
    }
    val mfs = fsOf(spark, manifestDir)
    val live = new Path(manifestDir)
    val stage = new Path(manifestDir + ".stage")
    if (mfs.exists(stage)) mfs.delete(stage, true)
    // the stage write executes the plan while the live manifest it
    // reads still exists; only then is live swapped out
    next.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    if (mfs.exists(live)) mfs.delete(live, true)
    mfs.rename(stage, live)
  }

  /** Snapshot-as-of read: the table as it stood after `maxBatchId`
    * committed. Falls out of the design for free — data files are
    * immutable once their batch commits and the manifest records the
    * writing batch, so a snapshot is just the manifest rows with
    * `batch_id <= maxBatchId` (the table-format time-travel feature,
    * without the table format). Compaction invalidates history the
    * same way it invalidates the manifest — snapshot reads are for
    * the uncompacted ingest log.
    */
  def readAsOf(spark: SparkSession, manifestDir: String, maxBatchId: Long): DataFrame = {
    val m = readManifest(spark, manifestDir).getOrElse(
      throw new IllegalStateException(s"no manifest at $manifestDir — nothing committed"))
    val files = m.filter(col("batch_id") <= maxBatchId)
      .select("file").collect().map(_.getString(0))
    require(files.nonEmpty, s"no batch <= $maxBatchId has committed at $manifestDir")
    spark.read.parquet(files.toSeq: _*)
  }

  /** Incremental (change-feed) read: only the rows ingested by
    * batches in `(sinceBatchId, untilBatchId]` — the downstream-
    * consumer surface the manifest's batch column provides for free.
    * An ETL that materialized through batch N resumes with
    * `readChangesSince(N)` and touches ONLY the new files — no
    * full-table diff, no re-scan of history — then records the new
    * high batch id (read it off [[latestBatchId]]). Append-only
    * change feed: this sink never rewrites rows, so "changes" are
    * inserts; compaction invalidates the feed exactly as it
    * invalidates snapshots.
    *
    * Returns an empty (correctly-schemed) frame when no newer batch
    * has committed.
    */
  def readChangesSince(
      spark: SparkSession,
      manifestDir: String,
      sinceBatchId: Long,
      untilBatchId: Long = Long.MaxValue): DataFrame = {
    val m = readManifest(spark, manifestDir).getOrElse(
      throw new IllegalStateException(s"no manifest at $manifestDir — nothing committed"))
    val all = m.select("file", "batch_id").collect()
    val files = all.filter(r =>
      r.getLong(1) > sinceBatchId && r.getLong(1) <= untilBatchId)
      .map(_.getString(0))
    if (files.isEmpty)
      spark.read.parquet(all.head.getString(0)).limit(0)
    else spark.read.parquet(files.toSeq: _*)
  }

  /** The highest committed batch id — the cursor an incremental
    * consumer persists between [[readChangesSince]] calls.
    */
  def latestBatchId(spark: SparkSession, manifestDir: String): Long =
    readManifest(spark, manifestDir).getOrElse(
        throw new IllegalStateException(s"no manifest at $manifestDir — nothing committed"))
      .agg(max(col("batch_id"))).head.getLong(0)

  /** Start the streaming sink: every micro-batch lands in `dir` with
    * its manifest entries committed in the same appendBatch call.
    */
  def sink(
      stream: DataFrame,
      dir: String,
      manifestDir: String,
      cols: Seq[String],
      bloomCols: Seq[String],
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, dir, manifestDir, cols, bloomCols, batchId)
      }
      .start()

  /** [[sink]] with a per-batch quality gate — the streaming form of
    * [[Wap]]: a micro-batch that violates any rule beyond
    * `maxViolations` is diverted WHOLE to
    * `rejectDir/batch_id=<id>` (idempotent partition overwrite, the
    * same replay discipline as every dead-letter in the catalog) and
    * never touches the table or its manifest; a clean batch appends
    * under the usual manifest transaction. The audit is one bounded
    * aggregate over the micro-batch — batches are small by
    * construction, so a dedicated pass here costs what the
    * [[graft.operators.Profile.observeExpectations]] zero-pass trick
    * saves on full-corpus writes.
    *
    * Batch-grain rejection is the deliberate policy (not row-grain):
    * a poisoned batch usually means an upstream fault, and shipping
    * its "clean-looking" rows while quarantining the rest hides the
    * fault from the operator who must replay it.
    */
  def auditedSink(
      stream: DataFrame,
      dir: String,
      manifestDir: String,
      cols: Seq[String],
      bloomCols: Seq[String],
      checkpoint: String,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      rejectDir: String,
      maxViolations: Long = 0L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val audited = graft.operators.Materialize(batch)
        val bad = graft.operators.Profile.checkExpectations(audited, rules)
          .filter(col("n_violations") > maxViolations)
          .limit(1).count() > 0
        if (bad)
          audited.withColumn("batch_id", lit(batchId))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(rejectDir)
        else
          appendBatch(audited, dir, manifestDir, cols, bloomCols, batchId)
      }
      .start()
}
