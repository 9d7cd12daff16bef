package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming index-first crawl ingest — the incremental form of the
  * CDX fetch loop ([[graft.sources.Cdx.fetchPlan]] →
  * [[graft.sources.Warc.fetchRanged]]): CDX index lines arrive as a
  * stream (new index shards are published continuously during a
  * crawl), each micro-batch plans ONLY content digests never fetched
  * before, dereferences exactly those byte ranges from the segment
  * files, and lands the parsed records under a `batch_id`-partitioned
  * directory (the [[graft.sources.Warc.stream]] landing discipline).
  *
  * State is the fetched-digest set, held in a TABLE rather than the
  * executor state store ([[NearDupGate]]'s reasoning: a crawl's
  * digest set is corpus-sized, and the membership check is a
  * broadcast-or-shuffle anti-join, not a per-key lookup). Exactly
  * once: fetched records land under the MANIFEST TRANSACTION
  * ([[graft.sources.ManifestedSink.appendBatch]] — the
  * [[graft.sources.Warc.landBatch]] discipline: a re-delivered batch
  * sweeps its prior attempt's files before re-applying, crash
  * orphans are invisible to the committed read, and consumers get
  * `record_id`-bloom + `target_uri`/`warc_type`-zone pruned point
  * reads over the fetched table); digest state keeps the
  * `batch_id`-partition dynamic-overwrite discipline (append-only
  * metadata, no point-read consumers). A replayed batch must not
  * anti-join against its OWN committed digests, so state reads
  * filter to strictly earlier batches.
  *
  * Scale shape per batch: parse is column arithmetic; the anti-join
  * shuffles index METADATA only (one row per capture — payload bytes
  * never enter any shuffle); the in-batch dedup is the fetchPlan
  * aggregate; the fetch is POLITENESS-SCHEDULED when host delays are
  * supplied (round 16): the plan runs through
  * [[graft.sources.Cdx.schedule]] and dereferences per host in slot
  * order ([[graft.sources.Warc.fetchScheduled]] — one task per host,
  * ascending `(warc_file, offset)` within it), so the loop APPLIES
  * the politeness it advertises; with no declared delays it keeps
  * the by-file I/O-optimal order. A batch of
  * already-seen digests costs one metadata join and zero I/O — the
  * bandwidth property that makes index-first ingestion worth it.
  */
object CdxFetchStream {

  private val digestSchema: StructType = StructType(Seq(
    StructField("digest", StringType),
    StructField("batch_id", LongType)))

  /** Fetched-digest state: `(digest, batch_id)`, empty before the
    * first commit.
    */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    // schema declared, not inferred — drops the per-micro-batch
    // footer-sampling round-trip (round 19; the NearDupGate.readState
    // rationale)
    try spark.read.schema(digestSchema).parquet(stateDir)
      .select(col("digest"), col("batch_id").cast("long"))
    catch {
      case _: org.apache.spark.sql.AnalysisException => // no state yet
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], digestSchema)
    }

  /** One micro-batch step: parse `lines`, plan the never-seen-before
    * 200-status digests, and — when a `hostDelays` table is supplied
    * — SCHEDULE the plan politely ([[graft.sources.Cdx.schedule]]:
    * per-host slots spaced by the declared `Crawl-delay`s, hosts
    * absent from the table at 0 spacing) and fetch in slot order per
    * host ([[graft.sources.Warc.fetchScheduled]]). With NO delay
    * table there is nothing to be polite about, and the batch keeps
    * [[graft.sources.Warc.fetchRanged]]'s by-file ascending-offset
    * order (one open per segment — the host-keyed order would reopen
    * shared segments once per host run for zero benefit). Records
    * land under `recordsDir/batch_id=<id>` and the newly fetched
    * digests under `stateDir/batch_id=<id>`. Returns the landed
    * record count (the driver-side progress signal). Deterministic
    * given batch contents + prior state; idempotent under replay of
    * the same `batchId`. The landed schema is identical on both
    * paths — schedule provenance columns are consumed by the
    * fetcher's ordering and dropped before the manifest transaction.
    */
  def fetchBatch(
      lines: DataFrame,
      batchId: Long,
      stateDir: String,
      recordsDir: String,
      baseDir: String,
      maxPayloadBytes: Int = 16 << 20,
      hostDelays: Option[DataFrame] = None,
      paceWallClock: Boolean = false): Long = {
    val spark = lines.sparkSession
    val (records, _) = graft.sources.Cdx.parseLines(lines)
    val seen = readState(spark, stateDir)
      .filter(col("batch_id") < batchId)
      .select("digest")
    val fresh = records.filter(col("status") === 200)
      .join(seen, Seq("digest"), "left_anti")
    val plan = graft.operators.Materialize(hostDelays match {
      case Some(dl) =>
        // the delay table is host-cardinality — broadcast by construction
        graft.sources.Cdx.schedule(
          graft.sources.Cdx.fetchPlan(fresh)
            .withColumn("host", graft.operators.Urls.host(col("url")))
            .join(broadcast(dl), Seq("host"), "left"),
          "host", "delay_s", orderCols = Seq("warc_file", "offset"))
      case None => graft.sources.Cdx.fetchPlan(fresh)
    })
    try {
      val (recs, _) = hostDelays match {
        case Some(_) => graft.sources.Warc.fetchScheduled(
          spark, plan, baseDir, maxPayloadBytes, paceWallClock)
        // no declared delays — nothing to be polite ABOUT: keep
        // fetchRanged's by-file ascending-offset order (one open per
        // segment; the host-keyed order would reopen shared segments
        // once per host run for zero politeness benefit)
        case None =>
          graft.sources.Warc.fetchRanged(spark, plan, baseDir, maxPayloadBytes)
      }
      try graft.sources.ManifestedSink.appendBatch(
        recs.select(graft.sources.Warc.recordSchema.fieldNames.map(col).toSeq: _*)
          .withColumn("batch_id", lit(batchId)),
        recordsDir, graft.sources.Warc.manifestDir(recordsDir),
        cols = Seq("target_uri", "warc_type"),
        bloomCols = Seq("record_id"),
        batchId = batchId)
      // the landing fully consumed the fetch output; releaseHard finds
      // the fetch's internal Materialize cut through the derived
      // frame's LogicalRDD leaf, so a cycling loop doesn't accrue one
      // local-mode fetch frame per micro-batch (r17 advice)
      finally graft.operators.Materialize.releaseHard(recs)
      plan.select(col("digest")).withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(stateDir)
      graft.sources.Warc.readRecords(spark, recordsDir)
        .filter(col("batch_id") === batchId).count()
      // batch-scoped cut: the state write above was its last read
    } finally graft.operators.Materialize.releaseHard(plan)
  }

  /** The streaming loop: watch a micro-batched line stream and run
    * [[fetchBatch]] per batch.
    */
  def stream(
      lines: DataFrame,
      stateDir: String,
      recordsDir: String,
      baseDir: String,
      checkpointDir: String,
      hostDelays: Option[DataFrame] = None,
      paceWallClock: Boolean = false): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        fetchBatch(b, id, stateDir, recordsDir, baseDir,
          hostDelays = hostDelays, paceWallClock = paceWallClock)
        ()
      }
      .start()
}
