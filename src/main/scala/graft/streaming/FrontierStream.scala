package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** STREAMING CRAWL FRONTIER (round 17 — the round-16 verdict's
  * missing item 2): [[graft.operators.Frontier.build]] run as a
  * continuously-cycling loop. Discovered URLs arrive as a stream
  * (sitemap expansions, link extractions — whatever the discovery
  * side emits); each micro-batch canonicalizes/dedups the batch's
  * seeds, anti-joins the PERSISTENT seen-SURT state (everything
  * scheduled by ANY earlier batch, plus the pre-crawl state), gates
  * through robots, lays the survivors out politely, resolves them
  * against the capture index, fetches in per-host slot order, and
  * commits BOTH the landed records and the batch's newly-scheduled
  * SURTs — so a URL discovered in batch N is fetched IN batch N and a
  * re-discovery in batch N+k is one anti-join hit, never a refetch.
  *
  * State discipline is [[graft.streaming.CdxFetchStream]]'s, which is
  * [[NearDupGate]]'s: the seen-SURT set is a TABLE (crawl-sized, so a
  * shuffled anti-join, not a per-key state store), committed as a
  * full overwrite of the explicit `batch_id=<id>` partition path
  * (idempotent under replay; an empty batch leaves a typed zero-row
  * shell), and reads filter to STRICTLY EARLIER batches so a replayed
  * batch never anti-joins its own prior attempt. Records land under
  * the manifest transaction ([[graft.sources.ManifestedSink]]) with
  * the politeness provenance columns (`host, slot, not_before_s,
  * fetch_seq`) kept — the `fetch_seq == slot` contract stays
  * auditable per batch.
  *
  * SCHEDULED-RECENTLY semantics, declared (round 18 — was
  * scheduled-ONCE through round 17): the state records every SURT the
  * frontier ADMITTED (robots-allowed, not blocked by a live entry),
  * whether or not the capture index resolved it — a real crawler
  * attempts the fetch and records the attempt; an unresolved URL here
  * is the 404 analog. An entry BLOCKS re-admission only while its
  * batch-id age is within the caller's `recrawlAfterBatches` TTL
  * (default `-1` = forever, the old scheduled-once behavior) and the
  * seed doesn't declare a NEWER sitemap `<lastmod>` than the one
  * recorded at scheduling time — see [[frontierBatch]]. Robots-GATED
  * URLs are NOT state: a later robots change (or a later batch with a
  * different rule set) may admit them.
  *
  * Scale shape per batch: batch-sized dedup aggregate, one anti-join
  * shuffling SURT keys only, broadcast robots, per-host window, and
  * the fetch's per-host serial lanes — metadata shuffles throughout;
  * payload bytes only inside fetch tasks and the landing write.
  */
object FrontierStream {

  private val seenSchema: StructType = StructType(Seq(
    StructField("surt", StringType),
    StructField("batch_id", LongType),
    StructField("lastmod", StringType)))

  /** Landed-records schema: the scheduled fetch's provenance columns
    * plus the landing batch id.
    */
  val fetchedSchema: StructType =
    graft.sources.Warc.scheduledRecordSchema.add("batch_id", LongType)

  /** Seen-SURT state: `(surt, batch_id, lastmod)`, empty before the
    * first commit. `lastmod` (round 18) is the sitemap-declared
    * modification stamp the frontier saw WHEN IT SCHEDULED the URL
    * (null when the seed carried none, and for every pre-round-18
    * state file — the declared-schema read fills the missing column
    * with nulls, so old state dirs stay consumable).
    */
  def readSeen(spark: SparkSession, stateDir: String): DataFrame =
    try spark.read
      // schema declared, not inferred: pre-round-18 state files lack
      // the lastmod column (null-filled under a declared schema), and
      // `batch_id` is the partition-path column
      .schema(StructType(Seq(
        StructField("surt", StringType),
        StructField("lastmod", StringType),
        StructField("batch_id", LongType))))
      .parquet(stateDir)
      .select(col("surt"), col("batch_id").cast("long"), col("lastmod"))
    catch {
      case _: org.apache.spark.sql.AnalysisException => // no state yet
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], seenSchema)
    }

  /** Pre-crawl state seeding: SURTs fetched before this stream
    * existed, committed under `batch_id=-1` (strictly earlier than
    * every real batch), with their lastmod when `lastmodCol` is given.
    */
  def seedSeen(fetched: DataFrame, surtCol: String, stateDir: String,
      lastmodCol: String = ""): Unit = {
    val lm = if (lastmodCol.isEmpty) lit(null).cast(StringType)
             else col(lastmodCol).cast(StringType)
    fetched.select(col(surtCol).as("surt"), lm.as("lastmod"))
      .write.mode("overwrite").parquet(s"$stateDir/batch_id=-1")
  }

  /** Committed view of the landed records (manifest truth — crash
    * orphans invisible), with the politeness provenance columns.
    */
  def readFetched(spark: SparkSession, recordsDir: String): DataFrame =
    graft.sources.ManifestedSink.readManifest(
        spark, graft.sources.Warc.manifestDir(recordsDir)) match {
      case Some(m) =>
        val files = m.select("file").collect().map(_.getString(0)).toSeq
        spark.read.schema(fetchedSchema).parquet(files: _*)
      case None =>
        spark.read.schema(fetchedSchema).parquet(recordsDir)
    }

  /** One micro-batch of the loop: seeds → frontier (vs prior state) →
    * index resolution → polite scheduled fetch → manifest landing +
    * state commit. Returns the number of frontier rows scheduled
    * (fetched or index-unresolved) this batch.
    *
    * `capturePlan` is the SURT-keyed capture index:
    * `(__psurt, warc_file, offset, length)` — a
    * [[graft.sources.Cdx.fetchPlan]] projection with
    * `Urls.surt(url)` as `__psurt`. Pass it pre-[[graft.operators
    * .Materialize]]d when driving many batches: it re-evaluates per
    * batch otherwise.
    *
    * LINK DISCOVERY (round 18 — closes the fetch → extract → frontier
    * cycle): with `discover` set, the batch's fetched HTTP-200
    * `text/html` pages run [[graft.operators.Frontier
    * .discoveredLinks]] (hrefs resolved absolute against each page's
    * own URI) and the callback receives the `(url, src_url)` frame —
    * [[stream]] feeds it back as the NEXT batch's seeds. The callback
    * must CONSUME the frame before returning (it reads the batch's
    * fetch cut, which is hard-released right after).
    *
    * RE-CRAWL FRESHNESS (round 18 — the scheduled-once state gains a
    * re-admission policy; semantics now SCHEDULED-RECENTLY): a state
    * entry blocks its SURT only while
    *
    *  - its batch-id age is within `recrawlAfterBatches` (a TTL in
    *    batch ids; `-1` = forever, the pre-round-18 scheduled-once
    *    behavior), AND
    *  - the seed does not DECLARE itself newer: with `lastmodCol`
    *    set (sitemap `<lastmod>` via [[graft.operators.Frontier
    *    .sitemapPageEntries]]), a seed whose lastmod string-compares
    *    GREATER than the one recorded when the SURT was last
    *    scheduled re-admits early. Comparisons are string-order on
    *    the W3C datetime forms (correct within one site's chosen
    *    precision); a null on either side never re-admits — a crawler
    *    with no freshness signal must not refetch-storm.
    *
    * A re-admitted SURT gets a new state entry at THIS batch (its
    * latest entry is what future blocks compare against).
    */
  def frontierBatch(
      seeds: DataFrame,
      urlCol: String,
      batchId: Long,
      stateDir: String,
      recordsDir: String,
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String,
      capturePlan: DataFrame,
      baseDir: String,
      maxPayloadBytes: Int = 16 << 20,
      paceWallClock: Boolean = false,
      discover: Option[DataFrame => Unit] = None,
      recrawlAfterBatches: Long = -1L,
      lastmodCol: String = ""): Long = {
    val spark = seeds.sparkSession
    val state = readSeen(spark, stateDir)
      .filter(col("batch_id") < batchId)
    val ttlLive =
      if (recrawlAfterBatches < 0L) state
      else state.filter(col("batch_id") >= batchId - recrawlAfterBatches)
    // per-surt seed lastmod (max across listings — deterministic)
    val seedLm =
      if (lastmodCol.isEmpty) None
      else Some(seeds
        .select(graft.operators.Urls.surt(col(urlCol)).as("surt"),
          col(lastmodCol).cast("string").as("__lm"))
        .filter(col("surt") =!= "")
        .groupBy("surt").agg(max(col("__lm")).as("__lm")))
    val seen = seedLm match {
      case None => ttlLive.select("surt")
      case Some(lm) =>
        // the LATEST live entry per surt carries the lastmod the
        // freshness rule compares against (one entry per (surt,
        // batch) by construction, so the struct max is exact)
        ttlLive
          .groupBy("surt")
          .agg(max(struct(col("batch_id"), col("lastmod")))
            .getField("lastmod").as("__slm"))
          .join(lm, Seq("surt"), "left")
          .filter(!(col("__lm").isNotNull && col("__slm").isNotNull &&
            col("__lm") > col("__slm")))
          .select("surt")
    }
    // the scheduled count rides the frontier materialization as an
    // observe metric (round 18, the dashboard-inc micro-job
    // discipline: a separate count() job per tick is pure overhead —
    // CollectMetrics populates under localCheckpoint with no listener
    // and no extra job); non-local Materialize modes run the cut
    // through their own execution, so keep the exact count fallback
    // job labels (guide-style setJobDescription): the replay's ~16
    // micro-jobs per tick were unattributable in the UI/profilers —
    // every one inherited the stream-start call site
    val sc = spark.sparkContext
    def labeled[A](tag: String)(f: => A): A = {
      sc.setJobDescription(s"frontierBatch[$batchId]: $tag")
      try f finally sc.setJobDescription(null)
    }
    val built = graft.operators.Frontier.build(
      seeds, urlCol, seen, "surt", robots, hostCol, bodyCol, agent)
      .observe("graft_frontier_n", count(lit(1)).as("n"))
    val frontier = labeled("frontier cut") {
      graft.operators.Materialize(built)
    }
    def frontierCount(): Long = {
      val mm = built.queryExecution.observedMetrics
      if (mm.isEmpty) frontier.count()
      else mm.values.head.getAs[Long]("n")
    }
    try {
      val resolved = frontier.join(capturePlan,
          frontier("surt") === capturePlan("__psurt"))
        .select("warc_file", "offset", "length", "host", "slot",
          "not_before_s")
      val (recs, _, releaseFetch) = labeled("fetch cut") {
        graft.sources.Warc.fetchScheduledReleasable(
          spark, resolved, baseDir, maxPayloadBytes, paceWallClock)
      }
      try {
        labeled("manifest landing") { graft.sources.ManifestedSink.appendBatch(
          recs.select(graft.sources.Warc.scheduledRecordSchema
              .fieldNames.map(col).toSeq: _*)
            .withColumn("batch_id", lit(batchId)),
          recordsDir, graft.sources.Warc.manifestDir(recordsDir),
          cols = Seq("target_uri", "warc_type"),
          bloomCols = Seq("record_id"),
          batchId = batchId) }
        discover.foreach { f =>
          val parts = graft.sources.Warc.httpParts(
            recs.filter(col("warc_type") === "response"))
          val pages = parts.filter(col("http_status") === 200 &&
            col("http_content_type").startsWith("text/html"))
          // redirects re-enter the frontier too (round 18): a 3xx's
          // Location — relative forms included, RFC 7231 §7.1.2 —
          // resolves against the REQUEST URI exactly like an href;
          // the seen-SURT state caps chains and loops the same way it
          // caps link cycles (each hop is one batch, one state entry)
          val redirects = parts
            .filter(col("http_status").between(300, 399) &&
              col("http_location") =!= "")
            .select(
              graft.operators.Urls.resolve(
                col("target_uri").cast("string"),
                col("http_location")).as("url"),
              col("target_uri").cast("string").as("src_url"))
            .filter(col("url") =!= "")
          labeled("link discovery") {
            f(graft.operators.Frontier.discoveredLinks(
              pages, "target_uri", "http_body").union(redirects))
          }
        }
      }
      // the landing (and discovery) fully consumed the fetch cut; drop
      // its blocks in EVERY Materialize mode (r17 advice: a cycling
      // loop otherwise accrues one local-mode fetch frame per batch)
      finally releaseFetch()
      // scheduled-recently state: the admitted frontier, resolved or
      // not — explicit-partition-path commit (idempotent, empty-safe),
      // carrying the seed lastmod the freshness rule will compare
      val stateRows = seedLm match {
        case None => frontier.select(col("surt"),
          lit(null).cast(StringType).as("lastmod"))
        case Some(lm) => frontier.select("surt")
          .join(lm, Seq("surt"), "left")
          .select(col("surt"), col("__lm").as("lastmod"))
      }
      // One file per batch (the BudgetGate state discipline): readSeen
      // merges every batch's files forever, so per-shuffle-partition
      // near-empty shards compound the state dir's file count — and
      // each extra file is a commit-protocol rename on the state FS
      // per tick. SURT keys are ~9 B/row parquet-compressed (the
      // round-19 crawl-loop probe: 3.8 MB at the 100× point), so one
      // file per batch stays well inside the healthy size band.
      labeled("state commit") {
        stateRows.coalesce(1)
          .write.mode("overwrite").parquet(s"$stateDir/batch_id=$batchId")
      }
      frontierCount()
      // hard release (batch-scoped): the state write was the last read
    } finally graft.operators.Materialize.releaseHard(frontier)
  }

  /** The streaming loop: a micro-batched seed-URL stream cycling
    * through [[frontierBatch]].
    *
    * `selfFeed` CLOSES THE CRAWL LOOP (round 18): pass the
    * [[FileReplay]] whose `.stream` (projected to `urlCol`) is the
    * `seeds` argument, and each batch's discovered links
    * ([[frontierBatch]]'s `discover` hook) publish back into the
    * replay source as the next micro-batch's seeds — fetch → extract
    * → frontier, cycling until a batch discovers nothing new
    * ([[FileReplay.addIfNonEmpty]] skips the empty publish, so the
    * cascade terminates; the seen-SURT state guarantees it shrinks).
    * One `processAllAvailable()` then drains the whole reachable
    * closure: external seed batches are BFS depth 0, their pages'
    * links land at depth 1, and a page's `batch_id` is its discovery
    * depth. Robots-gated URLs never fetch, so they never expand;
    * re-discoveries die in the state anti-join.
    */
  def stream(
      seeds: DataFrame,
      urlCol: String,
      stateDir: String,
      recordsDir: String,
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String,
      capturePlan: DataFrame,
      baseDir: String,
      checkpointDir: String,
      paceWallClock: Boolean = false,
      selfFeed: Option[FileReplay] = None,
      recrawlAfterBatches: Long = -1L,
      lastmodCol: String = ""): StreamingQuery =
    seeds.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        frontierBatch(b, urlCol, id, stateDir, recordsDir,
          robots, hostCol, bodyCol, agent, capturePlan, baseDir,
          paceWallClock = paceWallClock,
          discover = selfFeed.map(replay => (links: DataFrame) => {
            replay.addIfNonEmpty(links.select(col("url").as(urlCol)))
            ()
          }),
          recrawlAfterBatches = recrawlAfterBatches,
          lastmodCol = lastmodCol)
        ()
      }
      .start()
}
