package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Closed-crawl-loop scale probe (round-19 verdict task 1):
  * `q_stream_crawl_loop`'s self-feeding frontier→fetch→extract→
  * re-seed cascade ([[graft.streaming.FrontierStream.stream]] with
  * `selfFeed`) driven over the SAME multi-host WARC+CDX link-lattice
  * fixture at 1×/10×/100× sf0.1 documents. The lattice depth is
  * `(doc_id/5) % 4` by construction, so the cascade is ALWAYS
  * 6 micro-batches (4 landing depths + the capture-less-ghost tick +
  * the terminating empty tick) — scaling moves rows-per-tick, not
  * tick count, which is exactly what makes per-TICK cost the right
  * exponent to record.
  *
  * Measured per run:
  *  - per-batch `triggerExecution` durations (from `recentProgress`)
  *    and the drained-cascade wall time;
  *  - seen-SURT state growth: rows per `batch_id` partition + state
  *    dir bytes (the anti-join's shuffled side — must scale with the
  *    frontier, never with payload bytes);
  *  - FileReplay staging accumulation: replay dir bytes at drain
  *    (the published batch dirs are never deleted mid-stream — this
  *    is the disk the loop leaks per cascade if unbounded);
  *  - storage boundedness: max persistent-RDD count sampled at 100 ms
  *    during the drive, and the count after drain (frontierBatch
  *    hard-releases its fetch + frontier cuts per batch — r17/r18
  *    cycling-loop discipline; flat max ⇒ per-batch cuts die with
  *    their batch).
  *
  * Fixture is memoized ON DISK per corpus dir (multi-GB at 100× —
  * the first JVM builds, later JVMs reuse; CLAUDE.md crawl-fixture
  * note: warm-min across ≥3 fresh JVMs, the archive leaves the page
  * cache between JVMs).
  *
  * `runMain graft.ScaleProbeCrawlLoop <corpusDir> <tag> [reps]` with
  * `SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=<sized-to-data>`.
  */
object ScaleProbeCrawlLoop {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val tag = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.get()

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text")
    val fixDir = s"/tmp/graft_crawlfix_$tag"
    if (!Files.exists(Paths.get(fixDir, "_built"))) {
      Files.createDirectories(Paths.get(fixDir))
      val t0 = System.nanoTime()
      TextQueries.muxWarcCdxGz(docs, fixDir, multiHost = true,
        plantLinks = true)
      Files.write(Paths.get(fixDir, "_built"), Array.empty[Byte])
      println(f"[probe] fixture built ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        s" bytes=${duBytes(fixDir)}")
    } else println(s"[probe] fixture reused bytes=${duBytes(fixDir)}")

    val sess = spark
    import sess.implicits._
    val robots = Seq(
      ("s0.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 0.5\n\n" +
          "User-agent: *\nDisallow: /\n"),
      ("s1.graft.test",
        "User-agent: graftbot/1.0\nDisallow: /doc/1\nCrawl-delay: 1\n"),
      ("s2.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 1.5\n"),
      ("s3.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val k = (col("doc_id") % 5).cast("string")
    val id = col("doc_id").cast("string")
    val own = concat(lit("https://s"), k, lit(".graft.test/doc/"), id)
    val seeds = docs.filter(floor(col("doc_id") / 5) % 4 === 0)
      .select(own.as("url"))

    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)

    (1 to reps).foreach { rep =>
      val (cdx, _) = graft.sources.Cdx.readWithRejects(spark, fixDir + "/*.cdx")
      val plan = graft.operators.Materialize(graft.sources.Cdx.fetchPlan(cdx)
        .select(graft.operators.Urls.surt(col("url")).as("__psurt"),
          col("warc_file"), col("offset"), col("length")))
      val stateDir = graft.streaming.Scratch.tmpDir(s"graft_pcl_state_$rep")
      val recsDir = graft.streaming.Scratch.tmpDir(s"graft_pcl_recs_$rep")
      val replayDir = new graft.streaming.FileReplay(spark, seeds.schema)
      spark.conf.set(key,
        spark.conf.get("spark.graft.streaming.shufflePartitions", "8"))
      replayDir.add(seeds)
      // persistent-RDD high-water monitor: the boundedness claim is
      // about the MAX during the cascade, not just the end state
      @volatile var maxPersist = 0
      @volatile var stopMon = false
      val mon = new Thread(() => {
        while (!stopMon) {
          maxPersist = math.max(maxPersist,
            spark.sparkContext.getPersistentRDDs.size)
          Thread.sleep(100L)
        }
      })
      mon.setDaemon(true); mon.start()
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      val t0 = System.nanoTime()
      try {
        q = graft.streaming.FrontierStream.stream(
          replayDir.stream, "url", stateDir, recsDir,
          robots, "host", "body", "graftbot/1.0", plan, fixDir,
          graft.streaming.Scratch.ckptDir(), selfFeed = Some(replayDir))
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        stopMon = true
        val after = spark.sparkContext.getPersistentRDDs.size
        val ticks = q.recentProgress.toSeq.map { p =>
          (p.batchId, p.durationMs.getOrDefault("triggerExecution", -1L))
        }.filter(_._2 >= 0)
        println(f"[probe] ${tag}_r$rep wall $wall%.2f s ticks=" +
          ticks.map { case (b, ms) => s"$b:${ms}ms" }.mkString(","))
        val landed = graft.streaming.FrontierStream
          .readFetched(spark, recsDir)
          .filter(col("warc_type") === "response").count()
        val stateRows = graft.streaming.FrontierStream
          .readSeen(spark, stateDir)
          .groupBy("batch_id").count().orderBy("batch_id")
          .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}")
        println(s"[probe] ${tag}_r$rep landed=$landed " +
          s"state=[${stateRows.mkString(",")}] stateBytes=${duBytes(stateDir)} " +
          s"replayBytes=${duBytes(replayDir.dir)} " +
          s"persistMax=$maxPersist persistAfter=$after")
      } finally {
        stopMon = true
        if (q != null) q.stop()
        spark.conf.set(key, old)
        // hard: soft release is a local-mode no-op and reps would
        // each leak one plan cut (persistAfter climbed 2 per rep)
        graft.operators.Materialize.releaseHard(plan)
      }
      System.gc()
    }
    spark.stop()
  }

  private def duBytes(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0L
    else Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
  }
}
