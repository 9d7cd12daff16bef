package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Warc
import graft.streaming.FrontierStream

/** Streaming frontier loop ([[graft.streaming.FrontierStream]]):
  * cross-batch dedup through the seen-SURT state table, scheduled-once
  * semantics (unresolved URLs are state; robots-gated URLs are not),
  * replay idempotence, and the empty-batch shell discipline.
  */
class FrontierStreamSpec extends SparkSpecBase {

  import spark.implicits._

  private def rec(id: Int): Array[Byte] =
    Warc.renderRecord(
      warcType = "response",
      recordId = s"<urn:uuid:fs-$id>",
      targetUri = s"https://a.test/doc/$id",
      warcDate = "2026-08-15T00:00:00Z",
      contentType = "text/plain",
      payload = s"doc $id".getBytes(StandardCharsets.UTF_8))

  /** Archive + capture plan for docs 0..5 on host a.test. */
  private def fixture(): (String, org.apache.spark.sql.DataFrame) = {
    val d = graft.streaming.Scratch.tmpDir("graft_fstream_spec")
    val (bytes, idx) = Warc.gzipMembersIndexed((0 to 5).map(rec))
    Files.write(Paths.get(d, "seg.warc.gz"), bytes)
    val planDf = (0 to 5).map { i =>
      (s"https://a.test/doc/$i", "seg.warc.gz", idx(i)._1, idx(i)._2)
    }.toDF("u", "warc_file", "offset", "length")
      .select(graft.operators.Urls.surt(col("u")).as("__psurt"),
        col("warc_file"), col("offset"), col("length"))
    (d, planDf)
  }

  private val robots = Seq(("a.test",
    "User-agent: graftbot\nDisallow: /doc/5\nCrawl-delay: 1\n"))
    .toDF("host", "body")

  test("frontierBatch: state anti-join across batches; gated URLs stay out of state; unresolved URLs enter it; replay idempotent; empty batch safe") {
    val (d, plan) = fixture()
    val state = graft.streaming.Scratch.tmpDir("graft_fs_state")
    val recs = graft.streaming.Scratch.tmpDir("graft_fs_recs")
    def run(urls: Seq[String], id: Long): Long =
      FrontierStream.frontierBatch(urls.toDF("url"), "url", id,
        state, recs, robots, "host", "body", "graftbot", plan, d)
    // batch 0: docs 0,1 + doc 5 (robots-gated) + a ghost with no
    // capture (scheduled-once: enters state, lands nothing)
    val n0 = run(Seq("https://a.test/doc/0", "https://a.test/doc/1",
      "https://a.test/doc/5", "https://a.test/ghost"), 0L)
    assert(n0 === 3L, "frontier admits 0, 1, ghost; gates doc 5")
    def landed: Seq[(Long, Long)] = FrontierStream.readFetched(spark, recs)
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("batch_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(landed === Seq((0L, 0L), (1L, 0L)))
    // batch 1: re-sends 0 and the ghost (both in state -> dropped),
    // brings docs 2,3
    val n1 = run(Seq("https://a.test/doc/0", "https://a.test/ghost",
      "https://a.test/doc/2", "https://a.test/doc/3"), 1L)
    assert(n1 === 2L, "only the never-seen 2 and 3 survive")
    assert(landed === Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
    // replay of batch 1 (same id, same seeds): identical end state
    run(Seq("https://a.test/doc/0", "https://a.test/ghost",
      "https://a.test/doc/2", "https://a.test/doc/3"), 1L)
    assert(landed === Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
    // doc 5 was GATED, not scheduled: still eligible if rules change —
    // batch 2 under an allow-all robots fetches it
    val open = Seq(("a.test", "User-agent: graftbot\nCrawl-delay: 1\n"))
      .toDF("host", "body")
    FrontierStream.frontierBatch(
      Seq("https://a.test/doc/5").toDF("url"), "url", 2L,
      state, recs, open, "host", "body", "graftbot", plan, d)
    assert(landed.contains((5L, 2L)))
    // empty batch: typed zero-row state shell, later reads fine
    val n3 = run(Seq.empty[String], 3L)
    assert(n3 === 0L)
    assert(FrontierStream.readSeen(spark, state)
      .filter(col("batch_id") === 3L).count() === 0L)
    // state holds the scheduled-once set (ghost included, 5 included
    // once fetched in batch 2)
    val seen = FrontierStream.readSeen(spark, state)
      .select("surt").as[String].collect().toSet
    assert(seen.contains("test,a)/ghost"))
    assert(seen.contains("test,a)/doc/5"))
    assert(!seen.contains("test,a)/doc/4"), "never seeded")
  }

  /** HTTP-response record whose HTML body carries the given hrefs —
    * the link-discovery fixture (the plain [[rec]] fixture has no
    * HTTP envelope, so httpParts — and with it discovery — skips it).
    */
  private def htmlRec(id: Int, hrefs: Seq[String]): Array[Byte] = {
    val body = ("<html><body>" +
      hrefs.map(h => s"""<a href="$h">l</a>""").mkString +
      s"doc $id</body></html>").getBytes(StandardCharsets.UTF_8)
    val env = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII)
    Warc.renderRecord(
      warcType = "response",
      recordId = s"<urn:uuid:fsl-$id>",
      targetUri = s"https://a.test/doc/$id",
      warcDate = "2026-08-15T00:00:00Z",
      contentType = "application/http; msgtype=response",
      payload = env ++ body)
  }

  test("closed crawl loop: discovered links cascade as later batches; batch_id = BFS depth; gated/junk links never expand; loop terminates") {
    // link graph: 0 -> 1 (relative ../doc/1), 1 -> 2 (root-relative),
    // 2 -> 3 (absolute own-host), 3 -> {4, 5, junk}, 4 -> 0 (a CYCLE —
    // state must end it), 5 robots-gated (never fetched, its link to
    // 4 never discovered — but 3 links 4 directly)
    val d = graft.streaming.Scratch.tmpDir("graft_fsloop_spec")
    val links = Map(
      0 -> Seq("../doc/1"),
      1 -> Seq("/doc/2"),
      2 -> Seq("https://a.test/doc/3"),
      3 -> Seq("/doc/4", "/doc/5", "mailto:x@y", "#top", "javascript:void(0)"),
      4 -> Seq("/doc/0"),
      5 -> Seq("/doc/4"))
    val (bytes, idx) = Warc.gzipMembersIndexed(
      (0 to 5).map(i => htmlRec(i, links(i))))
    Files.write(Paths.get(d, "seg.warc.gz"), bytes)
    val plan = (0 to 5).map { i =>
      (s"https://a.test/doc/$i", "seg.warc.gz", idx(i)._1, idx(i)._2)
    }.toDF("u", "warc_file", "offset", "length")
      .select(graft.operators.Urls.surt(col("u")).as("__psurt"),
        col("warc_file"), col("offset"), col("length"))
    val state = graft.streaming.Scratch.tmpDir("graft_fsloop_state")
    val recs = graft.streaming.Scratch.tmpDir("graft_fsloop_recs")
    val replay = new graft.streaming.FileReplay(
      spark, Seq.empty[String].toDF("url").schema)
    replay.add(Seq("https://a.test/doc/0").toDF("url"))
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = FrontierStream.stream(replay.stream, "url", state, recs,
        robots, "host", "body", "graftbot", plan, d,
        graft.streaming.Scratch.ckptDir(), selfFeed = Some(replay))
      q.processAllAvailable() // drains the WHOLE discovery cascade
    } finally if (q != null) q.stop()
    val landed = FrontierStream.readFetched(spark, recs)
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("batch_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    // batch_id is the BFS depth from the seed; 5 is robots-gated
    assert(landed === Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    // the cycle's re-discovery of 0 (from 4) died in the state
    // anti-join: no batch 5 state shell was even scheduled
    val seen = FrontierStream.readSeen(spark, state)
      .select("surt", "batch_id").as[(String, Long)].collect().toSeq
    assert(seen.map(_._2).max === 4L, "cascade terminated after depth 4")
    assert(!seen.map(_._1).contains("test,a)/doc/5"),
      "gated URL is not scheduled-once state")
  }

  /** 301 record whose Location (possibly relative) points at `to`. */
  private def redirectRec(id: Int, to: String): Array[Byte] = {
    val env = (s"HTTP/1.1 301 Moved Permanently\r\nLocation: $to\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
    Warc.renderRecord(
      warcType = "response",
      recordId = s"<urn:uuid:fsr-$id>",
      targetUri = s"https://a.test/doc/$id",
      warcDate = "2026-08-15T00:00:00Z",
      contentType = "application/http; msgtype=response",
      payload = env)
  }

  test("closed loop follows redirects: a 3xx Location (relative form) re-enters the frontier as the next hop") {
    // 0 is a 301 -> relative "../doc/1"; 1 is a 301 -> absolute
    // /doc/2 target spelled with a case variant host (SURT must fold
    // it); 2 is a real HTML page with no links. Seeding 0 must land
    // all three across three batches (batch_id = hop depth).
    val d = graft.streaming.Scratch.tmpDir("graft_fsred_spec")
    val recs0 = Seq(
      redirectRec(0, "../doc/1"),
      redirectRec(1, "https://A.test:443/doc/2"),
      htmlRec(2, Seq.empty))
    val (bytes, idx) = Warc.gzipMembersIndexed(recs0)
    Files.write(Paths.get(d, "seg.warc.gz"), bytes)
    val plan = (0 to 2).map { i =>
      (s"https://a.test/doc/$i", "seg.warc.gz", idx(i)._1, idx(i)._2)
    }.toDF("u", "warc_file", "offset", "length")
      .select(graft.operators.Urls.surt(col("u")).as("__psurt"),
        col("warc_file"), col("offset"), col("length"))
    val state = graft.streaming.Scratch.tmpDir("graft_fsred_state")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_fsred_recs")
    val replay = new graft.streaming.FileReplay(
      spark, Seq.empty[String].toDF("url").schema)
    replay.add(Seq("https://a.test/doc/0").toDF("url"))
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = FrontierStream.stream(replay.stream, "url", state, recsDir,
        robots, "host", "body", "graftbot", plan, d,
        graft.streaming.Scratch.ckptDir(), selfFeed = Some(replay))
      q.processAllAvailable()
    } finally if (q != null) q.stop()
    val landed = FrontierStream.readFetched(spark, recsDir)
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("batch_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(landed === Seq((0L, 0L), (1L, 1L), (2L, 2L)),
      "each redirect hop lands exactly one batch later")
  }

  test("re-crawl policy: TTL re-admits stale entries; a newer lastmod re-admits early; fresh entries block (r17 verdict task 3)") {
    val (d, plan) = fixture()
    val state = graft.streaming.Scratch.tmpDir("graft_fsrc_state")
    val recs = graft.streaming.Scratch.tmpDir("graft_fsrc_recs")
    val open = Seq(("a.test", "User-agent: graftbot\nCrawl-delay: 1\n"))
      .toDF("host", "body")
    def run(seeds: Seq[(String, String)], id: Long, ttl: Long): Long =
      FrontierStream.frontierBatch(seeds.toDF("url", "lm"), "url", id,
        state, recs, open, "host", "body", "graftbot", plan, d,
        recrawlAfterBatches = ttl, lastmodCol = "lm")
    def landed: Seq[(Long, Long)] = FrontierStream.readFetched(spark, recs)
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("batch_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    // pre-crawl state (batch -1): doc 0 with an old lastmod
    FrontierStream.seedSeen(
      Seq(("test,a)/doc/0", "2026-01-01")).toDF("surt", "lm"),
      "surt", state, lastmodCol = "lm")
    // batch 0: docs 1 (lastmod 01-02) and 2 (lastmod 01-06)
    run(Seq(("https://a.test/doc/1", "2026-01-02"),
      ("https://a.test/doc/2", "2026-01-06")), 0L, ttl = 1L)
    assert(landed === Seq((1L, 0L), (2L, 0L)))
    // batch 1, ttl 1: doc 0's entry (age 2) is stale -> TTL re-admit;
    // doc 1's entry is live but the seed declares a NEWER lastmod ->
    // early re-admit; doc 2's entry is live and the seed's lastmod is
    // OLDER -> blocked
    run(Seq(("https://a.test/doc/0", "2026-01-03"),
      ("https://a.test/doc/1", "2026-01-05"),
      ("https://a.test/doc/2", "2026-01-05")), 1L, ttl = 1L)
    assert(landed === Seq((0L, 1L), (1L, 0L), (1L, 1L), (2L, 0L)))
    // batch 2, ttl -1 (scheduled-once): everything blocked, even with
    // a null-lastmod seed (no freshness signal never refetches)
    run(Seq[(String, String)](("https://a.test/doc/0", null),
      ("https://a.test/doc/1", null), ("https://a.test/doc/2", null)),
      2L, ttl = -1L)
    assert(landed === Seq((0L, 1L), (1L, 0L), (1L, 1L), (2L, 0L)))
    // the re-admitted docs' LATEST entries now carry the new lastmods
    val latest = FrontierStream.readSeen(spark, state)
      .groupBy("surt").agg(max(struct(col("batch_id"), col("lastmod")))
        .getField("lastmod").as("lm"))
      .as[(String, String)].collect().toMap
    assert(latest("test,a)/doc/0") === "2026-01-03")
    assert(latest("test,a)/doc/1") === "2026-01-05")
    assert(latest("test,a)/doc/2") === "2026-01-06")
  }
}
