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
}
