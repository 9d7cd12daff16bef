package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls
import graft.sources.Cdx

/** CDX(J) index ingest + SURT keys: field-exact parse, dead-letter
  * reasons, the digest fetch plan, and the SURT transform's
  * canonicalization rules.
  */
class CdxSpec extends SparkSpecBase {

  import spark.implicits._

  test("surt: label reversal, www fold, lowercase, port/fragment drop, query kept") {
    def s(u: String): String =
      Seq(u).toDF("u").select(Urls.surt(col("u"))).head.getString(0)
    assert(s("https://sub.Example.ORG/Path/X?q=1#frag") ===
      "org,example,sub)/path/x?q=1")
    assert(s("http://www.example.com/a/") === "com,example)/a")
    assert(s("https://example.com:443/") === "com,example)")
    assert(s("not a url") === "")
  }

  test("readWithRejects: field-exact parse; malformed lines carry their reason") {
    val d = graft.streaming.Scratch.tmpDir("graft_cdx_spec")
    val lines = Seq(
      Cdx.renderLine("com,example)/a", "20260101120000",
        "https://example.com/a", "text/html", 200, "d1", 321L, 100L,
        "crawl/seg-0.warc.gz"),
      "garbage",
      "com,x)/b 2026bad {\"url\": \"https://x/b\", \"status\": \"200\", \"offset\": \"1\", \"length\": \"2\"}",
      "com,x)/c 20260101120000 {\"status\": \"200\", \"offset\": \"1\", \"length\": \"2\"}")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "cdx-0"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (recs, rejects) = Cdx.readWithRejects(spark, d)
    val r = recs.head
    assert(r.getString(0) === "com,example)/a")
    assert(r.getString(1) === "20260101120000")
    assert(r.getString(2) === "https://example.com/a")
    assert(r.getInt(4) === 200 && r.getString(5) === "d1")
    assert(r.getLong(6) === 321L && r.getLong(7) === 100L)
    assert(r.getString(8) === "crawl/seg-0.warc.gz")
    val reasons = rejects.select("reason").as[String].collect().sorted.toSeq
    assert(reasons === Seq("bad timestamp", "expected 'surt ts {json}'",
      "json missing url"))
  }

  test("fetchPlan: one capture per 200-status digest, (file, offset) minimum, copy counts") {
    val recs = Seq(
      // digest d1: three 200 captures — keep (a.warc, 5)
      ("s1", "t", "u1", "text/html", 200, "d1", 10L, 9L, "b.warc"),
      ("s2", "t", "u2", "text/html", 200, "d1", 10L, 5L, "a.warc"),
      ("s3", "t", "u3", "text/html", 200, "d1", 10L, 7L, "a.warc"),
      // digest d2: one 200 + one 404 (excluded from plan and count)
      ("s4", "t", "u4", "text/html", 200, "d2", 20L, 1L, "c.warc"),
      ("s5", "t", "u5", "text/html", 404, "d2", 20L, 2L, "c.warc")
    ).toDF("surt", "ts", "url", "mime", "status", "digest", "length",
      "offset", "warc_file")
    val plan = Cdx.fetchPlan(recs).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(5))).toMap
    assert(plan("d1") === (("u2", "a.warc", 5L, 3L)))
    assert(plan("d2") === (("u4", "c.warc", 1L, 1L)))
  }

  test("CdxFetchStream: never-seen digests fetch once; cross-batch dups skip; batch replay is idempotent") {
    import graft.sources.Warc
    val dir = graft.streaming.Scratch.tmpDir("graft_cdxf_spec")
    def rec(id: Int): Array[Byte] = {
      val body = s"<html><body>doc $id body text</body></html>"
        .getBytes("UTF-8")
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ body
      Warc.renderRecord("response", s"<urn:uuid:cdxf-$id>",
        s"https://graft.test/doc/$id", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response", http)
    }
    val (bytes, idx) = Warc.gzipMembersIndexed(Seq(rec(1), rec(2), rec(3)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg.warc.gz"), bytes)
    def line(id: Int, i: Int, file: String = "seg.warc.gz"): String =
      Cdx.renderLine(s"test,graft)/doc/$id", "20260101000000",
        s"https://graft.test/doc/$id", "text/html", 200,
        s"digest-$id", idx(i)._2, idx(i)._1, file)
    val stateDir = graft.streaming.Scratch.tmpDir("graft_cdxf_spec_state")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_cdxf_spec_recs")
    import graft.streaming.CdxFetchStream
    // batch 0: docs 1 and 2
    val n0 = CdxFetchStream.fetchBatch(
      Seq(line(1, 0), line(2, 1)).toDF("line"), 0L, stateDir, recsDir, dir)
    assert(n0 === 2L)
    // batch 1: doc 3 (new), doc 1 again (seen — must not re-fetch),
    // and doc 3 duplicated in-batch (planned to one capture)
    val n1 = CdxFetchStream.fetchBatch(
      Seq(line(3, 2), line(1, 0), line(3, 2)).toDF("line"),
      1L, stateDir, recsDir, dir)
    assert(n1 === 1L)
    // committed MANIFEST view (the landing is ManifestedSink-backed)
    def landedUris(): Seq[String] =
      graft.sources.Warc.readRecords(spark, recsDir)
        .select("target_uri").as[String].collect().sorted.toSeq
    val afterOnce = landedUris()
    assert(afterOnce === Seq(1, 2, 3).map(i => s"https://graft.test/doc/$i"))
    // replaying batch 1 (failure recovery) overwrites its own
    // partition — same landed set, no duplicate fetch of doc 1
    // (state reads are strictly-earlier-batch)
    val n1b = CdxFetchStream.fetchBatch(
      Seq(line(3, 2), line(1, 0), line(3, 2)).toDF("line"),
      1L, stateDir, recsDir, dir)
    assert(n1b === 1L)
    assert(landedUris() === afterOnce)
    // with a Crawl-delay table the batch routes through the
    // politeness-scheduled fetch path — same landed schema and rows
    val stateDir2 = graft.streaming.Scratch.tmpDir("graft_cdxf_spec_st2")
    val recsDir2 = graft.streaming.Scratch.tmpDir("graft_cdxf_spec_rc2")
    val delays = Seq(("graft.test", 0.01)).toDF("host", "delay_s")
    val nP = CdxFetchStream.fetchBatch(
      Seq(line(1, 0), line(2, 1), line(3, 2)).toDF("line"),
      0L, stateDir2, recsDir2, dir, hostDelays = Some(delays))
    assert(nP === 3L)
    assert(graft.sources.Warc.readRecords(spark, recsDir2)
      .select("target_uri").as[String].collect().sorted.toSeq ===
      Seq(1, 2, 3).map(i => s"https://graft.test/doc/$i"),
      "the scheduled path lands the identical record set and schema")
  }
}
