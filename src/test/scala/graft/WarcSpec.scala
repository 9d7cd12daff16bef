package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.Warc

/** WARC/WET crawl-container ingest: deterministic synthetic archive
  * bytes (the `MiniMqttBroker` discipline — no fixtures fetched,
  * everything rendered in-test), plain and per-record-gzip-member
  * layouts, and the dead-letter split under four malformation modes.
  */
class WarcSpec extends SparkSpecBase {

  import spark.implicits._

  private def rec(id: Int, text: String): Array[Byte] =
    Warc.renderRecord(
      warcType = "conversion",
      recordId = s"<urn:uuid:0000-$id>",
      targetUri = s"https://graft.test/doc/$id",
      warcDate = "2026-08-15T00:00:00Z",
      contentType = "text/plain",
      payload = text.getBytes(StandardCharsets.UTF_8))

  private def tmpFile(name: String, bytes: Array[Byte]): String = {
    val dir = Paths.get(graft.streaming.Scratch.tmpDir("graft_warc_spec"))
    val f = dir.resolve(name)
    Files.write(f, bytes)
    f.toString
  }

  test("plain WARC: records parse with fields, UTF-8 payloads intact") {
    val bytes = rec(1, "hello world") ++ rec(2, "héllo wörld — ünïcode") ++
      rec(3, "")
    val path = tmpFile("a.warc", bytes)
    val (records, rejects) = Warc.readWithRejects(spark, path)
    assert(rejects.count() === 0L)
    val got = records
      .select("target_uri", "payload", "content_length", "warc_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(
      "https://graft.test/doc/1", "https://graft.test/doc/2",
      "https://graft.test/doc/3"))
    assert(got(1)._2 === "héllo wörld — ünïcode")
    assert(got(1)._3 ===
      "héllo wörld — ünïcode".getBytes(StandardCharsets.UTF_8).length.toLong)
    assert(got(2)._2 === "" && got(2)._3 === 0L)
    assert(got.forall(_._4 == "conversion"))
  }

  test("gzip: per-record members AND one whole-file member both decode") {
    val members = Warc.gzipMembers(Seq(rec(10, "ten"), rec(11, "eleven")))
    val whole = Warc.gzipMembers(Seq(rec(10, "ten") ++ rec(11, "eleven")))
    for ((tag, bytes) <- Seq("members" -> members, "whole" -> whole)) {
      val path = tmpFile(s"$tag.warc.gz", bytes)
      val (records, rejects) = Warc.readWithRejects(spark, path)
      assert(rejects.count() === 0L, tag)
      assert(records.select("target_uri").as[String].collect().sorted.toSeq ===
        Seq("https://graft.test/doc/10", "https://graft.test/doc/11"), tag)
    }
  }

  test("dead letters: bad Content-Length / garbage / oversize reject and RESYNC; truncation rejects") {
    val good1 = rec(1, "first good")
    val badLen = new String(rec(2, "bad"), StandardCharsets.ISO_8859_1)
      .replace("Content-Length: 3", "Content-Length: xyz")
      .getBytes(StandardCharsets.ISO_8859_1)
    val garbage = "not a warc record at all\r\nstill not\r\n"
      .getBytes(StandardCharsets.US_ASCII)
    val big = rec(4, "x" * 100)
    val good2 = rec(5, "second good")
    val truncated = rec(6, "will be cut").dropRight(10)
    val bytes = good1 ++ garbage ++ badLen ++ big ++ good2 ++ truncated
    val path = tmpFile("dead.warc", bytes)
    val (records, rejects) = Warc.readWithRejects(spark, path,
      maxPayloadBytes = 64)
    // resync recovers every well-formed record around the dead ones
    assert(records.select("target_uri").as[String].collect().sorted.toSeq ===
      Seq("https://graft.test/doc/1", "https://graft.test/doc/5"))
    val reasons = rejects.select("reason").as[String].collect().toSeq
    assert(reasons.exists(_.contains("bad Content-Length")), reasons)
    assert(reasons.exists(_.contains("expected WARC/ version line")), reasons)
    assert(reasons.exists(_.contains("maxPayloadBytes")), reasons)
    assert(reasons.exists(_.contains("truncated")), reasons)
  }

  test("streaming ingest: drop-dir batches land idempotently; dead letters routed") {
    val drop = graft.streaming.Scratch.tmpDir("graft_warc_sdrop")
    val recs = graft.streaming.Scratch.tmpDir("graft_warc_srecs")
    val rejs = graft.streaming.Scratch.tmpDir("graft_warc_srejs")
    val ckpt = graft.streaming.Scratch.ckptDir("graft_warc_sckpt")
    Files.write(Paths.get(drop, "a.warc.gz"),
      Warc.gzipMembers(Seq(rec(1, "one"), rec(2, "two"))))
    val q = Warc.stream(spark, drop, recs, rejs, ckpt)
    try {
      q.processAllAvailable()
      // batch 2: one good file and one with a dead-letter record
      Files.write(Paths.get(drop, "b.warc.gz"),
        Warc.gzipMembers(Seq(rec(3, "three"))))
      val broken = new String(rec(4, "bad"), StandardCharsets.ISO_8859_1)
        .replace("Content-Length: 3", "Content-Length: zz")
        .getBytes(StandardCharsets.ISO_8859_1)
      Files.write(Paths.get(drop, "c.warc"), rec(5, "five") ++ broken)
      q.processAllAvailable()
    } finally q.stop()
    val out = Warc.readRecords(spark, recs)
    assert(out.select("target_uri").as[String].collect().sorted.toSeq ===
      (Seq(1, 2, 3, 5).map(i => s"https://graft.test/doc/$i")))
    // both micro-batches present as partitions
    assert(out.select("batch_id").distinct().count() === 2L)
    val rj = spark.read.parquet(rejs)
    assert(rj.count() === 1L)
    assert(rj.select("reason").as[String].head.contains("bad Content-Length"))
  }

  test("wetDocuments: conversion records bridge to the documents shape") {
    val bytes = rec(1, "hello world") ++
      Warc.renderRecord("request", "<urn:uuid:req-1>",
        "https://graft.test/doc/1", "2026-08-15T00:00:00Z",
        "application/http", "GET / HTTP/1.1".getBytes(StandardCharsets.UTF_8))
    val path = tmpFile("wet.warc", bytes)
    val (records, _) = Warc.readWithRejects(spark, path)
    val docs = Warc.wetDocuments(records)
    assert(docs.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val row = docs.collect()
    assert(row.length === 1, "non-conversion records are excluded")
    assert(row(0).getString(1) === "hello world")
    assert(row(0).getString(3) === "graft.test")
    assert(row(0).getLong(4) === 11L)
    // id is the deterministic record-id hash
    val expected = spark.sql(
      "SELECT xxhash64('<urn:uuid:0000-1>')").head.getLong(0)
    assert(row(0).getLong(0) === expected)
  }

  test("readPathsWithRejects: comma-and-glob-metachar filenames read as themselves; vanished path is a dead letter") {
    val d = graft.streaming.Scratch.tmpDir("graft_warc_oddnames")
    // a comma-join would split this into two bogus paths; a glob pass
    // would brace-expand / char-class it
    val odd = Seq("seg,a{0}.warc.gz", "seg[1]b*.warc.gz")
    odd.zipWithIndex.foreach { case (name, i) =>
      Files.write(Paths.get(d, name),
        Warc.gzipMembers(Seq(rec(200 + i, s"odd $i"))))
    }
    val paths = odd.map(n => Paths.get(d, n).toString) :+
      (d + "/does-not-exist.warc.gz")
    val (records, rejects) = Warc.readPathsWithRejects(spark, paths)
    assert(records.select("target_uri").as[String].collect().sorted.toSeq ===
      Seq("https://graft.test/doc/200", "https://graft.test/doc/201"))
    val rj = rejects.collect()
    assert(rj.length === 1)
    assert(rj(0).getString(2).startsWith("open failed:"), rj(0).getString(2))
  }

  test("streaming ingest survives comma/brace filenames in the drop dir") {
    val drop = graft.streaming.Scratch.tmpDir("graft_warc_odddrop")
    val recs = graft.streaming.Scratch.tmpDir("graft_warc_oddrecs")
    val rejs = graft.streaming.Scratch.tmpDir("graft_warc_oddrejs")
    val ckpt = graft.streaming.Scratch.ckptDir("graft_warc_oddckpt")
    Files.write(Paths.get(drop, "crawl,part{7}.warc.gz"),
      Warc.gzipMembers(Seq(rec(301, "odd one"))))
    val q = Warc.stream(spark, drop, recs, rejs, ckpt)
    try q.processAllAvailable() finally q.stop()
    val out = Warc.readRecords(spark, recs)
    assert(out.select("target_uri").as[String].collect().toSeq ===
      Seq("https://graft.test/doc/301"))
    assert(spark.read.schema(Warc.rejectSchema.add("batch_id", "long"))
      .parquet(rejs).count() === 0L)
  }

  test("over-long header line: explicit dead letter, later records resync cleanly") {
    val longLine = ("X-Junk: " + "j" * (1 << 16)) + "\r\n"
    val bad = {
      // inject the over-long header INSIDE a record's header block
      val base = new String(rec(7, "pay"), StandardCharsets.ISO_8859_1)
      base.replace("Content-Type: text/plain\r\n",
        "Content-Type: text/plain\r\n" + longLine)
        .getBytes(StandardCharsets.ISO_8859_1)
    }
    val bytes = rec(1, "ok before") ++ bad ++ rec(9, "ok after")
    val path = tmpFile("longline.warc", bytes)
    val (records, rejects) = Warc.readWithRejects(spark, path)
    assert(records.select("target_uri").as[String].collect().sorted.toSeq ===
      Seq("https://graft.test/doc/1", "https://graft.test/doc/9"))
    val reasons = rejects.select("reason").as[String].collect().toSeq
    assert(reasons.exists(_.contains("header line exceeds")), reasons)
  }

  test("manifested landing: a replayed batch rolls back its prior attempt; committed read hides orphans") {
    val d = graft.streaming.Scratch.tmpDir("graft_warc_mf")
    val recs = graft.streaming.Scratch.tmpDir("graft_warc_mfrecs")
    val rejs = graft.streaming.Scratch.tmpDir("graft_warc_mfrejs")
    val f0 = Paths.get(d, "b0.warc.gz")
    Files.write(f0, Warc.gzipMembers(Seq(rec(1, "one"), rec(2, "two"))))
    Warc.landBatch(spark, Seq(f0.toString), 0L, recs, rejs)
    val f1 = Paths.get(d, "b1.warc.gz")
    Files.write(f1, Warc.gzipMembers(Seq(rec(3, "three"))))
    Warc.landBatch(spark, Seq(f1.toString), 1L, recs, rejs)
    assert(Warc.readRecords(spark, recs).count() === 3L)
    // foreachBatch re-delivery: batch 1 replays (same id, same file)
    // — the manifest transaction sweeps the prior attempt's files, so
    // nothing double-lands
    Warc.landBatch(spark, Seq(f1.toString), 1L, recs, rejs)
    val out = Warc.readRecords(spark, recs)
    assert(out.count() === 3L, "replayed batch must not double-land")
    assert(out.select("target_uri").as[String].collect().sorted.toSeq ===
      Seq(1, 2, 3).map(i => s"https://graft.test/doc/$i"))
    // committed view: an uncommitted orphan parquet (a crash between
    // data write and manifest publish) is invisible to readRecords
    val orphanRows = out.limit(1)
    orphanRows.write.mode("append").parquet(recs)
    assert(Warc.readRecords(spark, recs).count() === 3L,
      "readRecords must read the manifest's file list, not the directory")
    // the manifest's change feed: batch 1's rows only
    val changed = graft.sources.ManifestedSink.readChangesSince(
      spark, Warc.manifestDir(recs), sinceBatchId = 0L)
    assert(changed.select("target_uri").as[String].collect().toSeq ===
      Seq("https://graft.test/doc/3"))
  }

  test("httpParts + responseDocuments: envelope split, status/media-type/charset routing, stripHtml bridge") {
    def http(status: String, ct: String, body: String): Array[Byte] =
      (s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" + body)
        .getBytes(StandardCharsets.UTF_8)
    def resp(n: Int, payload: Array[Byte]): Array[Byte] =
      Warc.renderRecord("response", s"<urn:uuid:resp-$n>",
        s"https://site$n.example/p/$n", "2026-08-15T00:00:00Z",
        "application/http; msgtype=response", payload)
    val keepHtml = "<html><body><h1>Keep</h1><p>alpha &amp; beta</p></body></html>"
    val bytes =
      resp(1, http("200 OK", "text/html; charset=utf-8", keepHtml)) ++
      resp(2, http("200 OK", "text/html", "<p>no charset kept</p>")) ++
      resp(3, http("404 Not Found", "text/html; charset=utf-8", "<p>gone</p>")) ++
      resp(4, http("200 OK", "application/json", """{"k":1}""")) ++
      resp(5, http("200 OK", "text/html; charset=iso-8859-1", "<p>latin</p>")) ++
      rec(6, "a WET conversion record, not a response")
    val path = tmpFile("http.warc", bytes)
    val (records, rejects) = Warc.readWithRejects(spark, path)
    assert(rejects.count() === 0L)
    // the split itself, on the kept record
    val parts = Warc.httpParts(records.filter($"warc_type" === "response"))
      .select("record_id", "http_status", "http_content_type", "http_charset",
        "http_body")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    assert(parts("<urn:uuid:resp-1>") ===
      ((200, "text/html; charset=utf-8", "utf-8", keepHtml)))
    assert(parts("<urn:uuid:resp-3>")._1 === 404)
    assert(parts("<urn:uuid:resp-2>")._3 === "", "unspecified charset is empty")
    // the bridge: only 200 + text/html + (utf-8|unset) survive
    val docs = Warc.responseDocuments(records)
    val got = docs.collect().map(r =>
      (r.getString(5), r.getString(1), r.getString(3))).sortBy(_._1)
    assert(got.map(_._1).toSeq ===
      Seq("https://site1.example/p/1", "https://site2.example/p/2"))
    assert(got(0)._2 === "Keep alpha & beta", "markup stripped, entity decoded")
    assert(got(0)._3 === "site1.example")
    // production ids are the record-id hash
    val expected = spark.sql("SELECT xxhash64('<urn:uuid:resp-1>')").head.getLong(0)
    assert(docs.filter($"source" === "site1.example").head.getLong(0) === expected)
  }

  test("charset-faithful HTTP decode: a real latin-1 page survives; undeclared/unknown fall back to utf-8") {
    def http(ct: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
    def resp(n: Int, payload: Array[Byte]): Array[Byte] =
      Warc.renderRecord("response", s"<urn:uuid:cs-$n>",
        s"https://cs$n.example/p", "2026-08-15T00:00:00Z",
        "application/http; msgtype=response", payload)
    val latinHtml = "<html><body>café au résumé</body></html>"
    val bytes =
      // genuinely latin-1-ENCODED body, correctly declared
      resp(1, http("text/html; charset=iso-8859-1",
        latinHtml.getBytes(StandardCharsets.ISO_8859_1))) ++
      // utf-8 body, declared
      resp(2, http("text/html; charset=utf-8",
        "<p>über</p>".getBytes(StandardCharsets.UTF_8))) ++
      // unknown charset declared: falls back to utf-8-replace, never throws
      resp(3, http("text/html; charset=klingon-9",
        "<p>plain ascii</p>".getBytes(StandardCharsets.UTF_8)))
    val path = tmpFile("charset.warc", bytes)
    val (records, rejects) = Warc.readWithRejects(spark, path)
    assert(rejects.count() === 0L)
    // the latin-1 body decoded by its declared charset — é intact
    val docs = Warc.responseDocuments(records,
      keepCharsets = Set("", "utf-8", "iso-8859-1", "klingon-9"))
    val texts = docs.select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("cs1.example") === "café au résumé")
    assert(texts("cs2.example") === "über")
    assert(texts("cs3.example") === "plain ascii")
    // and the default conservative keep set still routes latin-1 out
    assert(Warc.responseDocuments(records).count() === 1L)
  }

  test("multi-file glob parallelism: records carry their source file") {
    val d = graft.streaming.Scratch.tmpDir("graft_warc_many")
    (0 until 4).foreach { i =>
      Files.write(Paths.get(d, s"part-$i.warc.gz"),
        Warc.gzipMembers(Seq(rec(100 + i, s"doc $i"))))
    }
    val (records, rejects) = Warc.readWithRejects(spark, d + "/*.warc.gz")
    assert(rejects.count() === 0L)
    assert(records.count() === 4L)
    assert(records.select("file").distinct().count() === 4L)
  }

  test("fetchRanged: gzipMembersIndexed ranges dereference to exactly their record; bad ranges dead-letter") {
    val d = graft.streaming.Scratch.tmpDir("graft_warc_ranged")
    val recs = (0 until 5).map(i => rec(200 + i, s"ranged doc $i"))
    val (bytes, idx) = Warc.gzipMembersIndexed(recs)
    Files.write(Paths.get(d, "seg.warc.gz"), bytes)
    // member offsets tile the file exactly
    assert(idx.head._1 === 0L)
    assert(idx.sliding(2).forall { case Seq((o1, l1), (o2, _)) => o1 + l1 === o2 })
    assert(idx.last._1 + idx.last._2 === bytes.length.toLong)
    // fetch records 1 and 3 only (out-of-order plan rows: the fetch
    // sorts by offset within the file's partition)
    val plan = Seq(
      ("seg.warc.gz", idx(3)._1, idx(3)._2),
      ("seg.warc.gz", idx(1)._1, idx(1)._2)
    ).toDF("warc_file", "offset", "length")
    val (got, rejects) = Warc.fetchRanged(spark, plan, baseDir = d)
    assert(rejects.count() === 0L)
    val uris = got.select("target_uri").as[String].collect().sorted.toSeq
    assert(uris === Seq("https://graft.test/doc/201", "https://graft.test/doc/203"))
    // a range into the middle of a member and a missing file both
    // dead-letter without failing the healthy row in the same plan
    val bad = Seq(
      ("seg.warc.gz", idx(2)._1 + 3L, idx(2)._2),
      ("nope.warc.gz", 0L, 10L),
      ("seg.warc.gz", idx(0)._1, idx(0)._2)
    ).toDF("warc_file", "offset", "length")
    val (got2, rej2) = Warc.fetchRanged(spark, bad, baseDir = d)
    assert(got2.count() === 1L)
    assert(rej2.count() === 2L)
    assert(got2.select("target_uri").as[String].head ===
      "https://graft.test/doc/200")
  }

  test("fetchScheduled: per-host slot order (fetch_seq == slot), dead letters consume slots, pacing") {
    val d = graft.streaming.Scratch.tmpDir("graft_warc_sched")
    val recs = (0 until 6).map(i => rec(300 + i, s"sched doc $i"))
    val (bytes, idx) = Warc.gzipMembersIndexed(recs)
    Files.write(Paths.get(d, "seg.warc.gz"), bytes)
    // two hosts interleaved over one segment file; slots deliberately
    // NOT in offset order within host b (politeness order must win
    // over archive I/O order), plus a dead-letter range mid-host-a
    val plan = Seq(
      ("seg.warc.gz", idx(0)._1, idx(0)._2, "a.test", 0L, 0.0),
      ("seg.warc.gz", idx(2)._1 + 3L, idx(2)._2, "a.test", 1L, 0.5), // bad
      ("seg.warc.gz", idx(4)._1, idx(4)._2, "a.test", 2L, 1.0),
      ("seg.warc.gz", idx(5)._1, idx(5)._2, "b.test", 0L, 0.0),
      ("seg.warc.gz", idx(1)._1, idx(1)._2, "b.test", 1L, 0.25)
    ).toDF("warc_file", "offset", "length", "host", "slot", "not_before_s")
    val (got, rej) = Warc.fetchScheduled(spark, plan, baseDir = d)
    assert(rej.count() === 1L, "the planted mid-member range dead-letters")
    val rows = got.select("host", "slot", "fetch_seq", "target_uri")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(r => (r._1, r._2)).toSeq
    // fetch_seq == slot for EVERY landed record — including host a's
    // slot-2 row, whose predecessor dead-lettered (failures consume
    // their slot, they don't shift the sequence)
    assert(rows.forall { case (_, slot, seq, _) => slot === seq },
      s"fetch order must equal slot order, got $rows")
    assert(rows.map(_._4) === Seq(
      "https://graft.test/doc/300", "https://graft.test/doc/304",
      "https://graft.test/doc/305", "https://graft.test/doc/301"))
    // wall-clock pacing: 2 ranges 0.3 s apart must take >= 0.3 s
    val paced = Seq(
      ("seg.warc.gz", idx(0)._1, idx(0)._2, "p.test", 0L, 0.0),
      ("seg.warc.gz", idx(1)._1, idx(1)._2, "p.test", 1L, 0.3)
    ).toDF("warc_file", "offset", "length", "host", "slot", "not_before_s")
    val t0 = System.nanoTime()
    val (pGot, pRej) =
      Warc.fetchScheduled(spark, paced, baseDir = d, paceWallClock = true)
    assert(pGot.count() === 2L && pRej.count() === 0L)
    assert((System.nanoTime() - t0) / 1e9 >= 0.3,
      "paceWallClock must hold the slot-1 fetch until not_before_s")
  }

  test("scheduledDueNanos: overrunning fetch re-anchors the pace (min inter-request gap survives)") {
    val s = 1000000000L // 1 s in nanos
    // on-schedule: previous fetch completed before the absolute
    // deadline -> the absolute deadline governs
    assert(Warc.scheduledDueNanos(0L, 2.0, 1.0, lastDoneNanos = s) === 2 * s)
    // overrun: the slot-1 fetch finished at t=5s, past slot 2's
    // absolute deadline (2s) -> due = completion + the 1 s gap, NOT
    // back-to-back at the stale absolute deadline
    assert(Warc.scheduledDueNanos(0L, 2.0, 1.0, lastDoneNanos = 5 * s)
      === 6 * s)
    // first fetch of a host: no prior completion (hasPrev = false —
    // an explicit flag, not a 0L sentinel: nanoTime's origin is
    // arbitrary and 0/negative are legitimate clock readings),
    // absolute deadline alone
    assert(Warc.scheduledDueNanos(10 * s, 0.5, 0.0, lastDoneNanos = 0L,
      hasPrev = false) === 10 * s + s / 2)
    // ... even when the anchor clock reads negative (nanoTime origin)
    assert(Warc.scheduledDueNanos(-10 * s, 0.5, 0.0,
      lastDoneNanos = -20 * s, hasPrev = false) === -10 * s + s / 2)
    // a real prior completion AT clock reading 0 is paced, not reset
    assert(Warc.scheduledDueNanos(-2 * s, 2.0, 1.0, lastDoneNanos = 0L)
      === s)
    // non-increasing not_before (defensive): gap clamps at zero, due
    // is never before the previous completion
    assert(Warc.scheduledDueNanos(0L, 1.0, 3.0, lastDoneNanos = 5 * s)
      === 5 * s)
  }
}
