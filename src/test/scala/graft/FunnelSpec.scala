package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Conversion-funnel semantics: strictly-after stage progression,
  * out-of-order arrivals, and fold ≡ cascade equivalence on real
  * testdata.
  */
class FunnelSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Timestamp, String, Long)]) =
    Relational.funnel(
      rows.toDF("user_id", "ts", "event_type", "event_id"),
      "user_id", "ts", "event_type", stages, "event_id")
      .orderBy("user_id").collect()

  test("full path, partial path, and wrong-order path") {
    val got = run(Seq(
      // u1: complete in order
      (1L, ts(1), "view", 1L), (1L, ts(2), "click", 2L), (1L, ts(3), "purchase", 3L),
      // u2: purchase BEFORE click — reaches view+click only
      (2L, ts(1), "view", 4L), (2L, ts(2), "purchase", 5L), (2L, ts(3), "click", 6L),
      // u3: click only — stage 1 never starts
      (3L, ts(1), "click", 7L)))
    assert(got(0).getAs[Int]("stages_reached") === 3)
    assert(got(0).getAs[Timestamp]("ts_purchase") === ts(3))
    assert(got(1).getAs[Int]("stages_reached") === 2)
    assert(got(1).getAs[Timestamp]("ts_click") === ts(3))
    assert(got(1).isNullAt(got(1).fieldIndex("ts_purchase")))
    assert(got(2).getAs[Int]("stages_reached") === 0)
    assert(got(2).isNullAt(got(2).fieldIndex("ts_view")))
  }

  test("strictly-after: a same-timestamp next stage does not count") {
    val got = run(Seq(
      (1L, ts(1), "view", 1L), (1L, ts(1), "click", 2L), (1L, ts(2), "click", 3L)))
    assert(got(0).getAs[Int]("stages_reached") === 2)
    assert(got(0).getAs[Timestamp]("ts_click") === ts(2)) // the later click
  }

  test("earliest qualifying event wins at each stage") {
    val got = run(Seq(
      (1L, ts(5), "view", 1L), (1L, ts(2), "view", 2L),
      (1L, ts(3), "click", 3L), (1L, ts(4), "click", 4L)))
    assert(got(0).getAs[Timestamp]("ts_view") === ts(2))
    assert(got(0).getAs[Timestamp]("ts_click") === ts(3))
  }

  test("streaming fold: stage accepted across batch boundaries, state minimal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.FunnelEvent
    val input = MemoryStream[FunnelEvent](spark)
    val out = FunnelStream.fold(input.toDS(), stages)
    val q = out.toDF().writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream_spec").start()
    try {
      // batch 0: view only; batch 1 (later times): click then purchase
      input.addData(FunnelEvent(1L, "view", 1L, 1000L))
      q.processAllAvailable()
      input.addData(FunnelEvent(1L, "click", 2L, 2000L),
        FunnelEvent(1L, "purchase", 3L, 3000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_stream_spec")
      .orderBy("seen").collect()
    // two emissions for user 1: after batch 0 (1 stage), after batch 1 (3)
    assert(rows.map(_.getAs[Seq[Long]]("reached").length).toSeq === Seq(1, 3))
    assert(rows.last.getAs[Seq[Long]]("reached") === Seq(1000L, 2000L, 3000L))
  }

  test("streaming fold ≡ batch funnel under in-order two-batch replay (sf0.001)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.FunnelEvent
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin(stages: _*))
    val evs = ev.select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[FunnelEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val (b0, b1) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[FunnelEvent](spark)
    val q = FunnelStream.fold(input.toDS(), stages).toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream_replay").start()
    try {
      input.addData(b0.toSeq); q.processAllAvailable()
      input.addData(b1.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("funnel_stream_replay")
      .groupBy("user_id")
      .agg(max_by(col("reached"), col("seen")).as("r"))
      .select(col("user_id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Long]](1)).toMap
    val batch = Relational.funnel(Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts", "event_type", stages, "event_id")
      .select(col("user_id"),
        unix_micros(col("ts_view").cast("timestamp")).as("t1"),
        unix_micros(col("ts_click").cast("timestamp")).as("t2"),
        unix_micros(col("ts_purchase").cast("timestamp")).as("t3"))
      .collect().map { r =>
        r.getLong(0) -> Seq(1, 2, 3).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
    assert(streamed === batch)
  }

  test("EXACT streaming fold ≡ batch under an adversarial parity split (sf0.001)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.FunnelEventT
    val evs = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("timestamp").as("ts"))
      .as[FunnelEventT].collect()
    // parity split = maximal cross-batch reordering (a purchase can
    // arrive a full batch before its view)
    val (b0, b1) = evs.partition(_.event_id % 2 == 0)
    val maxUs = evs.map(e => e.ts.getTime).max
    val spanDays = ((maxUs - evs.map(_.ts.getTime).min) / 86400000L + 2L).toInt
    val flush = evs.map(_.user_id).distinct.map(u => FunnelEventT(
      u, "flush", Long.MaxValue,
      new Timestamp(maxUs + (spanDays + 1L) * 86400000L)))
    val input = MemoryStream[FunnelEventT](spark)
    val q = FunnelStream.foldExact(input.toDS(), stages, s"$spanDays days").toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_exact_replay").start()
    try {
      input.addData(b0.toSeq); q.processAllAvailable()
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(flush.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("funnel_exact_replay")
      .groupBy("user_id")
      .agg(max_by(col("reached"), col("seen")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Long]](1)).toMap
    val batch = Relational.funnel(Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts", "event_type", stages, "event_id")
      .select(col("user_id"),
        unix_micros(col("ts_view").cast("timestamp")).as("t1"),
        unix_micros(col("ts_click").cast("timestamp")).as("t2"),
        unix_micros(col("ts_purchase").cast("timestamp")).as("t3"))
      .collect().map { r =>
        r.getLong(0) -> Seq(1, 2, 3).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
    assert(streamed === batch)
  }

  test("fold ≡ cascade on the sf0.001 events table") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = Relational.funnel(ev, "user_id", "ts", "event_type", stages, "event_id")
    val b = Relational.funnelCascade(ev, "user_id", "ts", "event_type", stages)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // sanity: the funnel narrows monotonically
    val reach = a.groupBy("stages_reached").count().collect()
      .map(r => r.getAs[Int]("stages_reached") -> r.getAs[Long]("count")).toMap
    assert(reach.keySet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("matchPattern: contiguous occurrences, overlap counting, span cutoff, tail safety") {
    def mp(rows: Seq[(Long, Timestamp, String, Long)], spanS: Long = 3600L) =
      Relational.matchPattern(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", Seq("a", "b", "a"), spanS, "event_id")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toMap

    // u1: a b a b a -> two OVERLAPPING contiguous matches (pos 1, 3)
    val u1 = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L), (1L, ts(3), "a", 3L),
      (1L, ts(4), "b", 4L), (1L, ts(5), "a", 5L))
    // u2: a b X a -> the intruder breaks contiguity, no match
    val u2 = Seq(
      (2L, ts(1), "a", 6L), (2L, ts(2), "b", 7L), (2L, ts(3), "x", 8L),
      (2L, ts(4), "a", 9L))
    // u3: labels match but the span exceeds the cutoff
    val u3 = Seq(
      (3L, ts(1), "a", 10L), (3L, ts(2), "b", 11L), (3L, ts(50), "a", 12L))
    val got = mp(u1 ++ u2 ++ u3, spanS = 10 * 60L)
    assert(got.keySet === Set(1L))
    assert(got(1L) === ((2L, ts(1), ts(3))))
    // widen the span: u3 matches too
    val wide = mp(u1 ++ u2 ++ u3, spanS = 3600L)
    assert(wide(3L) === ((1L, ts(1), ts(50))))
    // a timeline shorter than the pattern matches nothing (tail leads
    // are null and must drop, not throw)
    assert(mp(Seq((4L, ts(1), "a", 13L), (4L, ts(2), "b", 14L))).isEmpty)
  }

  test("matchPatternPlus: greedy B+, run anchors, intruders, overlap-free runs, span cutoff") {
    def mpp(rows: Seq[(Long, Timestamp, String, Long)], spanS: Long = 3600L) =
      Relational.matchPatternPlus(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "a", "b", "c", spanS, "event_id")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))))
        .toMap

    // u1: a b b b c -> ONE match, the whole run (plus_len 3)
    val u1 = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L), (1L, ts(3), "b", 3L),
      (1L, ts(4), "b", 4L), (1L, ts(5), "c", 5L))
    // u2: a b c with a single b (B+ means >= 1)
    val u2 = Seq(
      (2L, ts(1), "a", 6L), (2L, ts(2), "b", 7L), (2L, ts(3), "c", 8L))
    // u3: a c — no b run at all, no match
    val u3 = Seq((3L, ts(1), "a", 9L), (3L, ts(2), "c", 10L))
    // u4: a b x c — the intruder splits the runs, no match
    val u4 = Seq(
      (4L, ts(1), "a", 11L), (4L, ts(2), "b", 12L), (4L, ts(3), "x", 13L),
      (4L, ts(4), "c", 14L))
    // u5: a a b b c -> anchors at the LAST a and the FIRST c
    val u5 = Seq(
      (5L, ts(1), "a", 15L), (5L, ts(2), "a", 16L), (5L, ts(3), "b", 17L),
      (5L, ts(4), "b", 18L), (5L, ts(5), "c", 19L))
    // u6: two disjoint matches; the first one anchors the firsts
    val u6 = Seq(
      (6L, ts(1), "a", 20L), (6L, ts(2), "b", 21L), (6L, ts(3), "c", 22L),
      (6L, ts(10), "a", 23L), (6L, ts(11), "b", 24L), (6L, ts(12), "b", 25L),
      (6L, ts(13), "c", 26L))
    // u7: span from last-a to first-c exceeds the cutoff
    val u7 = Seq(
      (7L, ts(1), "a", 27L), (7L, ts(2), "b", 28L), (7L, ts(50), "c", 29L))
    // u8: b b c (no leading a) and a b b (no trailing c)
    val u8 = Seq(
      (8L, ts(1), "b", 30L), (8L, ts(2), "b", 31L), (8L, ts(3), "c", 32L),
      (8L, ts(10), "a", 33L), (8L, ts(11), "b", 34L), (8L, ts(12), "b", 35L))
    val got = mpp(u1 ++ u2 ++ u3 ++ u4 ++ u5 ++ u6 ++ u7 ++ u8,
      spanS = 10 * 60L)
    assert(got.keySet === Set(1L, 2L, 5L, 6L))
    assert(got(1L) === ((1L, ts(1), ts(5), 3L)))
    assert(got(2L) === ((1L, ts(1), ts(3), 1L)))
    assert(got(5L) === ((1L, ts(2), ts(5), 2L)),
      "anchor = LAST first-label event, FIRST last-label event")
    assert(got(6L) === ((2L, ts(1), ts(3), 1L)))
    // widen the span: u7 matches
    assert(mpp(u7)(7L) === ((1L, ts(1), ts(50), 1L)))
  }

  test("matchPatternPlus plan: ONE shuffle — RLE window, run aggregate, neighbor window and key aggregate all reuse the key partitioning") {
    val df = Relational.matchPatternPlus(
      Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts", "event_type", "click", "view", "purchase",
      3600L, "event_id")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "(?i)exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1,
      s"expected one hash exchange, got $exchanges:\n$plan")
  }

  test("matchPatternBounded: alternation merges runs; bounds gate greedily; A B+ A expressible") {
    def mpb(rows: Seq[(Long, Timestamp, String, Long)],
        first: String = "a", plus: Seq[String] = Seq("b", "d"),
        lo: Int = 1, hi: Int = 3, last: String = "c") =
      Relational.matchPatternBounded(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", first, plus, lo, hi, last,
        3600L, "event_id")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))))
        .toMap

    // u1: a b d b c — the alternation set is ONE run of length 3
    val u1 = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L), (1L, ts(3), "d", 3L),
      (1L, ts(4), "b", 4L), (1L, ts(5), "c", 5L))
    // u2: a b d b d c — run length 4 > hi: greedy-contiguous yields
    // NO match (the 4th quantified event is an intruder to {1,3})
    val u2 = Seq(
      (2L, ts(1), "a", 6L), (2L, ts(2), "b", 7L), (2L, ts(3), "d", 8L),
      (2L, ts(4), "b", 9L), (2L, ts(5), "d", 10L), (2L, ts(6), "c", 11L))
    // u3: lo=2 — a single-b run is too short
    val u3 = Seq(
      (3L, ts(1), "a", 12L), (3L, ts(2), "b", 13L), (3L, ts(3), "c", 14L))
    // u4: intruder x inside the quantified run still splits it
    val u4 = Seq(
      (4L, ts(1), "a", 15L), (4L, ts(2), "b", 16L), (4L, ts(3), "x", 17L),
      (4L, ts(4), "d", 18L), (4L, ts(5), "c", 19L))
    val got = mpb(u1 ++ u2 ++ u4)
    assert(got.keySet === Set(1L))
    assert(got(1L) === ((1L, ts(1), ts(5), 3L)))
    assert(mpb(u3, lo = 2).isEmpty, "below minLen never matches")
    assert(mpb(u3)(3L) === ((1L, ts(1), ts(3), 1L)))
    // first == last stays expressible: a (b|d)+ a
    val u5 = Seq(
      (5L, ts(1), "a", 20L), (5L, ts(2), "b", 21L), (5L, ts(3), "d", 22L),
      (5L, ts(4), "a", 23L))
    assert(mpb(u5, last = "a")(5L) === ((1L, ts(1), ts(4), 2L)))
    // anchors inside the alternation set are rejected loudly
    assertThrows[IllegalArgumentException] {
      mpb(u1, first = "b")
    }
  }

  test("matchPatternBounded plan keeps the single-shuffle shape") {
    val df = Relational.matchPatternBounded(
      Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts", "event_type", "click", Seq("view", "error"), 1, 3,
      "purchase", 3600L, "event_id")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "(?i)exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1,
      s"expected one hash exchange, got $exchanges:\n$plan")
  }
}
