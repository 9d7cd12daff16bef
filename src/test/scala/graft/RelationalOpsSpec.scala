package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Operator unit semantics: ties, boundaries, orphan keys
  * (SURVEY.md §7 hard parts 1, 2, 6).
  */
class RelationalOpsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestPerGroup: max event time wins; ties break by seq (pandas input-order equivalent)") {
    val df = Seq(
      ("a", ts("2023-10-05 10:00:00"), 1L, 10.0),
      ("a", ts("2023-10-05 12:00:00"), 2L, 20.0), // tie on ts…
      ("a", ts("2023-10-05 12:00:00"), 3L, 30.0), // …this one is later in input
      ("b", ts("2023-10-05 09:00:00"), 4L, 40.0))
      .toDF("key", "ts", "seq", "value")
    val got = Relational.latestPerGroup(df, Seq("key"), Seq("ts", "seq"), Seq("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 30.0, "b" -> 40.0))
  }

  test("firstPerGroup: min event time wins; ties break by seq") {
    val df = Seq(
      ("a", ts("2023-10-05 10:00:00"), 2L, 10.0),
      ("a", ts("2023-10-05 10:00:00"), 1L, 20.0),
      ("a", ts("2023-10-05 08:00:00"), 3L, 30.0))
      .toDF("key", "ts", "seq", "value")
    val got = Relational.firstPerGroup(df, Seq("key"), Seq("ts", "seq"), Seq("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 30.0))
  }

  test("retentionFilter: strictly-greater cut anchored at observed max (St3)") {
    val df = Seq(
      ("old", ts("2023-09-01 00:00:00")),
      ("boundary", ts("2023-09-23 12:00:00")), // exactly max - 30d → dropped (strict >)
      ("kept", ts("2023-09-23 12:00:01")),
      ("max", ts("2023-10-23 12:00:00")))
      .toDF("tag", "ts")
    val got = Relational.retentionFilter(df, "ts", 30)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got === Set("kept", "max"))
  }

  test("watermarkGate: strictly newer only — ties at the watermark drop (St1)") {
    val df = Seq(
      ("at", ts("2023-10-05 10:00:00")),
      ("after", ts("2023-10-05 10:00:01")))
      .toDF("tag", "ts")
    val got = Relational.watermarkGate(df, "ts", lit(ts("2023-10-05 10:00:00")))
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got === Set("after"))
  }

  test("groupedStringAgg: deterministic sorted order regardless of partitioning") {
    val df = Seq(("g", "b"), ("g", "c"), ("g", "a")).toDF("k", "v").repartition(3)
    val got = Relational.groupedStringAgg(df, Seq("k"), col("v"), "<br>", "agg")
      .collect().head.getString(1)
    assert(got === "a<br>b<br>c")
  }

  test("saltedAgg: two-phase salted sum equals the plain groupBy sum") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Relational.saltedAgg(df, Seq("k"), buckets = 8,
      partial = sum(col("v")).as("s"), fin = sum(col("s")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("asofJoin: latest build row at or before each probe ts; unmatched keeps nulls") {
    val probe = Seq((1L, "u1", ts("2023-10-05 10:00:00")), (2L, "u2", ts("2023-10-05 09:00:00")))
      .toDF("probe_id", "p_key", "p_ts")
    val build = Seq(
      ("u1", ts("2023-10-05 08:00:00"), 100L, 1.0),
      ("u1", ts("2023-10-05 10:00:00"), 101L, 2.0), // equal ts → included (<=)
      ("u1", ts("2023-10-05 11:00:00"), 102L, 3.0), // after probe → excluded
      ("u3", ts("2023-10-05 08:00:00"), 103L, 4.0))
      .toDF("b_key", "b_ts", "b_id", "b_val")
    val got = Relational.asofJoin(probe, build, "p_key", "b_key", "p_ts", "b_ts",
      buildPayload = Seq("b_id", "b_val"), buildTieBreak = "b_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(1L -> Some(101L), 2L -> None))
  }

  test("saltedJoin: planted hot key and duplicate dim keys match the plain join") {
    // 90% of facts hit one key; dim carries a duplicate key so each
    // fact must meet BOTH matching dim rows exactly once.
    val facts = (1L to 1000L)
      .map(i => (if (i % 10 == 0) i % 7 else 42L, i))
      .toDF("fk", "fid")
    val dim = (Seq.tabulate(7)(k => (k.toLong, s"d$k")) ++ Seq((42L, "hot"), (42L, "hot2")))
      .toDF("dk", "tag")
    val plain = facts.join(dim, col("fk") === col("dk"))
      .groupBy("tag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Relational.saltedJoin(facts, dim, "fk", "dk", buckets = 8)
      .groupBy("tag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 900L && salted("hot2") === 900L)
  }

  test("topK is deterministic under total order") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val got = Relational.topK(df, 5, col("v").desc, col("id").asc)
      .select("id").collect().map(_.getLong(0)).toSeq
    // v=6.0 for ids 6,13,20,27,34,… → first five by id
    assert(got === Seq(6L, 13L, 20L, 27L, 34L))
  }

  test("imputeByGroupMean: fills from the group's non-null mean; all-null group keeps nulls") {
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)), ("a", 3L, None),
      ("b", 4L, None), ("b", 5L, None))
      .toDF("g", "id", "v")
    val got = Relational.imputeByGroupMean(df, Seq("g"), "v")
      .collect().map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L) === Some(10.0) && got(2L) === Some(20.0))
    assert(got(3L) === Some(15.0))   // mean of non-nulls, not of the padded group
    assert(got(4L) === None && got(5L) === None) // nothing to impute from
  }

  test("imputeByGroupMean: null group keys pass through; scale is honored") {
    val df = Seq(
      (Some("a"), 1L, Some(0.0625)), (Some("a"), 2L, Some(0.0625)),
      (Some("a"), 3L, None),
      (None: Option[String], 4L, Some(9.0)), (None, 5L, None))
      .toDF("g", "id", "v")
    val got = Relational.imputeByGroupMean(df, Seq("g"), "v", scale = 4)
      .collect().map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // scale=4 must not pre-round inputs to 2dp: mean(0.0625, 0.0625)=0.0625
    assert(got(3L) === Some(0.0625))
    // null-key rows survive the join (left, not inner) with values intact
    assert(got.size === 5)
    assert(got(4L) === Some(9.0) && got(5L) === None)
  }

  test("ohlcBars: open/close follow (ts, tie) order incl. same-ts ties; no window in plan") {
    val df = Seq(
      ("a", "2024-01-01 10:05:00", 1L, 5.0),
      ("a", "2024-01-01 10:05:00", 2L, 7.0),  // same ts — tie on id
      ("a", "2024-01-01 10:50:00", 3L, 2.0),
      ("a", "2024-01-01 11:10:00", 4L, 9.0),
      ("b", "2024-01-01 10:30:00", 5L, 4.0))
      .toDF("k", "ts", "id", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val bars = Relational.ohlcBars(df, Seq("k"), "ts", "id", "v", "hour")
    val got = bars.collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).toString),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(got(("a", "2024-01-01 10:00:00.0")) === ((5.0, 7.0, 2.0, 2.0, 3L)))
    assert(got(("a", "2024-01-01 11:00:00.0")) === ((9.0, 9.0, 9.0, 9.0, 1L)))
    assert(got(("b", "2024-01-01 10:00:00.0")) === ((4.0, 4.0, 4.0, 4.0, 1L)))
    // aggregate path, not a per-bucket sort
    val plan = bars.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("windowspecdefinition"), plan.take(400))
  }

  test("rollingAnomaly: bounded look-back, empty-frame rows never flagged") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 40.0), // 40 > 2*avg(10,10)
      ("a", 4L, 10.0),                                   // 10 < 2*avg(10,10,40)
      ("b", 5L, 100.0))                                  // first row of b: no frame
      .toDF("k", "id", "v")
      .withColumn("ts", col("id").cast("timestamp"))
    val got = Relational.rollingAnomaly(df, Seq("k"), "ts", "id", "v", k = 5, factor = 2)
      .select("id", "is_anomaly").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 0))
  }

  test("fuzzyJoin: finds every pair within maxDist, incl. across length buckets") {
    val left = Seq("kitten", "flaw", "abcdefgh").toDF("a")
    val right = Seq("sitting", "lawn", "abcdefghij", "zzzzz").toDF("b")
    val got = Relational.fuzzyJoin(left, "a", right, "b", maxDist = 3)
      .select("a", "b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // kitten→sitting = 3; flaw→lawn = 2; abcdefgh→abcdefghij = 2
    // (lengths 8 vs 10 land in adjacent buckets at width 4 — the ±1
    // replication is what finds it)
    assert(got === Set(
      ("kitten", "sitting", 3),
      ("flaw", "lawn", 2),
      ("abcdefgh", "abcdefghij", 2)))
  }

  test("fuzzyJoin: equi-join plan — no nested-loop cross product") {
    val left = Seq("aaa").toDF("a")
    val right = Seq("aab").toDF("b")
    val plan = Relational.fuzzyJoin(left, "a", right, "b", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("fuzzyJoinGrams: multiset gram counts keep repeated-gram pairs a distinct count drops") {
    // "aaaaaaaaaab" vs "aaaaaaaaaac": dist 1, but both have ONE
    // distinct 3-gram in the shared prefix ("aaa" ×8 positions) —
    // a distinct-gram intersection (1) would fail the lemma threshold
    // (11 - 2 - 3 = 6); min-multiplicity counting (8) passes.
    val left = Seq("aaaaaaaaaab", "kitchenware").toDF("a")
    val right = Seq("aaaaaaaaaac", "kitchenwarm", "unrelatedzz").toDF("b")
    val got = Relational.fuzzyJoinGrams(left, "a", right, "b", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(
      ("aaaaaaaaaab", "aaaaaaaaaac", 1),
      ("kitchenware", "kitchenwarm", 1)))
  }

  test("fuzzyJoinGrams: short strings route through the length-bucket path, long through grams") {
    val left = Seq("cat", "metamorphosis").toDF("a")   // 3 chars / 13 chars
    val right = Seq("cap", "metamorphoses").toDF("b")
    val got = Relational.fuzzyJoinGrams(left, "a", right, "b", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("cat", "cap"), ("metamorphosis", "metamorphoses")))
  }

  test("fuzzyJoinGrams agrees with fuzzyJoin on a mixed-length corpus") {
    val words = Seq("spark", "spork", "sparkle", "sparkles", "ember",
      "embers", "emerge", "ab", "ac", "abcdabcdabcd", "abcdabcdabce")
    val l = words.toDF("a")
    val r = words.toDF("b")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("a") < col("b"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet
    val viaGrams = norm(Relational.fuzzyJoinGrams(l, "a", r, "b", 2))
    val viaBuckets = norm(Relational.fuzzyJoin(l, "a", r, "b", 2))
    assert(viaGrams === viaBuckets)
    assert(viaGrams.nonEmpty)
  }

  test("fuzzyJoinPrefix agrees with fuzzyJoin, incl. boilerplate-gram and repeated-gram cases") {
    // every string shares the boilerplate prefix "thecompanyname" —
    // the hot gram scenario prefix filtering exists for — plus a
    // repeated-gram pair and short strings for the bucket route
    val words = Seq(
      "thecompanyname-alpha", "thecompanyname-alphb", "thecompanyname-gamma",
      "aaaaaaaaaab", "aaaaaaaaaac", "ab", "ac")
    val l = words.toDF("a")
    val r = words.toDF("b")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("a") < col("b"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet
    val viaPrefix = norm(Relational.fuzzyJoinPrefix(l, "a", r, "b", 2))
    val viaBuckets = norm(Relational.fuzzyJoin(l, "a", r, "b", 2))
    assert(viaPrefix === viaBuckets)
    assert(viaPrefix.contains(("thecompanyname-alpha", "thecompanyname-alphb", 1)))
    assert(viaPrefix.contains(("aaaaaaaaaab", "aaaaaaaaaac", 1)))
    assert(viaPrefix.contains(("ab", "ac", 1)))
  }

  test("fuzzyJoinPrefix: prefix explode ships at most maxDist*q+1 grams per long string") {
    val l = Seq("abcdefghijklmnopqrstuvwxyz").toDF("a")
    val r = Seq("abcdefghijklmnopqrstuvwxy_").toDF("b")
    // indirect but behavioral: the pair is found through a 7-gram
    // prefix (maxDist 2, q 3), far fewer than the 24 grams per string
    val got = Relational.fuzzyJoinPrefix(l, "a", r, "b", 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2)))
    assert(got.length === 1 && got.head._3 === 1)
  }

  test("fuzzyJoin: maxDist 0 degenerates to exact equality") {
    val left = Seq("x", "y").toDF("a")
    val right = Seq("x", "z").toDF("b")
    val got = Relational.fuzzyJoin(left, "a", right, "b", 0)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("x", "x")))
  }
}
