package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Relational}

/** CDC apply semantics (update / delete / insert / passthrough /
  * last-change-wins) and the gap-fill + top-k-per-group operators.
  */
class CdcSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val base = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0))
    .toDF("k", "name", "bal")

  test("applyChanges: update, delete, insert, passthrough in one merge") {
    val changes = Seq(
      (1L, 1L, "U", 11.0),  // update alice
      (2L, 2L, "D", 0.0),   // delete bob
      (9L, 3L, "U", 99.0))  // insert new key 9
      .toDF("k", "seq", "op", "new_bal")
    val got = Cdc.applyChanges(base, changes,
        keyCols = Seq("k"), orderCols = Seq("seq"),
        opCol = "op", updateCols = Map("bal" -> "new_bal"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, Some("alice"), 11.0),  // updated
      (3L, Some("carol"), 30.0),  // passthrough
      (9L, None, 99.0)))          // inserted; unmapped base col NULL
  }

  test("applyChanges: last change per key wins, regardless of log order") {
    val changes = Seq(
      (1L, 5L, "U", 50.0),  // later…
      (1L, 2L, "D", 0.0),   // …than this delete, so the key survives
      (1L, 3L, "U", 30.0))
      .toDF("k", "seq", "op", "new_bal")
    val got = Cdc.applyChanges(base, changes,
        Seq("k"), Seq("seq"), "op", Map("bal" -> "new_bal"))
      .filter($"k" === 1L).collect()
    assert(got.length === 1 && got.head.getDouble(2) === 50.0)
  }

  test("applyChanges: delete-then-nothing removes; delete of absent key is a no-op") {
    val changes = Seq(
      (3L, 1L, "D", 0.0),
      (7L, 1L, "D", 0.0)) // key 7 not in base
      .toDF("k", "seq", "op", "new_bal")
    val got = Cdc.applyChanges(base, changes,
        Seq("k"), Seq("seq"), "op", Map("bal" -> "new_bal"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("applyChanges: output schema equals base schema") {
    val changes = Seq((1L, 1L, "U", 11.0)).toDF("k", "seq", "op", "new_bal")
    val out = Cdc.applyChanges(base, changes,
      Seq("k"), Seq("seq"), "op", Map("bal" -> "new_bal"))
    assert(out.columns.toSeq === base.columns.toSeq)
  }

  test("gapFillDays: fills missing days forward; NULL before first observation") {
    val daily = Seq(
      ("a", "2024-01-01", 1.0),
      ("a", "2024-01-04", 4.0),
      ("b", "2024-01-03", 3.0))
      .toDF("key", "day", "v")
      .withColumn("day", col("day").cast("date"))
    val got = Relational.gapFillDays(daily, Seq("key"), "day", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, Option(r.get(2))))
      .toSet
    assert(got === Set(
      ("a", "2024-01-01", Some(1.0)),
      ("a", "2024-01-02", Some(1.0)), // filled forward
      ("a", "2024-01-03", Some(1.0)),
      ("a", "2024-01-04", Some(4.0)),
      ("b", "2024-01-01", None),      // before b's first observation
      ("b", "2024-01-02", None),
      ("b", "2024-01-03", Some(3.0)),
      ("b", "2024-01-04", Some(3.0)))) // filled to the global max day
  }

  test("scd2: contiguous validity intervals, open-ended current row, tiebreak order") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "c"),
      (1L, ts("2024-01-03 00:00:00"), 2L, "b"), // same ts — event_id breaks the tie
      (2L, ts("2024-02-01 00:00:00"), 4L, "x"))
      .toDF("k", "ts", "seq", "payload")
    val got = Cdc.scd2(changes, Seq("k"), "ts", Seq("seq"))
      .select("k", "seq", "payload", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
      .toSet
    assert(got === Set(
      (1L, 1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, 2L, "b", ts("2024-01-03 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, 3L, "c", ts("2024-01-03 00:00:00"), None, true),
      (2L, 4L, "x", ts("2024-02-01 00:00:00"), None, true)))
  }

  test("scd2: point-in-time join reads the version valid at the probe ts") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "v1"),
      (1L, ts("2024-01-10 00:00:00"), 2L, "v2"))
      .toDF("k", "ts", "seq", "payload")
    val dim = Cdc.scd2(changes, Seq("k"), "ts", Seq("seq"))
    val probe = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("k", "probe_ts")
    val got = probe.join(dim,
        probe("k") === dim("k") &&
          probe("probe_ts") >= dim("valid_from") &&
          (dim("valid_to").isNull || probe("probe_ts") < dim("valid_to")))
      .select("payload").collect().map(_.getString(0)).toSeq
    assert(got === Seq("v1"))
  }

  test("snapshotDiff: I/D/U classification, unchanged rows dropped") {
    val cur = Seq(
      (1L, "alice", 10.0),   // unchanged
      (2L, "bobby", 20.0),   // renamed        -> U
      (4L, "dave", 40.0))    // only in current -> I
      .toDF("k", "name", "bal")
    val got = Cdc.snapshotDiff(base, cur, Seq("k"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set(
      (2L, "U", "name"),
      (3L, "D", ""),   // carol only in base
      (4L, "I", "")))
  }

  test("snapshotDiff: changed_cols lists every differing column, sorted") {
    val cur = Seq((1L, "ALICE", 11.0)).toDF("k", "name", "bal")
    val got = Cdc.snapshotDiff(base.filter($"k" === 1L), cur, Seq("k")).collect()
    assert(got.length === 1)
    assert(got.head.getString(1) === "U")
    assert(got.head.getString(2) === "bal,name")
  }

  test("snapshotDiff: null-safe compare — null vs value is a change, null vs null is not") {
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val c = Seq((1L, Option.empty[String]), (2L, Some("now-set")))
      .toDF("k", "name")
    val got = Cdc.snapshotDiff(b, c, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((2L, "U")))
  }

  test("snapshotDiff: identical snapshots diff to empty") {
    assert(Cdc.snapshotDiff(base, base, Seq("k")).count() === 0L)
  }

  test("snapshotDiff: explicit compareCols ignores drift in other columns") {
    val cur = Seq((1L, "alice", 99.0)).toDF("k", "name", "bal")
    val got = Cdc.snapshotDiff(
      base.filter($"k" === 1L), cur, Seq("k"), compareCols = Seq("name"))
    assert(got.count() === 0L)
  }

  test("topKPerGroup: bounded heap matches window row_number semantics incl. ties") {
    val df = Seq(
      ("x", 1L, 5.0), ("x", 2L, 9.0), ("x", 3L, 9.0), ("x", 4L, 1.0),
      ("y", 5L, 2.0))
      .toDF("g", "id", "score")
    val got = Relational.topKPerGroup(df, Seq("g"), col("score"), col("id"), 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // score desc, id asc on ties: x -> (9.0, id 2), (9.0, id 3); y has 1 row
    assert(got === Set(
      ("x", 1, 2L, 9.0),
      ("x", 2, 3L, 9.0),
      ("y", 1, 5L, 2.0)))
  }
}
