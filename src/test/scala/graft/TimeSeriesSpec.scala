package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

/** Time-series subsequence similarity: planted perfect / inverted /
  * flat windows, shape-invariance under affine changes (the point of
  * Pearson), and the keyed-window + TakeOrdered plan discipline.
  */
class TimeSeriesSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
  private val q = Seq(1.0, 2.0, 4.0, 2.0)

  private def run(rows: Seq[(Long, Timestamp, Double, Long)], k: Int = 5) =
    TimeSeries.similarSubsequences(
      rows.toDF("user_id", "ts", "value", "event_id"),
      "user_id", "ts", "value", q, k, "event_id", scale = 2)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))

  test("planted shapes: exact match 1.0, affine match 1.0, inverted -1.0, flat excluded") {
    val rows =
      // u1: the query shape itself
      Seq(1.0, 2.0, 4.0, 2.0).zipWithIndex.map { case (v, i) =>
        (1L, ts(i), v, i.toLong) } ++
      // u2: affine transform 10x + 3 — same SHAPE, must also score 1.0
      Seq(13.0, 23.0, 43.0, 23.0).zipWithIndex.map { case (v, i) =>
        (2L, ts(i), v, 10L + i) } ++
      // u3: inverted
      Seq(4.0, 3.0, 1.0, 3.0).zipWithIndex.map { case (v, i) =>
        (3L, ts(i), v, 20L + i) } ++
      // u4: flat — zero variance, excluded entirely
      Seq(5.0, 5.0, 5.0, 5.0).zipWithIndex.map { case (v, i) =>
        (4L, ts(i), v, 30L + i) }
    val got = run(rows)
    val byKey = got.groupBy(_._1)
    assert(byKey(1L).head._3 === 1.0)
    assert(byKey(2L).head._3 === 1.0, "Pearson must be affine-invariant")
    assert(byKey(3L).head._3 === -1.0)
    assert(!byKey.contains(4L), "flat windows have no shape")
    // ordering: the two 1.0s first (key asc), then the inverted tail
    assert(got.head._1 === 1L && got(1)._1 === 2L)
  }

  test("k cut + sliding windows: only full-length windows, top-k deterministic") {
    // one user, 6 points -> three length-4 windows
    val rows = Seq(1.0, 2.0, 4.0, 2.0, 1.0, 0.5).zipWithIndex.map {
      case (v, i) => (1L, ts(i), v, i.toLong) }
    val got = run(rows, k = 2)
    assert(got.length === 2)
    assert(got.head._2 === ts(0) && got.head._3 === 1.0)
  }

  test("plan: keyed bounded-frame window + TakeOrdered cut, no global sort") {
    // enough rows that the optimizer can't constant-eliminate the
    // sort+limit (a ≤1-row child legally loses both)
    val rows = (0 until 30).map(i => (i.toLong % 3, ts(i), i * 1.5, i.toLong))
    val df = TimeSeries.similarSubsequences(
      rows.toDF("user_id", "ts", "value", "event_id"),
      "user_id", "ts", "value", q, 5, "event_id", scale = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    // the only Sort is the keyed window's intra-partition sort
    assert(!plan.contains("Sort [corr"), "the global cut must be the bounded heap")
  }
}
