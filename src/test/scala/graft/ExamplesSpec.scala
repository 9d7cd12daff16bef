package graft

import org.apache.spark.sql.functions._

import graft.operators.{Examples, Profile}

/** Training-example builders + eval counters: hand-computed
  * next-event pairs, the complete-context rule, and the confusion
  * matrix cells.
  */
class ExamplesSpec extends SparkSpecBase {

  import spark.implicits._

  test("nextEvent: hand-computed contexts; rows before position k+1 emit nothing") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 5L, "x"), (2L, 6L, "y")) // only 2 events: no k=2 example until the 3rd
      .toDF("user_id", "event_id", "event_type")
    val got = Examples.nextEvent(
        ev, "user_id", Seq(col("event_id")), "event_type", k = 2)
      .select("user_id", "event_id", "context", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq === Seq(
      (1L, 3L, "a b", "c"),
      (1L, 4L, "b c", "d")))
  }

  test("nextEvent: deterministic under repartitioning; per-key windows only") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) = Examples.nextEvent(
        d, "user_id", Seq(col("ts"), col("event_id")), "event_type", k = 3)
      .select("user_id", "event_id", "context", "label")
    val a = run(ev).orderBy("user_id", "event_id").collect().map(_.toSeq).toSeq
    val b = run(ev.repartition(13)).orderBy("user_id", "event_id")
      .collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
    // the window must be keyed — an empty partitionBy would drag the
    // whole log through one task
    val plan = run(ev).queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id"), plan.take(600))
  }

  test("transitionMatrix: adjacent-pair counts per key, row-normalized ppm") {
    // user 1: a->b->a->c ; user 2: a->b — transitions pool across users
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"))
      .toDF("user_id", "seq", "event_type")
    val got = graft.operators.Examples.transitionMatrix(
        ev, "user_id", Seq(col("seq")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from 'a': b twice, c once -> 666666 / 333333 ppm (floor)
    assert(got === Map(
      ("a", "b") -> ((2L, 666666L)),
      ("a", "c") -> ((1L, 333333L)),
      ("b", "a") -> ((1L, 1000000L))))
    // no cross-user pair: (b at end of user 2) -> nothing
    // window must stay keyed by user
    val plan = graft.operators.Examples.transitionMatrix(
      ev, "user_id", Seq(col("seq")), "event_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id"), plan.take(600))
  }

  test("confusion: cells are exact pair counts, absent pairs absent") {
    val d = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("fr", "en"))
      .toDF("actual_lang", "pred_lang")
    val got = Profile.confusion(d, "actual_lang", "pred_lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("en", "en") -> 2L, ("en", "de") -> 1L,
      ("de", "de") -> 1L, ("fr", "en") -> 1L))
  }
}
