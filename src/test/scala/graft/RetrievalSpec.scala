package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Hybrid-retrieval fusion: RRF arithmetic and coverage, the bounded
  * top-n ranked-list cut, and the plan shape that keeps ranking off
  * the corpus-wide single-partition window.
  */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  test("rrfFuse: known two-list arithmetic, outer coverage, null ranks") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id", k0 = 60)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))).toMap
    // id 2 is in both lists: 1/62 + 1/61; ids 1 and 3 in one each
    assert(got(1L) === ((Some(1), None, 1.0 / 61)))
    assert(got(2L) === ((Some(2), Some(1), 1.0 / 62 + 1.0 / 61)))
    assert(got(3L) === ((None, Some(2), 1.0 / 62)))
    // consensus mid-ranker beats either single-list winner
    assert(got(2L)._3 > got(1L)._3 && got(2L)._3 > got(3L)._3)
  }

  test("rrfFuse: three lists sum in list order (fixed double association)") {
    val lists = Seq("x", "y", "z").zipWithIndex.map { case (nm, i) =>
      nm -> Seq((7L, i + 1)).toDF("id", "rank")
    }
    val score = Retrieval.rrfFuse(lists, "id")
      .select("rrf_score").as[Double].head()
    // exact left-fold replay: ((1/61 + 1/62) + 1/63)
    assert(score === 1.0 / 61 + 1.0 / 62 + 1.0 / 63)
    // name collision is an error, not a silent column clobber
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("x" -> lists.head._2, "x" -> lists.head._2), "id")
    }
  }

  test("topRanked: deterministic tie-break and the TakeOrdered cut before ranking") {
    val df = Seq((5L, 2.0), (3L, 2.0), (9L, 3.0), (1L, 1.0), (4L, 2.0))
      .toDF("id", "score")
    val got = Retrieval.topRanked(df, "id", "score", n = 3)
      .select("id", "rank").as[(Long, Int)].collect().toMap
    // ties at 2.0 break by ascending id: 3 then 4; 5 falls off the cut
    assert(got === Map(9L -> 1, 3L -> 2, 4L -> 3))
    // the corpus-sized cut must plan as TakeOrderedAndProject (partial
    // per-partition top-n), never a full sort feeding the rank window
    val plan = Retrieval.topRanked(df, "id", "score", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a TakeOrderedAndProject cut:\n${plan.take(600)}")
  }
}
