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

  test("hardNegatives: keyword-sharing doc ranks first, self excluded, disjoint docs absent") {
    // doc 0 is the query: its distinctive keywords are zebra/quark/axolotl
    // (unique to docs 0 and 1 — everything else is stopword-ish filler
    // that also floods docs 2..9, keeping its tf-idf low for doc 0).
    // filler appears ONCE per doc: at tf 1 and df 4 its tf-idf stays
    // below the planted keywords (tf 1, df 2), so the query's top-3
    // keywords are exactly zebra/quark/axolotl
    val filler = "the a of and to in is it for"
    val docs = Seq(
      (0L, s"zebra quark axolotl $filler"),
      (1L, s"zebra quark axolotl extra words here"), // shares all 3 keywords
      (2L, s"zebra only $filler"),                   // shares 1
      (3L, filler),                                  // shares 0 -> must not appear
      (4L, filler + " unrelated tokens entirely"),
      (5L, ""))                                      // empty query -> no rows
      .toDF("doc_id", "text")
    val got = Retrieval.hardNegatives(
      docs, "doc_id", "text", queryFilter = col("doc_id") === 0L || col("doc_id") === 5L,
      m = 3, k = 3)
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(x => (x._1, x._3))
    // query 0: doc 1 (all three keywords) must outrank doc 2 (one)
    val q0 = rows.filter(_._1 == 0L)
    assert(q0.head._2 === 1L, q0.mkString(","))
    assert(q0.map(_._2).contains(2L))
    // self never appears; keyword-disjoint docs never appear
    assert(!q0.map(_._2).contains(0L) && !q0.map(_._2).contains(3L), q0.mkString(","))
    // the empty-text query mines nothing (no keywords -> no candidates)
    assert(!rows.exists(_._1 == 5L))
  }

  test("mmr: redundant near-twin is demoted; rank 1 is pure relevance; bounds enforced") {
    // candidates: 1 and 2 are near-identical (both highly relevant);
    // 3 is orthogonal to them with slightly lower relevance
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.999f, 0.04f, 0.0f, 0.0f)
    val e3 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val cand = Seq(
      (1L, 0.99, e1), (2L, 0.98, e2), (3L, 0.90, e3))
      .toDF("id", "rel", "vec")
    val got = Retrieval.mmr(cand, "id", "rel", "vec", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 1)  // argmax relevance first
    assert(got(3L) === 2)  // diversity beats the near-twin
    assert(got(2L) === 3)
    // k beyond the candidate count returns them all, ranked
    assert(Retrieval.mmr(cand, "id", "rel", "vec", k = 10).count() === 3L)
    // unbounded shortlists are refused — MMR is O(k*n) sequential
    val big = (0L until 50L).map(i => (i, 0.5, e1)).toDF("id", "rel", "vec")
    intercept[IllegalArgumentException] {
      Retrieval.mmr(big, "id", "rel", "vec", k = 3, maxCandidates = 10)
    }
  }
}
