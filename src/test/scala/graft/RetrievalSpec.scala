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
    // unbounded shortlists are refused — MMR is O(k*n) sequential.
    // The bound is an IN-PLAN assert_true (no separate pre-count job),
    // so it surfaces as the task-level USER_RAISED error.
    val big = (0L until 50L).map(i => (i, 0.5, e1)).toDF("id", "rel", "vec")
    val e = intercept[Exception] {
      Retrieval.mmr(big, "id", "rel", "vec", k = 3, maxCandidates = 10)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("maxCandidates=10"))
  }

  test("mmr: shortlist guard runs in-plan (assert_true predicate, no driver pre-count)") {
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val cand = Seq((1L, 0.99, e1), (2L, 0.5, Seq(0f, 1f, 0f, 0f)))
      .toDF("id", "rel", "vec")
    val guarded = Retrieval.mmrGuardedBase(cand, "id", "rel", "vec", 10)
    val plan = guarded.queryExecution.optimizedPlan.toString()
    assert(plan.contains("assert_true") || plan.contains("raise_error"),
      s"the shortlist bound must be an in-plan predicate, got:\n$plan")
    // and it passes rows through untouched when under the cap
    assert(guarded.count() === 2L)
  }

  test("rankEval: hand-computed metrics incl. nDCG on a known run") {
    // query 100 retrieved docs 1..5 at ranks 1..5; relevant = {2, 4, 9}
    // (9 never retrieved), so hits land at ranks 2 and 4
    val run = (1L to 5L).map(d => (100L, d, d.toInt)).toDF("q", "d", "rank")
    val qrels = Seq((100L, 2L), (100L, 4L), (100L, 9L)).toDF("q", "d")
    val r = Retrieval.rankEval(run, qrels, "q", "d", "rank", k = 5)
      .collect().head
    val w = (1 to 5).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    def det6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getInt(1) === 2)                      // hits
    assert(r.getLong(2) === 3L)                    // rel_total
    assert(r.getDouble(3) === det6(2.0 / 5.0))     // precision@5
    assert(r.getDouble(4) === det6(2.0 / 3.0))     // recall@5
    assert(r.getDouble(5) === det6(1.0 / 2.0))     // rr: first hit at rank 2
    val dcg = w(1) + w(3)                          // bits at ranks 2 and 4
    val idcg = w(0) + w(1) + w(2)                  // ideal: 3 rels in top 3
    assert(r.getDouble(6) === det6(dcg / idcg))    // ndcg@5
  }

  test("rankEval: perfect ranking scores ndcg 1; zero hits score 0; no qrels -> nulls") {
    val run = (1L to 3L).map(d => (1L, d, d.toInt)) ++   // q1: all 3 relevant
      (11L to 13L).map(d => (2L, d, (d - 10L).toInt)) ++ // q2: none relevant
      (21L to 23L).map(d => (3L, d, (d - 20L).toInt))    // q3: not in qrels
    val qrels = (1L to 3L).map(d => (1L, d)) ++ Seq((2L, 99L))
    val got = Retrieval.rankEval(
      run.toDF("q", "d", "rank"), qrels.toDF("q", "d"), "q", "d", "rank", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(6) === 1.0)           // perfect ndcg
    assert(got(1L).getDouble(4) === 1.0)           // perfect recall
    assert(got(2L).getInt(1) === 0)                // no hits
    assert(got(2L).getDouble(5) === 0.0)           // rr convention: 0
    assert(got(2L).getDouble(6) === 0.0)           // ndcg 0
    assert(got(3L).getLong(2) === 0L)              // rel_total 0
    assert(got(3L).isNullAt(4) && got(3L).isNullAt(6)) // recall/ndcg undefined
    // beyond-k rows are ignored: a hit at rank 4 must not count at k=3
    val far = Seq((9L, 5L, 4)).toDF("q", "d", "rank")
    val g2 = Retrieval.rankEval(far, Seq((9L, 5L)).toDF("q", "d"),
      "q", "d", "rank", k = 3)
    assert(g2.count() === 0L)                      // all rows filtered out
    intercept[IllegalArgumentException] {
      Retrieval.rankEval(far, far, "q", "d", "rank", k = 63)
    }
  }

  test("rankEvalMacro: DECIMAL-summed means, nulls excluded per metric") {
    val perQuery = Seq(
      (1L, 2, 3L, Some(0.4), Some(0.666667), 0.5, Some(0.75)),
      (2L, 0, 0L, Some(0.0), Option.empty[Double], 0.0, Option.empty[Double]),
      (3L, 1, 1L, Some(0.2), Some(1.0), 1.0, Some(0.5)))
      .toDF("query_id", "hits", "rel_total",
        "precision_k", "recall_k", "rr", "ndcg_k")
    val r = Retrieval.rankEvalMacro(perQuery).collect().head
    def det6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === det6(0.6 / 3))            // mean precision
    assert(r.getDouble(2) === det6(1.666667 / 2))       // nulls excluded
    assert(r.getDouble(3) === det6(1.5 / 3))
    assert(r.getDouble(4) === det6(1.25 / 2))
  }

  test("rankEval: metrics are stable under repartitioning (integer bitmask core)") {
    val run = (0L until 40L).flatMap(q =>
      (1 to 10).map(i => (q, q * 100 + i, i))).toDF("q", "d", "rank")
    val qrels = (0L until 40L).flatMap(q =>
      Seq((q, q * 100 + 3), (q, q * 100 + 7), (q, q * 100 + 50))).toDF("q", "d")
    val a = Retrieval.rankEval(run, qrels, "q", "d", "rank", k = 10)
      .orderBy("query_id").collect().toSeq
    val b = Retrieval.rankEval(run.repartition(13), qrels.repartition(7),
      "q", "d", "rank", k = 10).orderBy("query_id").collect().toSeq
    assert(a === b)
  }

  // ---- maxSimRerank (round 11) ----

  private def msCorpus = Seq(
    (0L, "alpha beta gamma delta"),             // query
    (1L, "alpha beta gamma delta"),             // exact token twin -> maxsim 1
    (2L, "alpha beta gamma zeta"),              // 3/4 tokens shared
    (3L, "omega psi chi phi"),                  // disjoint
    (4L, ""),                                   // empty -> dropped both sides
    (5L, "alpha alpha alpha beta gamma delta")  // same DISTINCT set as 0
  ).toDF("doc_id", "text")

  test("maxSimRerank: token-set twins score exactly 1.0 and rank first; self and empty excluded") {
    val got = Retrieval.maxSimRerank(
      msCorpus, "doc_id", "text",
      msCorpus.filter(col("doc_id") === 0), "doc_id", "text",
      shortlist = 10, topK = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(!got.exists(_._1 == 0L), "query must not match itself")
    assert(!got.exists(_._1 == 4L), "empty-token doc must drop")
    val byId = got.map(t => t._1 -> t).toMap
    // identical DISTINCT token sets: every query token finds an exact
    // signature match, so maxsim = 64*|q| / (64*|q|) = 1.0 exactly;
    // the tie between docs 1 and 5 breaks by doc_id
    assert(byId(1L)._2 === 1.0 && byId(1L)._3 === 1)
    assert(byId(5L)._2 === 1.0 && byId(5L)._3 === 2)
    // 3/4 overlap beats the disjoint doc; everything stays in [-1, 1]
    assert(byId(2L)._2 < 1.0 && byId(2L)._2 > byId(3L)._2)
    assert(got.forall(t => t._2 >= -1.0 && t._2 <= 1.0))
  }

  test("maxSimRerank: topK bounds output per query with dense 1..k ranks") {
    val docs = (0L to 40L).map(i => (i, s"tok$i shared common words"))
      .toDF("doc_id", "text")
    val got = Retrieval.maxSimRerank(
      docs, "doc_id", "text",
      docs.filter(col("doc_id") < 2), "doc_id", "text",
      shortlist = 8, topK = 3).collect()
    val perQ = got.groupBy(_.getLong(0))
    assert(perQ.keySet === Set(0L, 1L))
    perQ.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length))
    }
  }

  test("maxSimRerank plan: bounded heaps only — no window, no corpus-side sort") {
    val plan = Retrieval.maxSimRerank(
      msCorpus, "doc_id", "text",
      msCorpus.filter(col("doc_id") < 2), "doc_id", "text",
      shortlist = 4, topK = 3).queryExecution.executedPlan.toString
    // both cuts run in the bounded-heap TopK aggregate, never a
    // windowed rank over the corpus (the Dedup no-per-hash-window
    // discipline, applied to retrieval)
    assert(!plan.contains("windowspecdefinition"),
      s"corpus-wide window leaked into the maxSim plan:\n$plan")
    assert(plan.toLowerCase.contains("topkagg"),
      s"bounded-heap TopK aggregate missing from the maxSim plan:\n$plan")
  }

  test("maxSimRerank: stable under repartitioning (integer interaction core)") {
    val base = Retrieval.maxSimRerank(
      msCorpus, "doc_id", "text",
      msCorpus.filter(col("doc_id") < 2), "doc_id", "text",
      shortlist = 4, topK = 3).collect().toSet
    val shuffled = Retrieval.maxSimRerank(
      msCorpus.repartition(7), "doc_id", "text",
      msCorpus.filter(col("doc_id") < 2), "doc_id", "text",
      shortlist = 4, topK = 3).collect().toSet
    assert(base === shuffled)
    assert(base.nonEmpty)
  }
}
