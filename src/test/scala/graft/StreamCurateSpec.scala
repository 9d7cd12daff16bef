package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Curation
import graft.streaming.StreamCurate

/** Composed streaming curation (quality gate → near-dup gate → token
  * budget → split) as one driven stream: stage composition semantics
  * across micro-batches, budget state carry-over, and single-batch
  * equivalence with the batch pipeline.
  */
class StreamCurateSpec extends SparkSpecBase {

  import spark.implicits._

  // Quality-passing sentences (≥10 tokens, stopword/punct/rep ratios
  // inside the Gopher band); distinct enough not to near-dup each
  // other at the MinHash 0.5 threshold.
  private val tA = "the quick brown fox jumps over the lazy dog tonight again"
  private val tB = "distributed query engines shuffle data between stages for joins always"
  private val tC = "many small files under a table root slow the scan for everyone"
  private val tD = "vector search finds the nearest neighbors of an embedding in milliseconds"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def drive(
      batches: Seq[Seq[(Long, String, String)]],
      budget: Long): org.apache.spark.sql.DataFrame = {
    val (nd, bud, acc, ckp) =
      (tmp("scur_nd"), tmp("scur_bud"), tmp("scur_acc"), tmp("scur_ckp"))
    val input = MemoryStream[(Long, String, String)](spark)
    val q = StreamCurate.gate(
      input.toDF().toDF("doc_id", "lang", "text"),
      "doc_id", "text", "lang", nd, bud, acc, ckp,
      budgetPerLang = budget, validPct = 10)
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.read.parquet(acc)
  }

  test("stages compose across batches: quality-fail, cross-batch near-dup, keeper") {
    val got = drive(Seq(
      Seq( // batch 0
        (2L, "en", tA),
        (4L, "en", tA.replace("again", "anew")), // intra-batch dup of 2
        (7L, "en", "hi yo")),                    // quality fail (2 tokens)
      Seq( // batch 1
        (3L, "en", tA.replace("again", "afresh")), // dup of accepted 2 via state
        (5L, "en", tB))), budget = 5000L)
    val rows = got.select("doc_id", "n_tokens", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet === Set(2L, 5L))
    assert(rows(2L)._2 === 11L && rows(5L)._2 === 10L)
    // split twin: the same bucket rule as the batch pipeline
    val wantSplit = Map(2L -> 2L, 5L -> 5L).map { case (id, _) =>
      id -> (if (((id % 2147483647L) * 2654435761L % 2147483647L) % 100 < 90)
        "train" else "valid")
    }
    rows.foreach { case (id, r) => assert(r._3 === wantSplit(id)) }
  }

  test("token budget carries spend across batches per language") {
    // 11+12 tokens land in batch 0 (both accepted: before-spend < 15);
    // batch 1's doc sees prior spend 23 ≥ 15 → rejected.
    val got = drive(Seq(
      Seq((10L, "fr", tA), (12L, "fr", tC)),
      Seq((11L, "fr", tD))), budget = 15L)
    assert(got.select("doc_id").as[Long].collect().toSet === Set(10L, 12L))
  }

  test("exact mode: a doc matching only a REJECTED doc still resolves to its keeper") {
    // The NearDupGateSpec chain geometry (two spaced 2-word edits so
    // edges are exactly A–B and B–C, never A–C), rebuilt with enough
    // stopwords to pass the quality gate stage in front of the
    // near-dup gate.
    val chainA = "the a01 a02 a03 a04 of a06 a07 a08 a09 " +
      "the a11 a12 a13 a14 in a16 a17 a18 a19"
    val chainB = chainA.replace("a03 a04", "x03 x04")
    val chainC = chainB.replace("a13 a14", "y13 y14")
    val edges = graft.operators.Dedup.minhashCandidates(
        Seq((2L, chainA), (4L, chainB), (6L, chainC)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(edges === Set((2L, 4L), (4L, 6L))) // premise: a real chain
    // Batch 0: 2 keeps, 4 (dup of 2) rejected. Batch 1: 6 dups ONLY
    // the rejected 4. Default mode accepts 6 (4's sig absent from
    // accepted-only state — the documented truncation); exact mode
    // persists 4 keeper-tagged and must reject 6.
    for (exact <- Seq(true, false)) {
      val nd = tmp("scur_nd_x"); val bud = tmp("scur_bud_x")
      val b0 = Seq((2L, "en", chainA), (4L, "en", chainB))
        .toDF("doc_id", "lang", "text")
      val b1 = Seq((6L, "en", chainC)).toDF("doc_id", "lang", "text")
      val acc0 = StreamCurate.curateBatch(b0, 0L, "doc_id", "text", "lang",
          nd, bud, budgetPerLang = 5000L, exact = exact)
        .select("doc_id").as[Long].collect().toSet
      assert(acc0 === Set(2L))
      val acc1 = StreamCurate.curateBatch(b1, 1L, "doc_id", "text", "lang",
          nd, bud, budgetPerLang = 5000L, exact = exact)
        .select("doc_id").as[Long].collect().toSet
      assert(acc1 === (if (exact) Set.empty[Long] else Set(6L)))
    }
  }

  test("catalog replays restore the session's shuffle partitioning") {
    // The harness narrows shuffle partitions to state volume for the
    // replay; a leaked setting would silently re-plan every batch
    // query that runs after a streaming one in the same session.
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    SparkEntry.queries("q_stream_curate")(spark, "/root/testdata/sf0.001")
      .collect() // driven MemoryStream path (TextQueries knob)
    assert(spark.conf.get(key) === before)
    SparkEntry.queries("q_stream_latest")(spark, "/root/testdata/sf0.001")
      .collect() // file-stream snapshot path (StreamingQueries knob)
    assert(spark.conf.get(key) === before)
  }

  test("single batch ≡ the batch Curation pipeline") {
    val docs = Seq(
      (2L, "en", tA), (4L, "en", tA.replace("again", "anew")),
      (5L, "en", tB), (7L, "en", "hi yo"), (10L, "fr", tC))
      .toDF("doc_id", "lang", "text")
    val stream = StreamCurate.curateBatch(docs, 0L, "doc_id", "text", "lang",
        tmp("scur_nd1"), tmp("scur_bud1"), budgetPerLang = 5000L)
      .select("doc_id", "lang", "n_tokens", "split")
      .orderBy("doc_id").collect().toSeq
    val batch = Curation.curate(docs, "doc_id", "text", "lang",
        budgetPerLang = 5000L)
      .select("doc_id", "lang", "n_tokens", "split")
      .orderBy("doc_id").collect().toSeq
    assert(stream === batch)
    assert(stream.nonEmpty)
  }
}
