package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.{NearDupGate, SigGate}

/** Streaming MinHash near-dup gate: first-wins across micro-batches,
  * chain collapse to the earliest keeper, idempotent batch replay, and
  * the real foreachBatch streaming path.
  */
class NearDupGateSpec extends SparkSpecBase {

  import spark.implicits._

  // Three near-dup families (one-token edits of ≥10-token sentences)
  // plus unique docs; family letters mark expected components.
  private val baseA = "the quick brown fox jumps over the lazy dog tonight again"
  private val baseB = "distributed query engines shuffle data between stages for joins always"
  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("first batch: intra-batch dups collapse to min id; uniques pass") {
    val state = tmp("ndg_state")
    val b0 = docsDf(
      10L -> baseA, 11L -> baseA.replace("tonight", "today"),
      20L -> baseB, 30L -> "short unique text")
    val acc = NearDupGate.acceptBatch(b0, 0L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(acc === Set(10L, 20L, 30L))
  }

  test("later batch rejects near-dups of earlier accepted docs") {
    val state = tmp("ndg_state")
    NearDupGate.acceptBatch(docsDf(10L -> baseA, 20L -> baseB),
      0L, "doc_id", "text", state).collect()
    val acc1 = NearDupGate.acceptBatch(
      docsDf(
        40L -> baseA.replace("again", "anew"), // dup of accepted 10
        50L -> "a genuinely new document about completely different things"),
      1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(acc1 === Set(50L))
  }

  test("a component touching stream history rejects ALL its members") {
    val state = tmp("ndg_state")
    NearDupGate.acceptBatch(docsDf(10L -> baseA), 0L, "doc_id", "text", state)
      .collect()
    // 40 dups accepted-10; 41 dups 40 (and 10). Batch CC over the whole
    // corpus would put {10, 40, 41} in one component with keeper 10 —
    // so BOTH 40 and 41 must go, even though 40 is its component's min.
    val acc1 = NearDupGate.acceptBatch(
      docsDf(
        40L -> baseA.replace("again", "anew"),
        41L -> baseA.replace("again", "afresh")),
      1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(acc1 === Set.empty[Long])
  }

  test("replaying a batch is idempotent (state + output identical)") {
    val state = tmp("ndg_state")
    NearDupGate.acceptBatch(docsDf(10L -> baseA), 0L, "doc_id", "text", state)
      .collect()
    val b1 = docsDf(40L -> baseA.replace("again", "anew"), 50L -> baseB)
    val first = NearDupGate.acceptBatch(b1, 1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    val stateRows = NearDupGate.readState(spark, state).count()
    // failure recovery re-runs the same micro-batch
    val replay = NearDupGate.acceptBatch(b1, 1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(replay === first)
    assert(first === Set(50L))
    assert(NearDupGate.readState(spark, state).count() === stateRows)
  }

  test("a clean batch (no dups anywhere) passes through whole") {
    val state = tmp("ndg_state")
    val acc = NearDupGate.acceptBatch(
      docsDf(1L -> baseA, 2L -> baseB), 0L, "doc_id", "text", state)
    assert(acc.count() === 2L)
  }

  // Chain A→B→C spanning batches: B is a near-dup of A, C of B, but C
  // is FAR from A (edits at opposite ends compound). 20 tokens → 18
  // 3-shingles; a 2-token mid-run edit flips 4 shingles (J ≈ 0.64 ≥
  // 0.5), two such edits at opposite ends flip 8 (J ≈ 0.38 < 0.5).
  private val chainA = "t01 t02 t03 t04 t05 t06 t07 t08 t09 t10 " +
    "t11 t12 t13 t14 t15 t16 t17 t18 t19 t20"
  private val chainB = chainA.replace("t04 t05", "x04 x05")
  private val chainC = chainB.replace("t15 t16", "y15 y16")

  test("starIntra: exact-dup cliques collapse identically to all-pairs; O(k) verified pairs") {
    // A 12-member exact-duplicate clique plus uniques: star candidates
    // (every member vs the bucket's min-id hub) must produce the SAME
    // acceptance as the all-pairs form — identical signatures make
    // est-Jaccard to the hub exactly 1 — while verifying O(k) pairs
    // instead of k(k-1)/2.
    val clique = (100L until 112L).map(_ -> baseA)
    val uniques = Seq(20L -> baseB, 30L -> "short unique text")
    val b0 = docsDf((clique ++ uniques): _*)
    val sAll = tmp("ndg_all"); val sStar = tmp("ndg_star")
    val accAll = NearDupGate.acceptBatch(b0, 0L, "doc_id", "text", sAll)
      .select("doc_id").as[Long].collect().toSet
    val accStar = NearDupGate.acceptBatch(b0, 0L, "doc_id", "text", sStar,
        starIntra = true)
      .select("doc_id").as[Long].collect().toSet
    assert(accStar === accAll)
    assert(accStar === Set(100L, 20L, 30L))
    // later batch: state rejection works the same in star mode
    val acc1 = NearDupGate.acceptBatch(
        docsDf(200L -> baseA, 210L -> "another fresh unique line of words here"),
        1L, "doc_id", "text", sStar, starIntra = true)
      .select("doc_id").as[Long].collect().toSet
    assert(acc1 === Set(210L))
  }

  test("autoStarPairsCap: dup-heavy batches trip the star switch by default args semantics") {
    // Round 13: the 19× dup-heavy mitigation is default BEHAVIOR, not
    // a caller knob — a bucket-occupancy probe over the materialized
    // signatures flips to hub-star when the estimated all-pairs
    // verification load crosses the cap. A 12-member clique is
    // 12·11/2 = 66 estimated pairs per shared bucket: cap 50 trips
    // (acceptance must equal the forced-star run), cap MaxValue pins
    // all-pairs (equal here too — cliques are exact under star).
    val clique = (100L until 112L).map(_ -> baseA)
    val uniques = Seq(20L -> baseB, 30L -> "short unique text")
    val b0 = docsDf((clique ++ uniques): _*)
    val sAuto = tmp("ndg_auto"); val sPin = tmp("ndg_pin")
    val accAuto = NearDupGate.acceptBatch(b0, 0L, "doc_id", "text", sAuto,
        autoStarPairsCap = 50L)
      .select("doc_id").as[Long].collect().toSet
    assert(accAuto === Set(100L, 20L, 30L))
    val accPinned = NearDupGate.acceptBatch(b0, 0L, "doc_id", "text", sPin,
        autoStarPairsCap = Long.MaxValue)
      .select("doc_id").as[Long].collect().toSet
    assert(accPinned === accAuto)
    // the probe itself: sum of k·(k−1)/2 over (band, bucket)
    // occupancies — the clique's identical signatures share one
    // 12-member bucket in each of the 16 bands, so 16 · 66 = 1056
    // estimated pairs (uniques are singletons: 0).
    val sigs = graft.operators.Dedup.bandedSignatures(b0, "doc_id", "text")
    assert(SigGate.estIntraPairs(sigs) === 16L * 66L)
    // empty batch: probe reads 0, no crash on the null sum
    val empty = b0.filter(b0("doc_id") < 0L)
    assert(SigGate.estIntraPairs(
      graft.operators.Dedup.bandedSignatures(empty, "doc_id", "text")) === 0L)
  }

  test("exact mode: a doc matching only a REJECTED doc is rejected; default mode accepts it") {
    // Premise check on the minhash estimates the gate actually uses:
    // edges are exactly A–B and B–C, never A–C.
    val edges = Dedup.minhashCandidates(
        docsDf(1L -> chainA, 2L -> chainB, 3L -> chainC), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(edges === Set((1L, 2L), (2L, 3L)))

    for (exact <- Seq(true, false)) {
      val state = tmp("ndg_state")
      def step(b: DataFrame, id: Long) =
        NearDupGate.acceptBatch(b, id, "doc_id", "text", state, exact = exact)
          .select("doc_id").as[Long].collect().toSet
      assert(step(docsDf(1L -> chainA), 0L) === Set(1L))
      assert(step(docsDf(2L -> chainB), 1L) === Set.empty[Long]) // dup of 1
      // 3 near-matches ONLY the rejected 2: exact mode resolves it
      // transitively to keeper 1 and rejects; the default
      // accepted-only state has no trace of 2, so 3 slips through —
      // the documented approximation, pinned here.
      val batch2 = step(docsDf(3L -> chainC), 2L)
      if (exact) assert(batch2 === Set.empty[Long])
      else assert(batch2 === Set(3L))
      if (exact) {
        // rejected rows persist keeper-tagged, and the keeper is the
        // EARLIEST accepted doc (transitive through 2), not 2 itself
        val keepers = NearDupGate.readState(spark, state)
          .select("doc_id", "keeper").distinct()
          .as[(Long, Long)].collect().toMap
        assert(keepers === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
      }
    }
  }

  test("exact streaming acceptance equals batch dropNearDuplicates over the accumulated corpus") {
    val state = tmp("ndg_state")
    // Batches mix: a chain split across three batches, an intra-batch
    // pair, unique docs.
    val batches = Seq(
      docsDf(1L -> chainA, 20L -> baseB, 30L -> "one of a kind text"),
      docsDf(2L -> chainB, 21L -> baseB.replace("always", "forever"),
        31L -> "another singleton document entirely unrelated"),
      docsDf(3L -> chainC, 40L -> baseA))
    val streamed = batches.zipWithIndex.flatMap { case (b, i) =>
      NearDupGate.acceptBatch(b, i.toLong, "doc_id", "text", state,
        exact = true).select("doc_id").as[Long].collect()
    }.toSet
    val corpus = batches.reduce(_ unionAll _)
    val batchAccepted = Dedup.dropNearDuplicates(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batchAccepted)
  }

  test("end-to-end streaming gate over MemoryStream micro-batches") {
    val state = tmp("ndg_state"); val out = tmp("ndg_out")
    val ckpt = tmp("ndg_ckpt")
    val input = MemoryStream[(Long, String)](spark)
    val q = NearDupGate.gate(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", state, out, ckpt)
    try {
      input.addData(10L -> baseA, 11L -> baseA.replace("tonight", "today"),
        20L -> baseB)
      q.processAllAvailable()
      input.addData(40L -> baseA.replace("again", "anew"), 50L -> "fresh one of a kind content here")
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(accepted === Set(10L, 20L, 50L))
  }
}
