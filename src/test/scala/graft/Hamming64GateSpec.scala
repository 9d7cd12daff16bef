package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Multimodal
import graft.streaming.Hamming64Gate

/** Streaming 64-bit-signature near-dup gate: one gate for every
  * banded-Hamming modality (SimHash text, perceptual image hashes,
  * audio fingerprints) on the shared SigGate core — first-wins
  * across batches, exact-mode chain transitivity, idempotent replay,
  * and real image/audio payload drives.
  */
class Hamming64GateSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sigsDf(rows: (Long, Long)*) = rows.toDF("id", "sig")

  // A→B→C chain in Hamming space: adjacent distances 3, end-to-end 6.
  private val sigA = 0x0123456789ABCDEFL
  private val sigB = sigA ^ 0x7L                 // 3 low bits
  private val sigC = sigB ^ 0x7000000000000000L  // 3 high bits

  test("first batch: intra-batch near-sigs collapse to min id; far sigs pass") {
    val state = tmp("h64_state")
    val acc = Hamming64Gate.acceptBatch(
      sigsDf(10L -> sigA, 11L -> (sigA ^ 0x3L), 20L -> ~sigA),
      0L, "id", "sig", state)
      .select("id").as[Long].collect().toSet
    assert(acc === Set(10L, 20L))
  }

  test("starIntra: identical-signature cliques collapse exactly like all-pairs") {
    // 10 identical signatures + distinct ones: hub verification
    // (hamming to the bucket min-id = 0) must accept the same set as
    // all-pairs, with O(k) bit_count checks instead of k(k-1)/2.
    val clique = (100L until 110L).map(_ -> sigA)
    val b0 = sigsDf((clique ++ Seq(20L -> ~sigA, 30L -> (~sigA ^ 0xF0F0L))): _*)
    val sAll = tmp("h64_all"); val sStar = tmp("h64_star")
    val accAll = Hamming64Gate.acceptBatch(b0, 0L, "id", "sig", sAll)
      .select("id").as[Long].collect().toSet
    val accStar = Hamming64Gate.acceptBatch(b0, 0L, "id", "sig", sStar,
        starIntra = true)
      .select("id").as[Long].collect().toSet
    assert(accStar === accAll)
    assert(accStar.contains(100L) && !accStar.exists(id => id > 100L && id < 110L))
    // state rejection unchanged in star mode
    val acc1 = Hamming64Gate.acceptBatch(sigsDf(200L -> (sigA ^ 0x1L)),
        1L, "id", "sig", sStar, starIntra = true)
      .select("id").as[Long].collect().toSet
    assert(acc1 === Set.empty[Long])
  }

  test("later batch rejects sigs near an earlier accepted one; replay is idempotent") {
    val state = tmp("h64_state")
    Hamming64Gate.acceptBatch(sigsDf(10L -> sigA), 0L, "id", "sig", state).collect()
    val b1 = sigsDf(40L -> sigB, 50L -> ~sigA)
    val first = Hamming64Gate.acceptBatch(b1, 1L, "id", "sig", state)
      .select("id").as[Long].collect().toSet
    assert(first === Set(50L))
    val stateRows = Hamming64Gate.readState(spark, state).count()
    val replay = Hamming64Gate.acceptBatch(b1, 1L, "id", "sig", state)
      .select("id").as[Long].collect().toSet
    assert(replay === first)
    assert(Hamming64Gate.readState(spark, state).count() === stateRows)
  }

  test("exact mode resolves chains through rejected sigs; default mode truncates them") {
    for (exact <- Seq(true, false)) {
      val state = tmp("h64_state")
      def step(rows: Seq[(Long, Long)], id: Long) =
        Hamming64Gate.acceptBatch(sigsDf(rows: _*), id, "id", "sig", state,
          exact = exact).select("id").as[Long].collect().toSet
      assert(step(Seq(1L -> sigA), 0L) === Set(1L))
      assert(step(Seq(2L -> sigB), 1L) === Set.empty[Long]) // d(A,B)=3
      // C is 3 from the REJECTED B but 6 from the accepted A
      val got = step(Seq(3L -> sigC), 2L)
      if (exact) assert(got === Set.empty[Long]) else assert(got === Set(3L))
      if (exact) {
        val keepers = Hamming64Gate.readState(spark, state)
          .select("doc_id", "keeper").distinct()
          .as[(Long, Long)].collect().toMap
        assert(keepers === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
      }
    }
  }

  test("drives real image payloads: dHash twins across batches dedup first-wins") {
    val state = tmp("h64_state")
    def hashed(rows: Seq[(Long, Long, Int, Int)]) =
      Multimodal.withImageHash(
        Multimodal.withPatternPng(
          rows.toDF("id", "__seed", "__delta", "__flip"),
          "__seed", "__delta", "__flip"),
        "img")().select("id", "dhash")
    Hamming64Gate.acceptBatch(
      hashed(Seq((10L, 1L, 0, -1), (20L, 2L, 0, -1))),
      0L, "id", "dhash", state).collect()
    // 40 = brightness-shifted one-cell-flipped twin of 10's pattern
    val acc = Hamming64Gate.acceptBatch(
      hashed(Seq((40L, 1L, 4, 21), (50L, 60L, 0, -1))),
      1L, "id", "dhash", state)
      .select("id").as[Long].collect().toSet
    assert(acc === Set(50L))
  }

  test("drives real audio payloads: gain-doubled clips dedup across batches") {
    val state = tmp("h64_state")
    def hashed(rows: Seq[(Long, Long, Int, Int)]) =
      Multimodal.withAudioHash(
        Multimodal.withPatternWav(
          rows.toDF("id", "__seed", "__gain", "__quiet"),
          "__seed", "__gain", "__quiet"),
        "wav").select("id", "ahash")
    Hamming64Gate.acceptBatch(
      hashed(Seq((10L, 5L, 1, -1))), 0L, "id", "ahash", state).collect()
    val acc = Hamming64Gate.acceptBatch(
      hashed(Seq((40L, 5L, 2, 30), (50L, 90L, 1, -1))),
      1L, "id", "ahash", state)
      .select("id").as[Long].collect().toSet
    assert(acc === Set(50L))
  }

  test("end-to-end streaming gate over MemoryStream micro-batches") {
    val state = tmp("h64_state"); val out = tmp("h64_out")
    val ckpt = tmp("h64_ckpt")
    val input = MemoryStream[(Long, Long)](spark)
    val q = Hamming64Gate.gate(
      input.toDF().toDF("id", "sig"), "id", "sig", state, out, ckpt)
    try {
      input.addData(10L -> sigA, 11L -> (sigA ^ 0x3L), 20L -> ~sigA)
      q.processAllAvailable()
      input.addData(40L -> sigB, 50L -> (sigA ^ 0x00FF00FF00FF00FFL))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(out)
      .select("id").as[Long].collect().toSet
    assert(accepted === Set(10L, 20L, 50L))
  }
}
