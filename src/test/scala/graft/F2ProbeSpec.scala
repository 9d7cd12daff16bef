package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The zero-pass auto-star probe (round 14): the bucket-occupancy
  * estimate rides the signature materialization as AMS/F2 observe
  * metrics instead of a per-batch aggregate+collect job. Pins (1)
  * that reading the estimate launches NO Spark job, (2) estimator
  * accuracy against the exact Σ k(k−1)/2, and (3) that trip decisions
  * match the exact probe's on both sides of the cap.
  */
class F2ProbeSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus(cliqueSize: Int): org.apache.spark.sql.DataFrame = {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "with enough tokens to shingle into a stable signature"
    val clique = (100L until (100L + cliqueSize)).map(_ -> base)
    val uniques = Seq(
      20L -> "completely different text about spark partitions and shuffles here",
      30L -> "short unique text")
    (clique ++ uniques).toDF("doc_id", "text")
  }

  test("probed estimate within 2x of exact; empty frame reads 0") {
    val docs = corpus(12)
    val plan = Dedup.bandedSigsPlan(docs, "doc_id", "text")
    val (sigs, est) = Dedup.materializeSigsProbed(plan)
    val exact = Dedup.estIntraPairs(sigs)
    // 12-clique: identical signatures share one 12-member bucket per
    // band → 16 · 66 = 1056 exact estimated pairs
    assert(exact === 16L * 66L)
    // a 16-heavy-bucket toy corpus is AMS's WORST regime (few keys →
    // sign cancellation, std ≈ √(2/32) = 25%; this seed measures 35%
    // low). The trip wire only needs order-of-magnitude fidelity —
    // its calibration points (oracle corpora ~10³–10⁴, cap 2²⁰,
    // 300×-dupes ~5.6M) sit decades apart — so pin a factor-2 band
    // here and tight concentration on the mixed corpus below.
    val e = est()
    assert(e >= exact / 2 && e <= exact * 2,
      s"AMS estimate $e vs exact $exact")
    // deterministic: same data, same hash, same estimate
    val (_, est2) = Dedup.materializeSigsProbed(
      Dedup.bandedSigsPlan(docs, "doc_id", "text"))
    assert(est2() === e)
    val (_, estEmpty) = Dedup.materializeSigsProbed(
      Dedup.bandedSigsPlan(docs.filter($"doc_id" < 0), "doc_id", "text"))
    assert(estEmpty() === 0L)
  }

  test("compact probe ≡ exploded probe: identical estimate, identical banded rows, empty reads 0") {
    val docs = corpus(12)
    // same multiset of (band, bucket) hashes → bit-identical estimate
    val (_, estBanded) = Dedup.materializeSigsProbed(
      Dedup.bandedSigsPlan(docs, "doc_id", "text"))
    val (compactCut, estCompact) = Dedup.materializeCompactProbed(
      Dedup.compactSigsPlan(docs, "doc_id", "text"), bands = 16, rows = 4)
    assert(estCompact() === estBanded())
    // re-banding the compact cut reproduces the exploded frame exactly
    val rebanded = Dedup.bandExplode(compactCut, 16, 4)
      .select("doc_id", "band", "bucket")
    val direct = Dedup.bandedSigsPlan(docs, "doc_id", "text")
      .select("doc_id", "band", "bucket")
    assert(rebanded.exceptAll(direct).isEmpty && direct.exceptAll(rebanded).isEmpty)
    val (_, estE) = Dedup.materializeCompactProbed(
      Dedup.compactSigsPlan(docs.filter($"doc_id" < 0), "doc_id", "text"),
      bands = 16, rows = 4)
    assert(estE() === 0L)
  }

  test("mixed corpus (many buckets): estimate concentrates within 25% of exact") {
    // hundreds of distinct buckets — the production regime, where the
    // lane sums concentrate (variance spreads over many keys)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).flatMap { g =>
      val base = Seq.fill(18)(rnd.nextInt(3000)).map(i => f"w$i%04d").mkString(" ")
      val copies = 2 + (g % 5)
      (0 until copies).map(c => (g * 100L + c) -> base)
    }
    val (sigs, est) = Dedup.materializeSigsProbed(
      Dedup.bandedSigsPlan(rows.toDF("doc_id", "text"), "doc_id", "text"))
    val exact = Dedup.estIntraPairs(sigs)
    val e = est()
    assert(exact > 1000L, s"corpus too small to measure: $exact")
    assert(math.abs(e - exact).toDouble / exact <= 0.25,
      s"AMS estimate $e vs exact $exact")
  }

  test("reading the estimate launches zero Spark jobs (the probe rides the cut)") {
    val (_, est) = Dedup.materializeSigsProbed(
      Dedup.bandedSigsPlan(corpus(12), "doc_id", "text"))
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val e = est()
      // listener events are async — give the bus a beat before
      // asserting nothing was posted
      Thread.sleep(500)
      assert(e > 0L)
      assert(jobs === 0, "the estimate must come from observed metrics, not a job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("trip decisions match the exact probe's on both sides of the cap") {
    val plan = Dedup.bandedSigsPlan(corpus(12), "doc_id", "text")
    // exact = 1056: cap 50 must trip, cap 10^5 must not — for BOTH
    // the probed decision and the exact-aggregate one
    val (_, trip) = Dedup.sigsWithStarDecision(plan, force = false, cap = 50L)
    assert(trip)
    val (_, noTrip) = Dedup.sigsWithStarDecision(plan, force = false, cap = 100000L)
    assert(!noTrip)
    val (sigsPinned, pinned) =
      Dedup.sigsWithStarDecision(plan, force = false, cap = Long.MaxValue)
    assert(!pinned)
    // the pinned path attaches NO probe node to the materialized plan
    assert(!sigsPinned.columns.contains("__f2h"))
    val (_, forced) = Dedup.sigsWithStarDecision(plan, force = true, cap = 50L)
    assert(forced)
  }
}
