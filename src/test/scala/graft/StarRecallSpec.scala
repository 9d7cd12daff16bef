package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Quantifies the hub-STAR candidate rule's recall bound (round-13
  * verdict task): star verification is EXACT for duplicate cliques
  * (spec'd in `NearDupGateSpec`), and loses a true pair (x, y) only
  * when every bucket the pair shares is hubbed by a doc dissimilar to
  * x or y. This spec (1) constructs that loss shape deterministically
  * so the bound is demonstrably real, and (2) measures it on a
  * seeded borderline-heavy corpus, pinning the exact recall so the
  * number in SURVEY §8 stays honest.
  */
class StarRecallSpec extends SparkSpecBase {

  import spark.implicits._

  test("planted loss shape: a similar pair hubbed only by a dissimilar doc is dropped (pairs), by construction") {
    // Hand-built banded signatures (n = 4 lanes, one band): bucket B
    // holds {h, x, y} with h the min id. est(x, y) = 3/4 ≥ 0.5 but
    // est(h, x) = est(h, y) = 1/4 < 0.5 — the all-pairs rule keeps
    // (x, y), the star rule verifies only against h and loses it.
    val sigs = Seq(
      (1L, Seq(1L, 9L, 8L, 7L), 0, 42L), // h (min id, dissimilar)
      (2L, Seq(1L, 2L, 3L, 4L), 0, 42L), // x
      (3L, Seq(1L, 2L, 3L, 5L), 0, 42L)  // y
    ).toDF("doc_id", "sig", "band", "bucket")
    val all = Dedup.candidatesFromBandedSigs(sigs, n = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val star = Dedup.starCandidatesFromBandedSigs(sigs, n = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all === Set((2L, 3L)))
    assert(star === Set.empty[(Long, Long)],
      s"the dissimilar hub must drop the borderline pair, got $star")
  }

  test("borderline corpus: star recall measured and pinned; star pairs are a subset; cliques stay exact") {
    // 40 near-dup pairs (two-token mid-edit, est ≈ 0.6-0.8) with, per
    // pair, two SMALLER-id "bait" docs at ~0.4 token overlap with the
    // pair — real hub-theft pressure: a bait doc that collides into a
    // shared band bucket becomes its hub and, being dissimilar, eats
    // the pair's verification. Deterministic (seeded) corpus.
    val rnd = new scala.util.Random(71)
    def tokens(ids: Seq[Int]): String = ids.map(i => f"w$i%04d").mkString(" ")
    val rows = (0 until 40).flatMap { p =>
      val base = Seq.fill(20)(rnd.nextInt(4000))
      val edited = base.updated(9, 4000 + p).updated(10, 4400 + p)
      val baitA = base.take(13) ++ Seq.fill(7)(rnd.nextInt(4000))
      val baitB = base.drop(7) ++ Seq.fill(7)(rnd.nextInt(4000))
      Seq(
        (1000L + p, tokens(baitA)), (1100L + p, tokens(baitB)),
        (5000L + p, tokens(base)), (5100L + p, tokens(edited)))
    }
    val docs = rows.toDF("doc_id", "text")
    val sigs = Dedup.bandedSignatures(docs, "doc_id", "text")
    val all = Dedup.candidatesFromBandedSigs(sigs, 64, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val star = Dedup.starCandidatesFromBandedSigs(sigs, 64, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(star.subsetOf(all), "star pairs are verified bucket pairs")
    // the round-18 COMPACT-cut candidate path (what every batch entry
    // point runs) must produce the identical pair sets as these
    // banded-frame reference forms — the parity that keeps the
    // reference implementations honest
    val cut = graft.operators.Materialize(
      Dedup.compactSigsPlan(docs, "doc_id", "text"))
    val allC = Dedup.candidatesFromCompact(cut, 16, 4, 64, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val starC = Dedup.starCandidatesFromCompact(cut, 16, 4, 64, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(allC === all, "compact all-pairs path ≡ banded reference")
    assert(starC === star, "compact star path ≡ banded reference")
    // the planted truth: each (5000+p, 5100+p) pair is a real near-dup
    val planted = (0 until 40).map(p => (5000L + p, 5100L + p)).toSet
    val plantedFound = planted.intersect(all)
    assert(plantedFound.size >= 35, s"minhash should surface most planted pairs, got ${plantedFound.size}")
    val plantedStar = planted.intersect(star)
    // THE NUMBER (SURVEY §8): pair-level star recall on this
    // borderline-heavy adversarial corpus. Deterministic given the
    // seed — pin it exactly so drift is loud. Connectivity-level
    // recall (what keeper dedup consumes) is measured below.
    info(s"star pair recall: ${plantedStar.size}/${plantedFound.size} " +
      s"(all-pairs surfaced ${plantedFound.size}/40 planted; " +
      s"|all|=${all.size}, |star|=${star.size})")
    // THE MEASURED BOUND (recorded in SURVEY §8): 35/37 = 94.6% pair
    // recall under deliberate hub-theft pressure — the two losses are
    // pairs whose EVERY shared bucket got hubbed by a dissimilar
    // smaller-id bait (multi-bucket redundancy protects the rest:
    // est 0.6-0.8 pairs share ~4+ of 16 band buckets, and any bucket
    // holding only the pair is hubbed by the pair itself). Pinned
    // exactly — deterministic seed — so any drift is loud.
    assert(plantedFound.size === 37 && plantedStar.size === 35,
      s"star recall drifted: ${plantedStar.size}/${plantedFound.size} " +
        "(was 35/37) — re-measure and update SURVEY §8")
    // Component-level recall (what keeper dedup consumes): a lost
    // PAIR can still merge through a hub chain, but only via a
    // SIMILAR hub — the planted thieves are dissimilar, so the two
    // lost pairs stay split components. Same number, pinned.
    val comp = Dedup.connectedComponents(
        star.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccRecall = plantedFound.count { case (a, b) =>
      comp.get(a).exists(ca => comp.get(b).contains(ca))
    }
    info(s"star CC recall: $ccRecall/${plantedFound.size}")
    assert(ccRecall === 35, s"CC recall drifted: $ccRecall/37 (was 35/37)")
  }
}
