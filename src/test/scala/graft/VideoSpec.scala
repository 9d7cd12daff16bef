package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Video path (round 11): sampled-frame energy fingerprints over
  * pattern containers, shared-scene Jaccard pairing through the
  * geometric double-block, and the offset-shift invariance the
  * frame-SET semantics exist for.
  */
class VideoSpec extends SparkSpecBase {
  import spark.implicits._

  private val F = 32 // frameBytes

  test("videoFrameEnergies: exact byte^2 sums per sampled frame; short/partial payloads safe") {
    val bytes = Multimodal.encodePatternVideo(seed = 42L, frames = 6, frameBytes = F)
    val all = Multimodal.videoFrameEnergies(bytes, headerBytes = 8, frameBytes = F, everyN = 1)
    assert(all.length === 6)
    // recompute frame 0's energy directly from the payload bytes
    val manual = (0 until F).map { i =>
      val b = (bytes(8 + i) & 0xFF).toLong; b * b
    }.sum
    assert(all(0) === manual)
    // everyN=2 samples frames 0, 2, 4
    val sampled = Multimodal.videoFrameEnergies(bytes, 8, F, everyN = 2)
    assert(sampled.toSeq === Seq(all(0), all(2), all(4)))
    // shorter than one frame -> empty, no crash; trailing partial frame ignored
    assert(Multimodal.videoFrameEnergies(Array.fill[Byte](7)(1), 8, F, 1).isEmpty)
    assert(Multimodal.videoFrameEnergies(bytes.take(8 + F + 3), 8, F, 1).length === 1)
  }

  test("videoNearDup: planted shared-scene pair at exact Jaccard 0.6; strangers absent") {
    // docs 0/1 share a 30-frame scene (seed 99) ahead of 10 own frames;
    // docs 2/3 are unrelated single scenes.
    val rows = Seq(
      (0L, 10L, 99L, 0, 30),
      (1L, 11L, 99L, 0, 30),
      (2L, 12L, 0L, -1, 0),
      (3L, 13L, 0L, -1, 0)
    ).toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    val got = Multimodal.videoNearDup(
      Multimodal.withPatternVideo(rows, "__seed", "__shseed", "__shfrom", "__shcount"),
      "doc_id", "video")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // sampled sets: 15 shared of 20 each -> 15/(20+20-15) = 0.6
    assert(got.toSeq === Seq((0L, 1L, 0.6)))
  }

  test("videoNearDup: a scene shifted by an even offset still matches (set semantics)") {
    // doc 0 embeds the scene at frame 0, doc 1 at frame 2 — positional
    // hashing would miss it; the sampled frame SET intersects on the
    // same 15 scene fingerprints (even shift preserves sampled
    // scene-relative parity).
    val rows = Seq(
      (0L, 10L, 99L, 0, 30),
      (1L, 11L, 99L, 2, 30)
    ).toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    val got = Multimodal.videoNearDup(
      Multimodal.withPatternVideo(rows, "__seed", "__shseed", "__shfrom", "__shcount"),
      "doc_id", "video")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 1 && got(0)._1 === 0L && got(0)._2 === 1L)
    assert(got(0)._3 >= 0.5)
  }

  test("VideoGate: cross-batch scene twin rejected via state; replay idempotent") {
    // 36 of 40 frames shared -> sampled sets share 18 of 20 (Jaccard
    // ~0.82), far above the 0.5 gate threshold on the minhash estimate.
    val rows = Seq(
      (0L, 10L, 99L, 0, 36), // batch 0 — accepted (first-wins)
      (1L, 11L, 99L, 0, 36), // batch 1 — scene twin of 0, rejected via STATE
      (2L, 12L, 0L, -1, 0),  // batch 0 — unique, accepted
      (3L, 13L, 0L, -1, 0)   // batch 1 — unique, accepted
    ).toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    val vids = Multimodal.withPatternVideo(
      rows, "__seed", "__shseed", "__shfrom", "__shcount")
    val state = java.nio.file.Files
      .createTempDirectory("vidgate_spec").toString
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a0 = ids(graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "video", state))
    val a1 = ids(graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", state))
    assert(a0 === Set(0L, 2L))
    assert(a1 === Set(3L), "the scene twin must be rejected by state, not accepted")
    // failure-recovery replay of batch 1 overwrites its own partition
    // and returns the same acceptance
    val a1b = ids(graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", state))
    assert(a1b === a1)
  }

  test("AVI: uniform-gray JPEG round-trips bit-exactly for ALL 256 grays (oracle invariant)") {
    // The q_video_neardup_avi oracle predicts DECODED energies as
    // width*height*g^2 — valid iff the JPEG encode/decode is identity
    // on uniform-gray frames at quality 1.0. Pin it for the whole
    // gray domain at the fixture frame size so a codec behavior
    // change fails HERE, not as a silent oracle mismatch.
    for (g <- 0 until 256) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeGrayJpeg(g)))
      val px = img.getRaster.getSamples(0, 0, 32, 32, 0, new Array[Int](32 * 32))
      assert(px.forall(_ == g), s"gray $g decoded to ${px.find(_ != g)}")
    }
  }

  test("AVI: mux -> demux round-trips the exact frame payloads (RIFF walk)") {
    val frames = Seq(7, 130, 255, 0).map(Multimodal.encodeGrayJpeg(_))
    val avi = Multimodal.muxMjpegAvi(frames, 32, 32)
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") === "AVI ")
    val back = Multimodal.demuxMjpegAvi(avi)
    assert(back.length === 4)
    for ((f, b) <- frames.zip(back)) assert(java.util.Arrays.equals(f, b))
    // odd-sized frame payloads exercise the even-padding rule
    val odd = Array[Byte](1, 2, 3)
    val avi2 = Multimodal.muxMjpegAvi(Seq(odd, odd), 1, 1)
    assert(Multimodal.demuxMjpegAvi(avi2).forall(java.util.Arrays.equals(_, odd)))
    // non-AVI bytes refuse loudly
    intercept[IllegalArgumentException] {
      Multimodal.demuxMjpegAvi("GRAFTVID0123456789".getBytes("US-ASCII"))
    }
  }

  test("AVI: decoded frame energies are width*height*g^2; videoNearDupAvi finds the planted pair") {
    val rows = Seq(
      (0L, 10L, 99L, 0, 30),
      (1L, 11L, 99L, 0, 30),
      (2L, 12L, 0L, -1, 0),
      (3L, 13L, 0L, -1, 0)
    ).toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    val vids = Multimodal.withMjpegAviVideo(
      rows, "__seed", "__shseed", "__shfrom", "__shcount")
    // energies of doc 0 match the closed form the oracle uses
    val bytes = vids.filter(col("doc_id") === 0L)
      .select("video").head().getAs[Array[Byte]](0)
    val got = Multimodal.aviFrameEnergies(bytes, everyN = 2)
    val want = (0 until 40 by 2).map { k =>
      val z = if (k < 30) Multimodal.splitmix64(99L * 173L + k)
              else Multimodal.splitmix64(10L * 173L + k)
      val g = java.lang.Long.remainderUnsigned(z, 256L)
      32L * 32L * g * g
    }
    assert(got.toSeq === want)
    // the planted pair is found over real demuxed+decoded bytes
    val pairs = Multimodal.videoNearDupAvi(vids, "doc_id", "video")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((0L, 1L)))
  }

  test("AVI VideoGate: cross-batch scene twin rejected via state over real bytes") {
    val rows = Seq(
      (0L, 10L, 99L, 0, 36), // batch 0 — accepted (first-wins)
      (1L, 11L, 99L, 0, 36), // batch 1 — scene twin of 0, rejected via STATE
      (2L, 12L, 0L, -1, 0),  // batch 0 — unique, accepted
      (3L, 13L, 0L, -1, 0)   // batch 1 — unique, accepted
    ).toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    val vids = Multimodal.withMjpegAviVideo(
      rows, "__seed", "__shseed", "__shfrom", "__shcount")
    val state = java.nio.file.Files
      .createTempDirectory("vidgate_avi_spec").toString
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a0 = ids(graft.streaming.VideoGate.acceptBatchAvi(
      vids.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "video", state))
    val a1 = ids(graft.streaming.VideoGate.acceptBatchAvi(
      vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", state))
    assert(a0 === Set(0L, 2L))
    assert(a1 === Set(3L), "the scene twin must be rejected by state, not accepted")
  }

  test("hashed fingerprints: pattern and AVI variants find the planted pair, match the energy path") {
    val rows = Seq(
      (0L, 10L, 99L, 0, 30),
      (1L, 11L, 99L, 0, 30),
      (2L, 12L, 0L, -1, 0),
      (3L, 13L, 0L, -1, 0)
    ).toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    // pattern envelope: in-plan slice+xxhash64 pairs ≡ energy pairs
    // (identical frame bytes hash identically; the planted layout has
    // no energy collisions, so the pair SETS coincide)
    val vids = Multimodal.withPatternVideo(
      rows, "__seed", "__shseed", "__shfrom", "__shcount")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOf(Multimodal.videoNearDupHashed(vids, "doc_id", "video")) ===
      pairsOf(Multimodal.videoNearDup(vids, "doc_id", "video")))
    // AVI: raw-frame xxhash64 finds the same planted pair
    val avis = Multimodal.withMjpegAviVideo(
      rows, "__seed", "__shseed", "__shfrom", "__shcount")
    assert(pairsOf(Multimodal.videoNearDupAviHashed(avis, "doc_id", "video"))
      .contains((0L, 1L)))
    // no fabricated pairs among the unique-scene docs
    assert(!pairsOf(Multimodal.videoNearDupAviHashed(avis, "doc_id", "video"))
      .exists(p => p._1 >= 2L))
  }

  test("videoNearDup: stable under repartitioning; threshold gate respected") {
    val rows = (0L until 12L).map { i =>
      if (i < 4) (i, i + 10L, (i / 2) + 99L, 0, 30) // two planted pairs
      else (i, i + 10L, 0L, -1, 0)
    }.toDF("doc_id", "__seed", "__shseed", "__shfrom", "__shcount")
    def run(df: org.apache.spark.sql.DataFrame) = Multimodal.videoNearDup(
      Multimodal.withPatternVideo(df, "__seed", "__shseed", "__shfrom", "__shcount"),
      "doc_id", "video").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(rows)
    val b = run(rows.repartition(7))
    assert(a === b)
    assert(a === Set((0L, 1L), (2L, 3L)))
  }
}
