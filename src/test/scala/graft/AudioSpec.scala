package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** REAL audio path: javax.sound WAV decode exactness, the
  * gain-invariant frame-energy fingerprint, and planted-pair
  * near-dup over the shared banded-Hamming join.
  */
class AudioSpec extends SparkSpecBase {
  import spark.implicits._

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("wavDecode parses a genuine RIFF container: rate, channels, samples, exact energy") {
    val bytes = Multimodal.encodeToneWav(nSamples = 1000, amp = 300, sampleRate = 8000)
    val (nBytes, rate, ch, n, energy) = Multimodal.wavDecode(bytes)
    assert(nBytes === 44L + 2000L) // canonical header + 16-bit samples
    assert(rate === 8000L && ch === 1L && n === 1000L)
    assert(energy === 1000L * 300L * 300L) // every sample is ±amp
  }

  test("wavDecode rejects non-audio bytes and non-16-bit payloads with clear messages") {
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode("definitely not a RIFF container".getBytes)
    }
  }

  test("aHash64: uniform gain is bit-for-bit invariant; one quiet frame flips <= 2 bits; strangers far") {
    for (seed <- Seq(1L, 5L, 9L)) {
      val base = Multimodal.aHash64(Multimodal.encodePatternWav(seed))
      assert(Multimodal.aHash64(Multimodal.encodePatternWav(seed)) === base)
      // gain scales every frame energy by exactly gain^2 — every
      // energy comparison, and so the hash, is unchanged
      assert(Multimodal.aHash64(
        Multimodal.encodePatternWav(seed, gain = 2)) === base)
      assert(Multimodal.aHash64(
        Multimodal.encodePatternWav(seed, gain = 7)) === base)
      // an attenuated frame sits strictly below all others: only its
      // two adjacent comparisons can move (0 is legal — a frame that
      // was already a local minimum keeps both comparisons)
      val drifts = Seq(10, 20, 30, 40, 50).map { f =>
        ham(Multimodal.aHash64(
          Multimodal.encodePatternWav(seed, quietFrame = f)), base)
      }
      assert(drifts.forall(_ <= 2), s"quiet frame moved $drifts bits (seed=$seed)")
      assert(drifts.exists(_ >= 1), s"attenuation never moved a bit (seed=$seed)")
      assert(ham(Multimodal.aHash64(
        Multimodal.encodePatternWav(seed + 40)), base) > 8)
    }
  }

  test("aHash64 of a pattern WAV equals the closed-form amp comparison (oracle premise)") {
    // q_audio_neardup's DuckDB oracle predicts each sig without
    // decoding: frame energies of a pattern clip are 32·(amp·gain)²,
    // so bit k must reduce to amp(k+1) > amp(k) with gain cancelled.
    // Pin the full encode->javax.sound-decode->hash pipeline to that
    // formula over random parameters (the SQL replays this formula).
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def amp(seed: Long, k: Int, quiet: Int): Long = {
      val base = java.lang.Long.remainderUnsigned(
        mix(seed * 131L + k), 180L) * 16L + 256L
      if (k == quiet) base >> 5 else base
    }
    def closedForm(seed: Long, quiet: Int): Long = {
      var bits = 0L
      for (k <- 0 until 64)
        if (amp(seed, k + 1, quiet) > amp(seed, k, quiet)) bits |= 1L << k
      bits
    }
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val seed = rnd.nextInt(10000).toLong
      val gain = 1 + rnd.nextInt(8)
      val quiet = if (rnd.nextBoolean()) rnd.nextInt(65) else -1
      assert(Multimodal.aHash64(
        Multimodal.encodePatternWav(seed, gain = gain, quietFrame = quiet)) ===
        closedForm(seed, quiet), s"seed=$seed gain=$gain quiet=$quiet")
    }
  }

  test("aHash64 stays deterministic on clips shorter than 65 frames") {
    val short = Multimodal.encodeToneWav(nSamples = 40, amp = 500)
    assert(Multimodal.aHash64(short) === Multimodal.aHash64(short))
  }

  test("audioNearDup recovers exactly the planted pairs (banded join, no cartesian)") {
    // 4 planted pairs (2k, 2k+1): odd twin gain-doubled + one quiet
    // frame; 8 unrelated clips
    val rows = (0L until 16L).map { id =>
      val seed = if (id < 8) id / 2 else id + 100
      val gain = if (id < 8 && id % 2 == 1) 2 else 1
      val quiet = if (id < 8 && id % 2 == 1) (id % 65).toInt else -1
      (id, seed, gain, quiet)
    }
    val df = Multimodal.withPatternWav(
      rows.toDF("doc_id", "__seed", "__gain", "__quiet"),
      "__seed", "__gain", "__quiet")
    val nd = Multimodal.audioNearDup(df, "doc_id", "wav", maxHamming = 3)
    val plan = nd.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n${plan.take(800)}")
    val got = nd.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)))
  }

  test("withAudioMeta: decoded struct rides the frame; null payloads fail loudly") {
    val df = Seq((1L, 320, 200), (2L, 640, 1000)).toDF("id", "__n", "__amp")
    val rows = Multimodal.withAudioMeta(
        Multimodal.withToneWav(df, "__n", "__amp"), "wav")
      .select(col("id"), col("audio.n_samples"), col("audio.energy"))
      .as[(Long, Long, Long)].collect()
    assert(rows.toSet === Set(
      (1L, 320L, 320L * 200L * 200L),
      (2L, 640L, 640L * 1000L * 1000L)))
    val withNull = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("id", "wav")
    val e = intercept[Exception] {
      Multimodal.withAudioMeta(withNull, "wav").collect()
    }
    assert(e.getMessage.contains("null") || e.getCause != null)
  }
}
