package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Perceptual-hash image near-dup: dHash/pHash locality on rendered
  * PNGs, the banded-Hamming candidate join (shared with text
  * SimHash), and the planted-pair E2E.
  */
class ImageNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  private def img(seed: Long, delta: Int = 0, flip: Int = -1) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodePatternPng(36, 32, seed, delta, flip)))

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("dHash64: brightness-invariant, ≤2 bits per flipped cell, unrelated far apart") {
    val base = Multimodal.dHash64(img(7L))
    assert(Multimodal.dHash64(img(7L)) === base) // deterministic
    assert(ham(Multimodal.dHash64(img(7L, delta = 4)), base) === 0,
      "uniform brightness shift must not move any dHash bit")
    assert(ham(Multimodal.dHash64(img(7L, flip = 31)), base) <= 2,
      "one inverted cell touches at most its two adjacent comparisons")
    assert(ham(Multimodal.dHash64(img(8L)), base) > 10,
      "different patterns must land far apart")
  }

  test("dHash64 of a pattern PNG equals the closed-form cell comparison (oracle premise)") {
    // q_image_neardup's DuckDB oracle never decodes a PNG: it predicts
    // each sig from the pattern parameters, which is only sound if the
    // real render->encode->decode->dHash pipeline lands on exactly the
    // grid-cell gray comparisons. Pin that equivalence on the JVM over
    // random parameters (the SQL side replays this same formula).
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def gray(seed: Long, cell: Int, delta: Int, flip: Int): Int = {
      val base = (java.lang.Long.remainderUnsigned(
        mix(seed * 73L + cell), 16L) * 16L).toInt
      val g = if (cell == flip) 240 - base else base + delta
      math.max(0, math.min(255, g))
    }
    def closedForm(seed: Long, delta: Int, flip: Int): Long = {
      var bits = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (gray(seed, r * 9 + c, delta, flip) >
            gray(seed, r * 9 + c + 1, delta, flip))
          bits |= 1L << (r * 8 + c)
      bits
    }
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val seed = rnd.nextInt(10000).toLong
      val delta = rnd.nextInt(3) * 4
      val flip = if (rnd.nextBoolean()) rnd.nextInt(72) else -1
      assert(Multimodal.dHash64(img(seed, delta, flip)) ===
        closedForm(seed, delta, flip),
        s"seed=$seed delta=$delta flip=$flip")
    }
  }

  test("dHash64: constant image hashes to 0; non-grid-aligned dims still deterministic") {
    val flat = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodePng(20, 20, 128)))
    assert(Multimodal.dHash64(flat) === 0L)
    // 35x31 misaligns pixels vs the 9x8 box grid — box means are no
    // longer whole cell grays, but the integer walk stays exact
    val odd = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodePatternPng(35, 31, 7L)))
    assert(Multimodal.dHash64(odd) === Multimodal.dHash64(odd))
  }

  test("pHash64: brightness shifts only the DC term — AC bits and hash unchanged") {
    val base = Multimodal.pHash64(img(7L))
    assert(ham(Multimodal.pHash64(img(7L, delta = 4)), base) === 0,
      "a uniform shift is orthogonal to every non-DC DCT basis vector")
    assert(ham(Multimodal.pHash64(img(9L)), base) > 8)
  }

  test("imageNearDup finds exactly the planted pairs (banded join, no cartesian)") {
    // 4 planted pairs (2k, 2k+1) + 8 unrelated singles
    val rows = (0L until 16L).map { id =>
      val seed = if (id < 8) id / 2 else id + 100
      val delta = if (id < 8 && id % 2 == 1) 4 else 0
      val flip = if (id < 8 && id % 2 == 1) (id % 72).toInt else -1
      (id, seed, delta, flip)
    }
    val df = Multimodal.withPatternPng(
      rows.toDF("doc_id", "__seed", "__delta", "__flip"),
      "__seed", "__delta", "__flip")
    val nd = Multimodal.imageNearDup(df, "doc_id", "img", maxHamming = 3)
    val plan = nd.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n${plan.take(800)}")
    val got = nd.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)))
  }

  test("dropNearDuplicateImages: planted chains collapse to the min-id hub") {
    // Chains {3k, 3k+1, 3k+2}: twins sit ≤ 2 bits from hub 3k via
    // DIFFERENT flipped cells (so twin↔twin may exceed the threshold
    // — connectivity is transitive through the hub) + 4 uniques.
    val rows = (0L until 10L).map { id =>
      val m = id % 3
      if (id < 6) (id, id / 3, (m * 4).toInt,
        if (m == 0) -1 else (m * 20 + id % 13).toInt)
      else (id, id + 100, 0, -1)
    }
    val df = Multimodal.withPatternPng(
      rows.toDF("doc_id", "__seed", "__delta", "__flip"),
      "__seed", "__delta", "__flip")
    // premise: both twins adjacent to the hub
    val hub = Multimodal.dHash64(img(0L))
    assert(ham(Multimodal.dHash64(img(0L, 4, 21)), hub) <= 3)
    assert(ham(Multimodal.dHash64(img(0L, 8, 42)), hub) <= 3)
    val kept = Multimodal.dropNearDuplicateImages(df, "doc_id", "img")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 3L, 6L, 7L, 8L, 9L))
  }

  test("withResizedPng: integer nearest-neighbor — exact dims, deterministic bytes, constant fill survives") {
    val df = Seq((1L, Multimodal.encodePng(40, 30, 200))).toDF("id", "img")
    def run() = Multimodal.withResizedPng(df, "img", 16, 12)
      .select("resized").as[Array[Byte]].head()
    val out = run()
    assert(java.util.Arrays.equals(out, run()), "resampling must be byte-deterministic")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back.getWidth === 16 && back.getHeight === 12)
    // constant source → every resampled pixel keeps the fill exactly
    // (nearest-neighbor never interpolates new values)
    assert((back.getRGB(5, 5) >>> 16 & 0xFF) === 200)
  }

  test("withImageFeatures: exact channel means and a luminance histogram that sums to the pixel count") {
    val df = Seq(
      (1L, Multimodal.encodePng(10, 10, 0)),     // black → bin 0
      (2L, Multimodal.encodePng(10, 10, 255)))   // white → bin 7
      .toDF("id", "img")
    val feats = Multimodal.withImageFeatures(df, "img")
      .select(col("id"), col("feat.r_mean"), col("feat.hist"))
      .as[(Long, Long, Seq[Long])].collect()
      .map { case (id, r, hs) => id -> ((r, hs)) }.toMap
    assert(feats(1L)._1 === 0L && feats(2L)._1 === 255L)
    assert(feats(1L)._2 === Seq(100L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(feats(2L)._2 === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 100L))
    // a patterned image spreads mass but conserves it
    val pat = Seq((3L, Multimodal.encodePatternPng(36, 32, 7L))).toDF("id", "img")
    val hist = Multimodal.withImageFeatures(pat, "img")
      .select(col("feat.hist")).as[Seq[Long]].head()
    assert(hist.sum === 36L * 32L)
  }

  test("pHash64 survives JPEG recompression within the band threshold") {
    // The real-world perturbation perceptual hashes exist for: decode
    // → re-encode lossy at two qualities. Block artifacts move pixel
    // values everywhere, so dHash's adjacent-mean comparisons may
    // flip; pHash's low-frequency DCT signs must hold within the
    // banded-join threshold.
    def jpeg(src: java.awt.image.BufferedImage, q: Float): java.awt.image.BufferedImage = {
      val rgb = new java.awt.image.BufferedImage(
        src.getWidth, src.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      rgb.getGraphics.drawImage(src, 0, 0, null)
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(rgb, null, null), p)
      w.dispose(); ios.close()
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    }
    for (seed <- Seq(3L, 7L, 11L)) {
      val base = img(seed)
      val pBase = Multimodal.pHash64(base)
      for (q <- Seq(0.9f, 0.5f)) {
        val d = ham(Multimodal.pHash64(jpeg(base, q)), pBase)
        assert(d <= 3, s"pHash drifted $d bits after q=$q JPEG (seed=$seed)")
      }
      // and recompression must not alias unrelated images together
      assert(ham(Multimodal.pHash64(jpeg(img(seed + 50), 0.5f)), pBase) > 8)
    }
  }

  test("imageNearDup with pHash64 also recovers the planted pairs") {
    val rows = (0L until 8L).map { id =>
      (id, id / 2, if (id % 2 == 1) 4 else 0, -1)
    }
    val df = Multimodal.withPatternPng(
      rows.toDF("doc_id", "__seed", "__delta", "__flip"),
      "__seed", "__delta", "__flip")
    val got = Multimodal.imageNearDup(df, "doc_id", "img",
        maxHamming = 3, hashOne = Multimodal.pHash64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)))
  }
}
