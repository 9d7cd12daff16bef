package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns plus typed metadata structs; all bucketing and
  * joining happens on the compact metadata, so shuffles carry payload
  * bytes only when a repartition explicitly asks for it.
  *
  * The image decode path is REAL: [[imageioDecode]] parses actual
  * PNG/JPEG/BMP/GIF bytes with the JDK's `javax.imageio` (no native
  * codecs required) inside the batched `mapPartitions` stage —
  * dimensions and pixel statistics come from the decoded raster, not
  * from byte-length arithmetic. [[stubDecode]] remains as the
  * declared FALLBACK for payloads with no JVM codec (video
  * containers, audio) — same column contract, deterministic fake
  * values — so the plumbing stays testable on any payload.
  *
  * Scale notes: decode is map-only (no shuffle); per-partition codec
  * setup amortizes across the partition's rows, and the binary
  * column never leaves the executor.
  */
object Multimodal {

  /** Canonical media envelope: `struct<bytes binary, mime string>`. */
  def asMedia(content: Column, mime: Column): Column =
    struct(content.as("bytes"), mime.as("mime"))

  /** STUB image decode for non-image payloads — deterministic fake
    * dimensions derived from the byte length, same shape as the real
    * decoder's output. Kept for payloads `javax.imageio` cannot read
    * (and as the engine-portable column form usable in pure SQL).
    */
  def decodeImageMeta(bytes: Column): Column = {
    val n = octet_length(bytes).cast("long")
    struct(
      n.as("n_bytes"),
      (pmod(n, lit(640L)) + 1).as("width"),
      (pmod(n * 7, lit(480L)) + 1).as("height"))
  }

  /** Partition-batched decode — the Scala twin of a `mapInPandas`
    * decode stage: rows stream through `mapPartitions` so the codec
    * amortizes per-batch setup across the partition, and the binary
    * payload never leaves the executor. The default decoder is the
    * REAL [[imageioDecode]]; pass [[stubDecode]] for non-image
    * payloads. Output schema = input + `decoded struct<n_bytes
    * bigint, width bigint, height bigint, px_mean bigint>`.
    */
  def decodeBatch(
      df: DataFrame,
      bytesCol: String)(
      decodeOne: Array[Byte] => (Long, Long, Long, Long) = imageioDecode): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("n_bytes", LongType, nullable = false),
        StructField("width", LongType, nullable = false),
        StructField("height", LongType, nullable = false),
        StructField("px_mean", LongType, nullable = false)))))
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      // per-partition setup for a heavier codec would go here
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (n, w, h, m) = decodeOne(bytes)
        Row.fromSeq(row.toSeq :+ Row(n, w, h, m))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image decode via the JDK's `javax.imageio` — dimensions
    * read from the decoded image, `px_mean` = integer mean of the
    * red channel over the full raster (exact for constant-fill test
    * images; a cheap corruption/brightness screen for real ones).
    * Throws with a clear message on undecodable bytes — route known
    * non-image payloads through [[stubDecode]] instead.
    */
  def imageioDecode(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      "imageioDecode: bytes are not a JVM-decodable image (png/jpeg/bmp/gif) — " +
        "use stubDecode for non-image payloads")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += (img.getRGB(x, y) >>> 16) & 0xFF; x += 1 }
      y += 1
    }
    (bytes.length.toLong, w.toLong, h.toLong, sum / (w.toLong * h.toLong))
  }

  /** The deterministic fake decoder (mirrors [[decodeImageMeta]]) —
    * the declared fallback for payloads without a JVM codec.
    */
  def stubDecode(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val n = bytes.length.toLong
    (n, n % 640 + 1, (n * 7) % 480 + 1, (n * 13) % 256)
  }

  /** Encode one REAL grayscale PNG (`gray` ∈ 0..255 fills every
    * channel of every pixel) — the deterministic test-image
    * generator for the decode path: constant fill makes the decoded
    * `px_mean` exactly `gray`, so an external oracle can predict the
    * decoded values while the values themselves still come from
    * parsing genuine PNG bytes.
    */
  def encodePng(w: Int, h: Int, gray: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"PNG dims must be positive, got ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val c = ((gray & 0xFF) << 16) | ((gray & 0xFF) << 8) | (gray & 0xFF)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, c); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a real PNG per row (`mapPartitions`, map-only), with
    * dimensions and fill taken from integer columns — test/bench
    * scaffolding for the decode path when the corpus has no image
    * payloads of its own.
    */
  def withTestPng(
      df: DataFrame,
      widthCol: String,
      heightCol: String,
      grayCol: String,
      out: String = "img"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, BinaryType))
    val wi = df.schema.fieldIndex(widthCol)
    val hi = df.schema.fieldIndex(heightCol)
    val gi = df.schema.fieldIndex(grayCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val png = encodePng(
          row.getAs[Number](wi).intValue(),
          row.getAs[Number](hi).intValue(),
          row.getAs[Number](gi).intValue())
        Row.fromSeq(row.toSeq :+ png)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Difference hash (dHash-64) over a decoded raster — the
    * perceptual near-dup signature for images, INTEGER-EXACT end to
    * end. The raster is box-mean downsampled onto an 8-row × 9-column
    * grid (every pixel lands in cell `(y*8/h, x*9/w)` — pure long
    * arithmetic, no resampling filter to vary by library), and bit
    * `(row, col)` is set iff the cell's mean gray exceeds its right
    * neighbor's. Means compare by cross-multiplication
    * (`sumL*cntR > sumR*cntL`), so there is no division and no
    * floating point anywhere: the same bytes hash identically on
    * every JVM. Gray = r+g+b (the common scale factor cancels in the
    * comparison). Robust to uniform brightness shifts (all
    * comparisons shift together) and to localized edits (one cell
    * touches ≤ 2 of the 64 bits); unrelated images land ~32 bits
    * apart.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val r = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val c = (x.toLong * 9 / w).toInt
        val rgb = img.getRGB(x, y)
        sums(r)(c) += ((rgb >>> 16) & 0xFF) + ((rgb >>> 8) & 0xFF) + (rgb & 0xFF)
        cnts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r)(c) * cnts(r)(c + 1) > sums(r)(c + 1) * cnts(r)(c))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Perceptual hash (pHash-64): 32×32 integer box-mean downsample →
    * 2-D DCT-II → bit per low-frequency coefficient vs the median of
    * the 63 non-DC coefficients in the 8×8 block. The downsample is
    * the same exact integer walk as [[dHash64]]; only the DCT uses
    * doubles (deterministic within a JVM — fine for the rows-only
    * near-dup contract; [[dHash64]] is the cross-engine-exact
    * choice). More robust than dHash to global contrast warps, at
    * ~4× the per-image cost.
    */
  def pHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val n = 32
    val sums = Array.ofDim[Long](n, n)
    val cnts = Array.ofDim[Long](n, n)
    var y = 0
    while (y < h) {
      val r = (y.toLong * n / h).toInt
      var x = 0
      while (x < w) {
        val c = (x.toLong * n / w).toInt
        val rgb = img.getRGB(x, y)
        sums(r)(c) += ((rgb >>> 16) & 0xFF) + ((rgb >>> 8) & 0xFF) + (rgb & 0xFF)
        cnts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    val px = Array.tabulate(n, n)((i, j) =>
      if (cnts(i)(j) == 0) 0.0 else sums(i)(j).toDouble / cnts(i)(j))
    // cos table for the 8 retained frequencies over 32 samples
    val cos = Array.tabulate(8, n)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
    val f = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { acc += px(i)(j) * cos(u)(i) * cos(v)(j); j += 1 }
          i += 1
        }
        f(u)(v) = acc
        v += 1
      }
      u += 1
    }
    val ac = (for { i <- 0 until 8; j <- 0 until 8; if i != 0 || j != 0 }
      yield f(i)(j)).sorted
    val median = ac(ac.length / 2)
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (f(k / 8)(k % 8) > median) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** Decode + perceptual-hash in one batched `mapPartitions` pass —
    * output = input + `<out> bigint`. Map-only: the binary payload is
    * read once per row and never shuffled; only the 8-byte signature
    * travels to the candidate join.
    */
  def withImageHash(
      df: DataFrame,
      bytesCol: String,
      out: String = "dhash")(
      hashOne: java.awt.image.BufferedImage => Long = dHash64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(out, LongType, nullable = false))
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        require(bytes != null, s"withImageHash: null $bytesCol cell — filter " +
          "null payloads out (or fill them) before hashing")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null,
          "withImageHash: bytes are not a JVM-decodable image (png/jpeg/bmp/gif)")
        Row.fromSeq(row.toSeq :+ hashOne(img))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Image near-duplicate candidate pairs — the multimodal member of
    * the near-dup family: perceptual hash ([[dHash64]] by default)
    * per image, then the SAME banded-Hamming blocking as text SimHash
    * ([[Dedup.hamming64Candidates]]): 4×16-bit bands make the
    * candidate join a lossless equi-join at `maxHamming ≤ 3`, never
    * an all-pairs comparison. Output `(id_a, id_b, hamming)`.
    */
  def imageNearDup(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 3,
      hashOne: java.awt.image.BufferedImage => Long = dHash64): DataFrame =
    Dedup.hamming64Candidates(
      withImageHash(df.select(col(idCol), col(bytesCol)), bytesCol)(hashOne)
        .select(col(idCol).as("doc_id"), col("dhash").as("sig")),
      maxHamming)

  /** End-to-end image dedup: [[imageNearDup]] pairs →
    * [[Dedup.connectedComponents]] → keep each component's min-id
    * member — image corpora get the same keeper selection text
    * near-dup gets in [[Dedup.dropNearDuplicates]]. Transitive CHAINS
    * (A≈B, B≈C with A,C possibly farther than `maxHamming`) collapse
    * to ONE keeper, which pairwise filtering alone would not do.
    * Distribution shape is the candidates join's (banded equi-join,
    * no cartesian) + the CC label loop; the final keep is an
    * anti-join on the loser ids.
    */
  def dropNearDuplicateImages(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 3,
      hashOne: java.awt.image.BufferedImage => Long = dHash64): DataFrame = {
    val comp = Dedup.connectedComponents(
      imageNearDup(df, idCol, bytesCol, maxHamming, hashOne))
    val losers = comp.filter(col("id") =!= col("component")).select(col("id"))
    df.join(losers, df(idCol) === losers("id"), "left_anti")
  }

  /** Render one deterministic PATTERN PNG: an 8×9 grid of
    * constant-gray cells (grays = quantized splitmix64 of
    * `(seed, cell)`, so different seeds give structurally different
    * images), with two controlled perturbations for near-dup tests:
    * `delta` brightens every cell uniformly (dHash-invariant — all
    * comparisons shift together) and `flipCell ≥ 0` inverts one
    * cell's gray (flips ≤ 2 dHash bits). The cell grid aligns with
    * [[dHash64]]'s 8×9 box grid when `9 | w` and `8 | h`, making the
    * planted Hamming distances exact by construction.
    */
  def encodePatternPng(
      w: Int,
      h: Int,
      seed: Long,
      delta: Int = 0,
      flipCell: Int = -1): Array[Byte] = {
    require(w > 0 && h > 0, s"PNG dims must be positive, got ${w}x$h")
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def cellGray(cell: Int): Int = {
      // grays on a coarse 16-step lattice: small deltas can never
      // reorder two distinct cells, so only flipCell moves dHash bits
      val base = (java.lang.Long.remainderUnsigned(
        mix(seed * 73L + cell), 16L) * 16L).toInt
      val g = if (cell == flipCell) 240 - base else base + delta
      math.max(0, math.min(255, g))
    }
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val r = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val c = (x.toLong * 9 / w).toInt
        val g = cellGray(r * 9 + c)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a pattern PNG per row from (seed, delta, flipCell)
    * integer columns — the planted-corpus generator for
    * [[imageNearDup]] tests and queries.
    */
  def withPatternPng(
      df: DataFrame,
      seedCol: String,
      deltaCol: String,
      flipCol: String,
      w: Int = 36,
      h: Int = 32,
      out: String = "img"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(out, BinaryType))
    val si = df.schema.fieldIndex(seedCol)
    val di = df.schema.fieldIndex(deltaCol)
    val fi = df.schema.fieldIndex(flipCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val png = encodePatternPng(w, h,
          row.getAs[Number](si).longValue(),
          row.getAs[Number](di).intValue(),
          row.getAs[Number](fi).intValue())
        Row.fromSeq(row.toSeq :+ png)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** STUB video frame-sample plan: byte offsets of every `everyN`-th
    * fake frame. Real implementation: container demux. Shape (one
    * array of offsets per row, computed in the scan stage) is what a
    * real frame sampler produces.
    */
  def sampleFrameOffsets(bytes: Column, frameBytes: Int, everyN: Int): Column = {
    val nFrames = greatest((octet_length(bytes) / frameBytes).cast("long"), lit(1L))
    transform(
      sequence(lit(0L), nFrames - 1, lit(everyN.toLong)),
      i => i * frameBytes)
  }

  /** Resize plan: output metadata for a target box preserving the
    * aspect ratio (integer math only — engine-portable).
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scaleNum = lit(maxSide)
    val longSide = greatest(w, h)
    struct(
      (w * scaleNum / longSide).cast("long").as("width"),
      (h * scaleNum / longSide).cast("long").as("height"))
  }
}
