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
