package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns plus typed metadata structs. The Spark-side
  * contract — schema, partitioning, batch shape — is real; the codec
  * step is STUBBED with a deterministic fake (this container ships no
  * image/audio libraries). A production build swaps
  * [[decodeImageMeta]]'s body for a real decoder behind the same
  * column signature (e.g. a vectorized UDF or `mapPartitions` over
  * the binary column); nothing downstream changes.
  *
  * Scale notes: binary payloads never act as join/group keys — all
  * bucketing happens on the compact metadata struct, so shuffles
  * carry bytes only when a repartition explicitly asks for it.
  */
object Multimodal {

  /** Canonical media envelope: `struct<bytes binary, mime string>`. */
  def asMedia(content: Column, mime: Column): Column =
    struct(content.as("bytes"), mime.as("mime"))

  /** STUB image decode — deterministic fake dimensions derived from
    * the byte length. Real implementation: decode header bytes.
    */
  def decodeImageMeta(bytes: Column): Column = {
    val n = octet_length(bytes).cast("long")
    struct(
      n.as("n_bytes"),
      (pmod(n, lit(640L)) + 1).as("width"),
      (pmod(n * 7, lit(480L)) + 1).as("height"))
  }

  /** Partition-batched decode plumbing — the Scala twin of a
    * `mapInPandas` decode stage: rows stream through `mapPartitions`
    * so a real codec would amortize per-batch setup (model load,
    * codec context) across the partition, and the binary payload
    * never leaves the executor. The decode function itself is a STUB
    * (deterministic fake); swapping in a real decoder changes only
    * `decodeOne`. Output schema = input + `decoded struct<n_bytes
    * bigint, width bigint, height bigint>`.
    */
  def decodeBatch(
      df: DataFrame,
      bytesCol: String)(
      decodeOne: Array[Byte] => (Long, Long, Long) = stubDecode): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("n_bytes", LongType, nullable = false),
        StructField("width", LongType, nullable = false),
        StructField("height", LongType, nullable = false)))))
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      // per-partition setup for a real codec would go here
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (n, w, h) = decodeOne(bytes)
        Row.fromSeq(row.toSeq :+ Row(n, w, h))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** The deterministic fake decoder (mirrors [[decodeImageMeta]]). */
  def stubDecode(bytes: Array[Byte]): (Long, Long, Long) = {
    val n = bytes.length.toLong
    (n, n % 640 + 1, (n * 7) % 480 + 1)
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

  /** STUB resize: output metadata for a target box preserving the
    * fake aspect ratio (integer math only — engine-portable).
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
