package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET web-archive ingest — the crawl front door of an
  * LLM-data pipeline (Common Crawl ships WARC for raw fetches and WET
  * for extracted text; both are ISO 28500 WARC records, usually as
  * per-record gzip members concatenated into one `.warc.gz`).
  *
  * Pure-JDK, no new dependencies: the record grammar is a byte walk
  * (ASCII header block, `Content-Length` payload bytes, CRLF CRLF),
  * and multi-member gzip is what `GZIPInputStream` already does.
  *
  * Scale shape: one WARC.gz is NOT splittable (gzip members don't
  * carry offsets), so parallelism is PER FILE — exactly how the
  * format is deployed (Common Crawl segments a crawl into ~10⁵ files
  * of ~1 GB; a 1000-executor cluster maps files to tasks). The reader
  * goes through `sparkContext.binaryFiles`, whose
  * `PortableDataStream` opens lazily INSIDE the task — no file is
  * buffered whole, payloads stream record by record, and a
  * `maxPayloadBytes` cap bounds task memory against a hostile
  * Content-Length.
  *
  * Dead letters, not crashes ([[Warehouse.readCsvWithRejects]]'s
  * discipline): a malformed record (bad version line, unparseable
  * Content-Length, truncated payload, oversize payload) becomes a
  * reject row `(file, pos, reason)` and the parser RESYNCS to the
  * next `WARC/` version line — one rotten record never poisons the
  * file, let alone the job.
  */
object Warc {

  /** Clean-record schema: the WARC named fields every consumer needs,
    * plus the UTF-8-decoded payload (WET conversion records are
    * text; for binary payloads downstream should re-read via
    * [[recordSchema]]'s `payload` anyway — decoding is lossy-replace,
    * never throwing).
    */
  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", StringType),
    StructField("file", StringType)))

  val rejectSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("pos", LongType),
    StructField("reason", StringType)))

  private val unifiedSchema: StructType = StructType(
    recordSchema.fields :+
      StructField("pos", LongType) :+
      StructField("_reject_reason", StringType))

  // ---- streaming parser ----

  /** Byte-line reader tracking the stream position (for reject rows).
    * WARC headers are ASCII CRLF lines; payloads are raw bytes.
    */
  private final class ByteCursor(in: InputStream) {
    private val bin = new BufferedInputStream(in, 1 << 16)
    var pos: Long = 0L

    /** One line (LF-terminated, CR stripped); None at EOF. */
    def readLine(maxLen: Int = 1 << 16): Option[String] = {
      val buf = new ByteArrayOutputStream()
      var c = bin.read()
      if (c == -1) return None
      while (c != -1 && c != '\n' && buf.size < maxLen) {
        buf.write(c); c = bin.read()
      }
      pos += buf.size + (if (c == -1) 0 else 1)
      val b = buf.toByteArray
      val n = if (b.nonEmpty && b.last == '\r') b.length - 1 else b.length
      Some(new String(b, 0, n, StandardCharsets.US_ASCII))
    }

    /** Exactly `n` payload bytes; EOFException on truncation. */
    def readFully(n: Long): Array[Byte] = {
      require(n <= Int.MaxValue, s"payload too large to buffer: $n")
      val out = new Array[Byte](n.toInt)
      var off = 0
      while (off < n) {
        val r = bin.read(out, off, n.toInt - off)
        if (r == -1) throw new EOFException(s"truncated payload at $off/$n")
        off += r
      }
      pos += n
      out
    }

    /** Skip `n` bytes (oversize payloads — stay in sync without
      * buffering); EOFException on truncation.
      */
    def skipFully(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val r = bin.skip(left)
        if (r <= 0) {
          if (bin.read() == -1) throw new EOFException(s"truncated skip at ${n - left}/$n")
          left -= 1
        } else left -= r
      }
      pos += n
    }
  }

  private[graft] final case class Parsed(
      warcType: String, recordId: String, targetUri: String, warcDate: String,
      contentType: String, contentLength: Long, payload: String)

  /** Streaming record iterator over one (possibly multi-member-gzip)
    * WARC stream: `Right(record)` per well-formed record,
    * `Left((pos, reason))` per dead letter, resyncing to the next
    * `WARC/` version line after any failure.
    */
  private[graft] def parseStream(
      in: InputStream,
      maxPayloadBytes: Int): Iterator[Either[(Long, String), Parsed]] = {
    val cur = new ByteCursor(maybeGunzip(in))
    new Iterator[Either[(Long, String), Parsed]] {
      private var nextItem: Option[Either[(Long, String), Parsed]] = None
      private var done = false

      private def resync(): Unit = {
        var l = cur.readLine()
        while (l.isDefined && !l.get.startsWith("WARC/")) l = cur.readLine()
        pendingVersion = l
      }
      // a resync consumes the version line it stops on
      private var pendingVersion: Option[String] = None

      private def advance(): Unit = {
        while (nextItem.isEmpty && !done) {
          val start = cur.pos
          val version = pendingVersion.orElse {
            // tolerate inter-record blank lines (the CRLF CRLF tail)
            var l = cur.readLine()
            while (l.isDefined && l.get.isEmpty) l = cur.readLine()
            l
          }
          pendingVersion = None
          version match {
            case None => done = true
            case Some(v) if !v.startsWith("WARC/") =>
              nextItem = Some(Left((start, s"expected WARC/ version line, got '${v.take(40)}'")))
              resync()
            case Some(_) =>
              try {
                val headers = scala.collection.mutable.Map.empty[String, String]
                var l = cur.readLine()
                while (l.isDefined && l.get.nonEmpty) {
                  val line = l.get
                  val i = line.indexOf(':')
                  if (i > 0)
                    headers(line.substring(0, i).trim.toLowerCase) =
                      line.substring(i + 1).trim
                  l = cur.readLine()
                }
                if (l.isEmpty) throw new EOFException("EOF inside header block")
                val lenS = headers.getOrElse("content-length",
                  throw new IllegalArgumentException("missing Content-Length"))
                val len = try lenS.toLong catch {
                  case _: NumberFormatException =>
                    throw new IllegalArgumentException(s"bad Content-Length '$lenS'")
                }
                if (len < 0)
                  throw new IllegalArgumentException(s"negative Content-Length $len")
                if (len > maxPayloadBytes) {
                  cur.skipFully(len)
                  throw new IllegalArgumentException(
                    s"payload $len bytes > maxPayloadBytes=$maxPayloadBytes")
                }
                val payload = cur.readFully(len)
                nextItem = Some(Right(Parsed(
                  headers.getOrElse("warc-type", null),
                  headers.getOrElse("warc-record-id", null),
                  headers.getOrElse("warc-target-uri", null),
                  headers.getOrElse("warc-date", null),
                  headers.getOrElse("content-type", null),
                  len,
                  new String(payload, StandardCharsets.UTF_8))))
              } catch {
                case e: EOFException =>
                  nextItem = Some(Left((start, s"truncated record: ${e.getMessage}")))
                  done = true // nothing after a truncation
                case e: IllegalArgumentException =>
                  nextItem = Some(Left((start, e.getMessage)))
                  resync()
              }
          }
        }
      }

      override def hasNext: Boolean = { advance(); nextItem.isDefined }
      override def next(): Either[(Long, String), Parsed] = {
        advance()
        val r = nextItem.get; nextItem = None; r
      }
    }
  }

  /** Gzip sniff (multi-member streams decode end-to-end through
    * `GZIPInputStream` — it consumes concatenated members natively).
    */
  private def maybeGunzip(in: InputStream): InputStream = {
    val pb = new PushbackInputStream(in, 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 != -1) pb.unread(b1)
    if (b0 != -1) pb.unread(b0)
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(pb, 1 << 16) else pb
  }

  // ---- the Spark source ----

  /** Read a WARC/WET path glob into `(records, rejects)` frames.
    * Parallelism is per file ([[Warc]] scaladoc); the parse runs ONCE
    * (materialized) and both halves split from the cut, the
    * [[Warehouse.readCsvWithRejects]] discipline.
    */
  def readWithRejects(
      spark: SparkSession,
      path: String,
      maxPayloadBytes: Int = 16 << 20): (DataFrame, DataFrame) = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      val it = parseStream(pds.open(), maxPayloadBytes)
      it.map {
        case Right(r) => Row(
          r.warcType, r.recordId, r.targetUri, r.warcDate, r.contentType,
          r.contentLength, r.payload, file, null, null)
        case Left((pos, reason)) => Row(
          null, null, null, null, null, null, null, file, pos, reason)
      }
    }
    val unified = graft.operators.Materialize(
      spark.createDataFrame(rows, unifiedSchema))
    val records = unified.filter(col("_reject_reason").isNull)
      .select(recordSchema.fieldNames.map(col).toSeq: _*)
    val rejects = unified.filter(col("_reject_reason").isNotNull)
      .select(col("file"), col("pos"), col("_reject_reason").as("reason"))
    (records, rejects)
  }

  // ---- streaming ingest ----

  /** Streaming WARC ingest: watch `dropDir` for new archive files and
    * land parsed records under `recordsDir/batch_id=<id>` and dead
    * letters under `rejectsDir/batch_id=<id>` (the gate family's
    * idempotent dynamic-partition-overwrite discipline — a replayed
    * micro-batch overwrites its own partition).
    *
    * The `binaryFile` stream source is used as the FILE LISTING
    * mechanism only: the plan selects just `path`, so column pruning
    * keeps payload bytes out of the stream entirely — each batch's
    * paths (bounded metadata, like a manifest catalog) route into the
    * same per-file streaming parse as the batch reader, and payloads
    * stream record-by-record inside tasks exactly as
    * [[readWithRejects]] does.
    */
  def stream(
      spark: SparkSession,
      dropDir: String,
      recordsDir: String,
      rejectsDir: String,
      checkpointDir: String,
      maxPayloadBytes: Int = 16 << 20): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("binaryFile")
      // the format's fixed schema, stated explicitly (streaming
      // sources don't infer); only `path` is ever selected, so
      // column pruning keeps `content` out of the stream
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(dropDir)
      .select(col("path"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val paths = b.select("path").collect().map(_.getString(0))
        if (paths.nonEmpty) {
          val (records, rejects) =
            readWithRejects(spark, paths.mkString(","), maxPayloadBytes)
          records.withColumn("batch_id", lit(id))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(recordsDir)
          rejects.withColumn("batch_id", lit(id))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(rejectsDir)
        }
        ()
      }
      .start()

  /** Read the streaming-ingest records table back (explicit schema —
    * a stream whose every file was rejected legally leaves nothing
    * to infer from).
    */
  def readRecords(spark: SparkSession, recordsDir: String): DataFrame =
    spark.read
      .schema(recordSchema.add("batch_id", LongType))
      .parquet(recordsDir)

  /** WET conversion records as a `documents`-shaped frame — the
    * bridge from crawl ingest into the curation stack (quality gate →
    * dedup → budget → split all key on `(doc_id, text, lang,
    * source)`). `doc_id` is `xxhash64(record_id)` — deterministic,
    * 2⁶⁴-domain (collision odds are the corpus-hash standing
    * assumption), and independent of file/offset so re-sharded
    * archives keep stable ids; `source` is the target URI's host
    * (the unit domain-quota sampling keys on); `lang` is left for
    * [[graft.operators.TextAnalysis]]'s langid pass (`null` here —
    * WET records don't carry one).
    */
  def wetDocuments(records: DataFrame): DataFrame =
    records.filter(col("warc_type") === "conversion")
      .select(
        xxhash64(col("record_id")).as("doc_id"),
        col("payload").as("text"),
        lit(null).cast(StringType).as("lang"),
        regexp_extract(col("target_uri"), "^[a-z]+://([^/]+)", 1).as("source"),
        length(col("payload")).cast(LongType).as("n_chars"))

  // ---- writer (fixtures + WET export) ----

  /** Render one WARC record (CRLF framing, `Content-Length` +
    * trailing CRLF CRLF per ISO 28500).
    */
  def renderRecord(
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: $recordId\r\n")
    if (targetUri != null) sb.append(s"WARC-Target-URI: $targetUri\r\n")
    sb.append(s"WARC-Date: $warcDate\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(StandardCharsets.US_ASCII)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  /** Concatenate each rendered record as its OWN gzip member — the
    * Common Crawl `.warc.gz` layout (readers resync per member).
    */
  def gzipMembers(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(r); gz.finish(); gz.close()
    }
    out.toByteArray
  }
}
