package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
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
    * plus the decoded payload — UTF-8-with-replacement in general
    * (WET conversion records are UTF-8 text by spec), and
    * CHARSET-FAITHFUL for `application/http` messages whose headers
    * declare a body encoding ([[decodePayload]]); decoding never
    * throws.
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

  /** A header line overran the cap — an EXPLICIT failure (the record
    * loop turns it into a dead letter and resyncs). Silently
    * truncating instead would drop one byte and reparse the rest of
    * the over-long line as subsequent lines: position-dependent
    * framing corruption with no reject row to show for it.
    */
  private final class LineTooLong(maxLen: Int)
    extends java.io.IOException(s"header line exceeds $maxLen bytes")

  /** Byte-line reader tracking the stream position (for reject rows).
    * WARC headers are ASCII CRLF lines; payloads are raw bytes.
    */
  private final class ByteCursor(in: InputStream) {
    private val bin = new BufferedInputStream(in, 1 << 16)
    var pos: Long = 0L

    /** One line (LF-terminated, CR stripped); None at EOF;
      * [[LineTooLong]] past `maxLen` — after consuming the REST of
      * the offending line, so `pos` and framing stay exact for the
      * resync that follows.
      */
    def readLine(maxLen: Int = 1 << 16): Option[String] = {
      val buf = new ByteArrayOutputStream()
      var c = bin.read()
      if (c == -1) return None
      while (c != -1 && c != '\n' && buf.size < maxLen) {
        buf.write(c); c = bin.read()
      }
      if (c != '\n' && c != -1) {
        var extra = 1L // the byte sitting in `c`, read but not written
        var d = bin.read()
        while (d != -1 && d != '\n') { extra += 1; d = bin.read() }
        pos += buf.size + extra + (if (d == -1) 0 else 1)
        throw new LineTooLong(maxLen)
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

      // an over-long line during resync is certainly not a version
      // line — map it to a non-match and keep scanning (readLine has
      // already consumed it fully, so framing holds)
      private def readLineLenient(): Option[String] =
        try cur.readLine() catch { case _: LineTooLong => Some("<line too long>") }

      private def resync(): Unit = {
        var l = readLineLenient()
        while (l.isDefined && !l.get.startsWith("WARC/")) l = readLineLenient()
        pendingVersion = l
      }
      // a resync consumes the version line it stops on
      private var pendingVersion: Option[String] = None

      private def advance(): Unit = {
        while (nextItem.isEmpty && !done) {
          val start = cur.pos
          val version =
            try pendingVersion.orElse {
              // tolerate inter-record blank lines (the CRLF CRLF tail)
              var l = cur.readLine()
              while (l.isDefined && l.get.isEmpty) l = cur.readLine()
              l
            } catch {
              // falls into the not-a-version-line branch below:
              // dead letter + resync
              case _: LineTooLong => Some("<line too long>")
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
                val contentType = headers.getOrElse("content-type", null)
                nextItem = Some(Right(Parsed(
                  headers.getOrElse("warc-type", null),
                  headers.getOrElse("warc-record-id", null),
                  headers.getOrElse("warc-target-uri", null),
                  headers.getOrElse("warc-date", null),
                  contentType,
                  len,
                  decodePayload(payload, contentType))))
              } catch {
                case e: EOFException =>
                  nextItem = Some(Left((start, s"truncated record: ${e.getMessage}")))
                  done = true // nothing after a truncation
                case e: LineTooLong =>
                  nextItem = Some(Left((start, e.getMessage)))
                  resync()
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

  /** Payload bytes → String, CHARSET-FAITHFUL for HTTP messages
    * (round 14): a WARC `response`/`request` payload
    * (`application/http`) carries an ASCII header block whose
    * Content-Type may declare the BODY's encoding — ~5-10% of the
    * real web is not UTF-8 (latin-1/windows-1252 legacies), and a
    * blanket UTF-8-replacement decode turns those pages into
    * irreversible mojibake at the parser, before any downstream
    * routing can act. Here the HTTP header region (ASCII — split on
    * the first byte-level CRLF CRLF) decodes as ISO-8859-1
    * (byte-preserving), the declared charset is read from it, and
    * the body decodes with that charset when the JVM supports it —
    * falling back to UTF-8-with-replacement (never throwing) when
    * it's absent, unknown, or the payload isn't an HTTP message.
    * [[responseDocuments]]'s `keepCharsets` then ROUTES by declared
    * charset; with this decode, adding e.g. `"iso-8859-1"` to the
    * keep set yields correctly-decoded text, not replacement chars.
    */
  private val CharsetRe = java.util.regex.Pattern
    .compile("(?mi)^content-type:[^\\r\\n]*charset=\\s*\"?([A-Za-z0-9_-]+)")

  private[graft] def decodePayload(
      payload: Array[Byte], warcContentType: String): String = {
    def utf8 = new String(payload, StandardCharsets.UTF_8)
    if (warcContentType == null ||
        !warcContentType.startsWith("application/http")) return utf8
    // byte-level CRLF CRLF split (header block is ASCII per RFC 9112)
    var i = 0
    var sep = -1
    while (sep < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
      i += 1
    }
    if (sep < 0) return utf8
    val head = new String(payload, 0, sep + 4, StandardCharsets.ISO_8859_1)
    val m = CharsetRe.matcher(head)
    if (!m.find()) return utf8
    val name = m.group(1)
    val cs =
      try {
        if (java.nio.charset.Charset.isSupported(name))
          java.nio.charset.Charset.forName(name)
        else StandardCharsets.UTF_8
      } catch { case _: Exception => StandardCharsets.UTF_8 }
    head + new String(payload, sep + 4, payload.length - (sep + 4), cs)
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
      parsedRows(file, pds.open(), maxPayloadBytes)
    }
    splitUnified(spark, rows)
  }

  /** [[readWithRejects]] over an EXACT path list — no glob, no
    * comma-join, no re-interpretation of file names (the streaming
    * ingest's handoff: external producers control drop-dir names, so
    * a path containing `,` `{` `}` `[` `]` `*` `?` must read as
    * itself, never split or expand). Each path becomes one task (the
    * per-FILE parallelism shape of [[readWithRejects]]); the file
    * opens lazily INSIDE the task via the Hadoop FS API and streams
    * record by record. An unopenable path (vanished between listing
    * and read) is a dead letter `(file, 0, reason)`, not a task
    * failure.
    */
  def readPathsWithRejects(
      spark: SparkSession,
      paths: Seq[String],
      maxPayloadBytes: Int = 16 << 20): (DataFrame, DataFrame) = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconf)
    val rows = spark.sparkContext
      .parallelize(paths, math.max(paths.size, 1))
      .flatMap { p =>
        // Path(String) is the exact inverse of Path.toString (the
        // form file listings emit): it splits the scheme and quotes
        // glob/comma characters internally; fs.open never globs.
        val hp = new org.apache.hadoop.fs.Path(p)
        val opened =
          try Right(hp.getFileSystem(bc.value.value).open(hp))
          catch { case e: java.io.IOException => Left(e.getMessage) }
        opened match {
          case Right(in)     => parsedRows(p, in, maxPayloadBytes)
          case Left(message) =>
            Iterator(Row(null, null, null, null, null, null, null, p,
              0L, s"open failed: $message"))
        }
      }
    splitUnified(spark, rows)
  }

  private def parsedRows(
      file: String, in: InputStream, maxPayloadBytes: Int): Iterator[Row] =
    parseStream(in, maxPayloadBytes).map {
      case Right(r) => Row(
        r.warcType, r.recordId, r.targetUri, r.warcDate, r.contentType,
        r.contentLength, r.payload, file, null, null)
      case Left((pos, reason)) => Row(
        null, null, null, null, null, null, null, file, pos, reason)
    }

  /** RANGED record fetch — the index-first Common Crawl access
    * pattern that consumes [[graft.sources.Cdx.fetchPlan]]: each plan
    * row names `(warc_file, offset, length)`; exactly those bytes are
    * read (every record is its OWN gzip member in a `.warc.gz`, so a
    * byte range is independently decompressible) and the one record
    * inside is parsed. This is how a pipeline downloads the deduped
    * fraction of a crawl instead of whole segments.
    *
    * Scale shape: plan rows shuffle by `warc_file` and sort by offset
    * within partitions, so each task opens a segment file ONCE and
    * seeks forward through its ranges in ascending order (monotone
    * sequential I/O — the same access order an HTTP-range client
    * would batch); payload bytes never enter the shuffle (the plan is
    * metadata-sized — one row per distinct digest). Unopenable files
    * and unparseable ranges are dead letters `(file, offset, reason)`
    * per the reader's discipline, never task failures. `paths`
    * resolve relative to `baseDir` when the plan stores bare segment
    * names (the CDX `filename` convention).
    */
  def fetchRanged(
      spark: SparkSession,
      plan: DataFrame,
      baseDir: String = "",
      maxPayloadBytes: Int = 16 << 20): (DataFrame, DataFrame) = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconf)
    val base = if (baseDir.isEmpty || baseDir.endsWith("/")) baseDir
               else baseDir + "/"
    val rows = plan
      .select(col("warc_file").cast(StringType),
        col("offset").cast(LongType), col("length").cast(LongType))
      .repartition(col("warc_file"))
      .sortWithinPartitions(col("warc_file"), col("offset"))
      .rdd.mapPartitions { it =>
        val fetcher = new RangeFetcher(bc.value.value, base, maxPayloadBytes)
        val out = it.flatMap { r =>
          val file = r.getString(0)
          val offset = r.getLong(1)
          fetcher.fetch(file, offset, r.getLong(2)) match {
            case Right(parsed) => parsed.map {
              case Right(rec) => Row(
                rec.warcType, rec.recordId, rec.targetUri, rec.warcDate,
                rec.contentType, rec.contentLength, rec.payload, file,
                null, null)
              case Left((_, reason)) => Row(
                null, null, null, null, null, null, null, file, offset,
                reason)
            }
            case Left(reason) =>
              Iterator(Row(null, null, null, null, null, null, null, file,
                offset, reason))
          }
        }
        fetcher.wrap(out)
      }
    splitUnified(spark, rows)
  }

  /** Per-partition ranged-read core shared by [[fetchRanged]] and
    * [[fetchScheduled]] — the LRU-1 segment handle (re-open only on
    * file change), the payload-size guard, the exact-range read and
    * the failure-to-dead-letter discipline live HERE once; the two
    * callers differ only in row ordering and provenance columns.
    * Construction registers a task-completion close backstop
    * (short-circuiting consumers — limit/take/early join termination
    * — abandon the iterator mid-way and would otherwise hold the
    * handle until executor shutdown); [[wrap]] adds the
    * exhaust-then-close wrapper for the common full-drain case
    * (flatMap consumers pull lazily, so the stream must outlive the
    * row iterator).
    */
  private final class RangeFetcher(
      conf: org.apache.hadoop.conf.Configuration,
      base: String,
      maxPayloadBytes: Int) {
    private var openFile: String = null
    private var in: org.apache.hadoop.fs.FSDataInputStream = null
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))

    def close(): Unit = { if (in != null) { in.close(); in = null } }

    /** Read exactly `[offset, offset + length)` of `file` and parse
      * the member(s) inside; `Left(reason)` on any failure, with the
      * handle reset so the next range reopens cleanly.
      */
    def fetch(file: String, offset: Long, length: Long)
        : Either[String, Iterator[Either[(Long, String), Parsed]]] =
      try {
        if (file != openFile) {
          close()
          val hp = new org.apache.hadoop.fs.Path(base + file)
          in = hp.getFileSystem(conf).open(hp)
          openFile = file
        }
        require(length <= maxPayloadBytes.toLong + (1L << 20),
          s"range $length bytes exceeds maxPayloadBytes=$maxPayloadBytes")
        in.seek(offset)
        val buf = new Array[Byte](length.toInt)
        in.readFully(buf)
        Right(parseStream(new ByteArrayInputStream(buf), maxPayloadBytes))
      } catch {
        case e: Exception =>
          openFile = null; close()
          Left(s"range fetch failed: ${e.getMessage}")
      }

    def wrap(out: Iterator[Row]): Iterator[Row] = new Iterator[Row] {
      def hasNext: Boolean = { val h = out.hasNext; if (!h) close(); h }
      def next(): Row = out.next()
    }
  }

  /** [[recordSchema]] plus the schedule provenance each politely
    * fetched record carries: the host it was fetched from, its
    * planned `slot`/`not_before_s` ([[graft.sources.Cdx.schedule]]'s
    * contract), and `fetch_seq` — the 0-based position at which the
    * range was ACTUALLY dereferenced within its host. A correct
    * polite fetch has `fetch_seq == slot` for every row; the equality
    * is what the oracle pins (it breaks the moment anything splits a
    * host across tasks or reorders within one).
    */
  val scheduledRecordSchema: StructType = StructType(
    recordSchema.fields ++ Seq(
      StructField("host", StringType),
      StructField("slot", LongType),
      StructField("not_before_s", DoubleType),
      StructField("fetch_seq", LongType)))

  private val scheduledUnifiedSchema: StructType = StructType(
    scheduledRecordSchema.fields :+
      StructField("pos", LongType) :+
      StructField("_reject_reason", StringType))

  /** POLITENESS-ENFORCED ranged fetch — [[fetchRanged]] driven by a
    * [[graft.sources.Cdx.schedule]] output instead of raw ranges: the
    * plan (`warc_file, offset, length, host, slot, not_before_s`)
    * repartitions by HOST and iterates in slot order, so each host's
    * ranges dereference strictly in their scheduled sequence — the
    * per-host serial contract a `Crawl-delay`-honoring fetcher
    * promises. Hosts are the parallelism unit (distinct hosts fetch
    * concurrently; one host never splits across tasks), which is
    * exactly the shape an origin-paced HTTP fetcher needs.
    *
    * Trade-off vs [[fetchRanged]]'s by-file order, stated: politeness
    * order wins over archive I/O order, so a segment file shared by
    * several hosts re-opens per host run (the LRU-1 handle still
    * rides monotone offsets WITHIN a host when the schedule's
    * orderCols were `(warc_file, offset)`). At 100 TB the polite
    * fetcher is HTTP-ranged against origins, where per-host seriality
    * is the whole point and there is no shared file to reopen.
    *
    * `paceWallClock` additionally sleeps each fetch until the LATER
    * of (a) `not_before_s` seconds after its host's FIRST fetch in
    * the task (the schedule's absolute deadline) and (b) the previous
    * fetch's COMPLETION plus this row's scheduled inter-request gap
    * (`not_before_s` delta) — so a fetch that overruns its slot
    * re-anchors the pace and later requests never fire back-to-back,
    * preserving `Crawl-delay`'s minimum-gap semantics against live
    * origins (round-16 advice). Default off: archival replays and
    * tests verify ORDER, which is the deterministic half of
    * politeness; wall-clock spacing only matters against live
    * origins.
    *
    * Dead letters are unaffected: an unparseable or unreadable range
    * rejects as `(file, pos, reason)` exactly like [[fetchRanged]],
    * and — the pin — still CONSUMES its fetch_seq, so later rows'
    * `fetch_seq == slot` equality survives failures mid-host.
    */
  /** Wall-clock due time for a paced scheduled fetch: the LATER of
    * the schedule's absolute deadline (`anchor + not_before`) and the
    * previous fetch's completion plus this row's scheduled
    * inter-request gap (`not_before` delta vs the previous row) — so
    * an overrunning fetch re-anchors the pace and the minimum gap
    * survives (round-16 advice). `hasPrev` says whether a prior fetch
    * completed on this host (absolute deadline alone governs
    * otherwise) — an explicit flag, not a `lastDoneNanos == 0`
    * sentinel: `System.nanoTime()` has an arbitrary origin and may
    * legitimately be 0 or negative (r17 advice). Comparisons against
    * the returned due time must be via subtraction
    * (`now - due < 0`), the JDK's overflow-safe nanoTime idiom.
    */
  private[graft] def scheduledDueNanos(
      anchorNanos: Long,
      nb: Double,
      prevNb: Double,
      lastDoneNanos: Long,
      hasPrev: Boolean = true): Long = {
    val dueAbs = anchorNanos + (nb * 1e9).toLong
    if (!hasPrev) dueAbs
    else {
      val gapNanos = (math.max(0.0, nb - prevNb) * 1e9).toLong
      val paced = lastDoneNanos + gapNanos
      if (dueAbs - paced >= 0L) dueAbs else paced
    }
  }

  def fetchScheduled(
      spark: SparkSession,
      plan: DataFrame,
      baseDir: String = "",
      maxPayloadBytes: Int = 16 << 20,
      paceWallClock: Boolean = false): (DataFrame, DataFrame) = {
    val (records, rejects, _) = fetchScheduledReleasable(
      spark, plan, baseDir, maxPayloadBytes, paceWallClock)
    (records, rejects)
  }

  /** [[fetchScheduled]] with a release handle for the internal
    * Materialize cut (r17 advice): a continuously-cycling caller (the
    * [[graft.streaming.FrontierStream]] loop) invokes the thunk once
    * BOTH returned frames are fully consumed, so `local`-mode
    * localCheckpoint blocks don't accrue one fetch frame per
    * micro-batch for the JVM lifetime. After the thunk runs, neither
    * frame (nor anything derived from them) may be read again —
    * [[graft.operators.Materialize.releaseHard]]'s contract.
    */
  def fetchScheduledReleasable(
      spark: SparkSession,
      plan: DataFrame,
      baseDir: String = "",
      maxPayloadBytes: Int = 16 << 20,
      paceWallClock: Boolean = false): (DataFrame, DataFrame, () => Unit) = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconf)
    val base = if (baseDir.isEmpty || baseDir.endsWith("/")) baseDir
               else baseDir + "/"
    val pace = paceWallClock
    val rows = plan
      .select(col("warc_file").cast(StringType),
        col("offset").cast(LongType), col("length").cast(LongType),
        col("host").cast(StringType), col("slot").cast(LongType),
        col("not_before_s").cast(DoubleType))
      .repartition(col("host"))
      .sortWithinPartitions(col("host"), col("slot"))
      .rdd.mapPartitions { it =>
        val fetcher = new RangeFetcher(bc.value.value, base, maxPayloadBytes)
        var curHost: String = null
        var seq = -1L
        var anchorNanos = 0L
        var prevNb = 0.0
        var lastDoneNanos = 0L
        var hasPrev = false
        val out = it.flatMap { r =>
          val file = r.getString(0)
          val offset = r.getLong(1)
          val host = r.getString(3)
          val slot = r.getLong(4)
          val nb = if (r.isNullAt(5)) 0.0 else r.getDouble(5)
          if (host != curHost) {
            curHost = host; seq = -1L; anchorNanos = System.nanoTime()
            prevNb = 0.0; lastDoneNanos = 0L; hasPrev = false
          }
          seq += 1
          if (pace && nb > 0.0) {
            val dueNanos = scheduledDueNanos(
              anchorNanos, nb, prevNb, lastDoneNanos, hasPrev)
            // overflow-safe nanoTime comparison: subtract, test sign
            var now = System.nanoTime()
            while (now - dueNanos < 0L) {
              Thread.sleep(math.max(1L, (dueNanos - now) / 1000000L))
              now = System.nanoTime()
            }
          }
          prevNb = nb
          val fetched = fetcher.fetch(file, offset, r.getLong(2))
          lastDoneNanos = System.nanoTime()
          hasPrev = true
          fetched match {
            case Right(parsed) => parsed.map {
              case Right(rec) => Row(
                rec.warcType, rec.recordId, rec.targetUri, rec.warcDate,
                rec.contentType, rec.contentLength, rec.payload, file,
                host, slot, nb, seq, null, null)
              case Left((_, reason)) => Row(
                null, null, null, null, null, null, null, file,
                host, slot, nb, seq, offset, reason)
            }
            case Left(reason) =>
              Iterator(Row(null, null, null, null, null, null, null, file,
                host, slot, nb, seq, offset, reason))
          }
        }
        fetcher.wrap(out)
      }
    val unified = graft.operators.Materialize(
      spark.createDataFrame(rows, scheduledUnifiedSchema))
    val records = unified.filter(col("_reject_reason").isNull)
      .select(scheduledRecordSchema.fieldNames.map(col).toSeq: _*)
    val rejects = unified.filter(col("_reject_reason").isNotNull)
      .select(col("file"), col("pos"), col("_reject_reason").as("reason"))
    (records, rejects, () => graft.operators.Materialize.releaseHard(unified))
  }

  private def splitUnified(
      spark: SparkSession,
      rows: org.apache.spark.rdd.RDD[Row]): (DataFrame, DataFrame) = {
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
    * PRODUCER CONTRACT: files must APPEAR atomically in `dropDir` —
    * write to a hidden staging name (`.name.tmp`; the source ignores
    * dot-files) or a sibling directory, then rename into place
    * (same-filesystem rename is atomic). The source tracks files by
    * path and never re-reads: a file listed half-written is
    * permanently ingested truncated (rejects or lost records) — the
    * same half-committed-listing trap the repo's FileReplay harness
    * solves with atomic directory renames.
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
        if (paths.nonEmpty)
          landBatch(spark, paths.toSeq, id, recordsDir, rejectsDir,
            maxPayloadBytes)
        ()
      }
      .start()

  /** One micro-batch of the streaming ingest (the foreachBatch body,
    * exposed for replay specs): parse the EXACT path list — never
    * re-joined or re-globbed (external producers control drop-dir
    * names; a comma or `{}[]*?` in a landed filename must read as
    * itself) — then land records under the MANIFEST TRANSACTION
    * ([[ManifestedSink.appendBatch]], round 14): the crawl table gets
    * the same WAP/audit discipline as the rest of the warehouse —
    * exactly-once replay (a re-delivered batch sweeps its prior
    * attempt's files before re-applying), zone+bloom pruned point
    * reads (`record_id` bloom, `target_uri`/`warc_type` zones), and
    * snapshot/change-feed reads over the ingest log. The manifest
    * lives at `recordsDir + ".manifest"`; `batch_id` rides as a data
    * column. Dead letters keep the partition-overwrite discipline
    * (append-only audit trail, no point-read consumers).
    */
  def landBatch(
      spark: SparkSession,
      paths: Seq[String],
      id: Long,
      recordsDir: String,
      rejectsDir: String,
      maxPayloadBytes: Int = 16 << 20): Unit = {
    val (records, rejects) =
      readPathsWithRejects(spark, paths, maxPayloadBytes)
    ManifestedSink.appendBatch(
      records.withColumn("batch_id", lit(id)),
      recordsDir, manifestDir(recordsDir),
      cols = Seq("target_uri", "warc_type"),
      bloomCols = Seq("record_id"),
      batchId = id)
    rejects.withColumn("batch_id", lit(id))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(rejectsDir)
  }

  /** The manifest location of a streaming-ingest records table. */
  def manifestDir(recordsDir: String): String =
    recordsDir.stripSuffix("/") + ".manifest"

  /** Read the streaming-ingest records table back — COMMITTED view:
    * when the manifest exists (the [[landBatch]] sink), only its
    * cataloged files are read, so a batch that crashed after writing
    * data but before publishing its manifest is invisible (its
    * orphans get swept on the next append). Falls back to a plain
    * directory read with the explicit schema for legacy
    * partition-overwrite layouts (a stream whose every file was
    * rejected legally leaves nothing to infer from).
    */
  def readRecords(spark: SparkSession, recordsDir: String): DataFrame = {
    val schema = recordSchema.add("batch_id", LongType)
    ManifestedSink.readManifest(spark, manifestDir(recordsDir)) match {
      case Some(m) =>
        val files = m.select("file").collect().map(_.getString(0)).toSeq
        spark.read.schema(schema).parquet(files: _*)
      case None =>
        spark.read.schema(schema).parquet(recordsDir)
    }
  }

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

  /** Split the HTTP message inside `response` payloads into typed
    * parts: `http_status` (from the status line), `http_content_type`
    * (lowercased media type from the HTTP headers — NOT the WARC
    * record's `Content-Type`, which is `application/http` for these
    * records), `http_charset` (from the media type's charset
    * parameter, empty when unspecified), and `http_body` (everything
    * after the first CRLF CRLF). Map-only column arithmetic — one
    * staged `instr` cut, no UDF, no shuffle; rows with no header/body
    * separator are dropped (not an HTTP message). Exposed separately
    * from [[responseDocuments]] so non-HTML consumers (binary asset
    * pipelines, status-code analytics) can reuse the envelope split.
    */
  def httpParts(records: DataFrame): DataFrame = {
    val statusS = regexp_extract(col("__env"), "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    records
      .withColumn("__sep", instr(col("payload"), "\r\n\r\n"))
      .filter(col("__sep") > 0)
      .withColumn("__env", col("payload").substr(lit(1), col("__sep") - 1))
      .withColumn("http_status",
        when(statusS =!= "", statusS.cast(IntegerType)))
      .withColumn("http_content_type",
        lower(regexp_extract(col("__env"),
          "(?mi)^content-type:\\s*([^\\r\\n]+)", 1)))
      .withColumn("http_charset",
        regexp_extract(col("http_content_type"),
          "charset=\\s*\"?([a-z0-9_-]+)", 1))
      // redirect target (3xx Location), raw as sent — resolution
      // against the request URI is the consumer's job (round 18:
      // the crawl loop follows redirects through Urls.resolve)
      .withColumn("http_location",
        regexp_extract(col("__env"), "(?mi)^location:\\s*([^\\r\\n]+)", 1))
      .withColumn("http_body",
        col("payload").substr(col("__sep") + lit(4), length(col("payload"))))
      .drop("__sep", "__env")
  }

  /** The RAW-crawl front door: WARC `response` records (Common
    * Crawl's primary artifact — an HTTP status line + headers + HTML
    * body inside the payload) to the `documents` shape. Composes
    * [[httpParts]] with [[graft.operators.TextAnalysis.stripHtml]]:
    * keep HTTP 200 `text/html` responses whose declared charset is in
    * `keepCharsets` (default: utf-8 or unspecified — the conservative
    * corpus policy). The parser decodes HTTP bodies CHARSET-FAITHFULLY
    * ([[decodePayload]]), so widening the keep set (e.g.
    * `+ "iso-8859-1"` — with utf-8 that covers the overwhelming
    * majority of the web) admits correctly-decoded text, not
    * replacement-character mojibake. Then strip the
    * markup, and emit `(doc_id, text, lang, source, n_chars,
    * target_uri)` — the [[wetDocuments]] contract (same xxhash64
    * record-id doc ids, same host `source`, `lang` left for langid)
    * plus `target_uri` as crawl provenance (URL-level dedup and the
    * frontier feed need the full URL, not just the host).
    *
    * Scale shape: map-only end to end — the envelope split is column
    * arithmetic, the strip is the codegen'd regex chain — so it
    * rides the per-file parse tasks with no shuffle before the first
    * downstream aggregate.
    */
  def responseDocuments(
      records: DataFrame,
      keepCharsets: Set[String] = Set("", "utf-8")): DataFrame =
    httpParts(records
        .filter(col("warc_type") === "response" &&
          col("content_type").startsWith("application/http")))
      .filter(col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html") &&
        col("http_charset").isin(keepCharsets.toSeq: _*))
      .withColumn("__text",
        graft.operators.TextAnalysis.stripHtml(col("http_body")))
      .select(
        xxhash64(col("record_id")).as("doc_id"),
        col("__text").as("text"),
        lit(null).cast(StringType).as("lang"),
        regexp_extract(col("target_uri"), "^[a-z]+://([^/]+)", 1).as("source"),
        length(col("__text")).cast(LongType).as("n_chars"),
        col("target_uri"))

  /** Per-host robots.txt bodies from the ARCHIVE ITSELF — crawls
    * store their `robots.txt` fetches as ordinary `response` records,
    * so retroactive politeness ([[graft.operators.Robots]]) needs no
    * side channel: HTTP-200 responses whose target path is EXACTLY
    * the root `/robots.txt` (RFC 9309 §2.3 — a deep-path capture like
    * `https://host/mirror/robots.txt` is just a page, and must never
    * displace the governing root file) become one `(host, body)` row
    * per host (deterministic min-record-id pick when a host was
    * fetched more than once). Host keys come from
    * [[graft.operators.Urls.host]] — the same key
    * [[graft.operators.Robots.filterAllowed]] joins on.
    */
  def robotsTable(records: DataFrame): DataFrame =
    httpParts(records.filter(col("warc_type") === "response" &&
        col("content_type").startsWith("application/http") &&
        col("target_uri").rlike(
          "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+/robots\\.txt$")))
      .filter(col("http_status") === 200)
      .groupBy(graft.operators.Urls.host(col("target_uri")).as("host"))
      .agg(min_by(col("http_body"), col("record_id")).as("body"))

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

  /** [[gzipMembers]] that also returns each member's `(offset,
    * length)` in the output — the byte ranges a CDX index records so
    * [[fetchRanged]] can pull one record without touching the rest of
    * the segment.
    */
  def gzipMembersIndexed(
      records: Seq[Array[Byte]]): (Array[Byte], Seq[(Long, Long)]) = {
    val out = new ByteArrayOutputStream()
    val idx = records.map { r =>
      val off = out.size.toLong
      val gz = new GZIPOutputStream(out)
      gz.write(r); gz.finish(); gz.close()
      (off, out.size.toLong - off)
    }
    (out.toByteArray, idx)
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
