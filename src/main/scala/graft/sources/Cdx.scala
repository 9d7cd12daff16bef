package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Common Crawl CDX(J) index ingest — the OTHER crawl front door:
  * before anyone fetches a WARC byte, they query the capture index
  * (`cdx-NNNNN.gz`: one line per capture, `SURT timestamp {JSON}`)
  * to select urls, dedupe content by digest, and build a fetch plan
  * of (warc file, offset, length) ranges. An index-first pipeline
  * downloads a fraction of the crawl; this source makes that plan a
  * DataFrame.
  *
  * Format (CDXJ, the since-2015 layout): three space-delimited
  * fields — the SURT key ([[graft.operators.Urls.surt]]'s shape), a
  * 14-digit `yyyyMMddHHmmss` timestamp, and a JSON blob carrying
  * `url`, `mime`, `status`, `digest`, `length`, `offset`,
  * `filename`. Parsing is ALL in-plan column arithmetic
  * (`split(limit=3)` + `get_json_object` — codegen'd, no UDF): gzip
  * text shards read per FILE exactly like the WARC segments (the
  * index ships as ~300 unsplittable .gz shards; files map to tasks).
  *
  * Malformed lines follow the dead-letter discipline: anything that
  * doesn't shape up (missing fields, non-numeric timestamp, JSON
  * without a url) lands in the rejects frame as `(line, reason)` —
  * one pass, split off a single materialized cut.
  */
object Cdx {

  /** Read CDXJ shards into `(records, rejects)`.
    * Records: `(surt, ts, url, mime, status, digest, length, offset,
    * warc_file)`; `ts` stays the raw 14-digit string (timezone-free
    * by construction — parse downstream if event-time semantics are
    * wanted).
    */
  def readWithRejects(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    parseLines(spark.read.text(path).select(col("value").as("line")))

  /** The parsing core of [[readWithRejects]] over an in-memory
    * `line`-column frame — the shape a STREAMING index feed hands to
    * per-batch parsing ([[graft.streaming.CdxFetchStream]]), where
    * the lines arrive as micro-batch rows, not as a path glob.
    */
  def parseLines(raw: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val parts = split(col("line"), " ", 3)
    // ONE from_json per line (malformed JSON → null struct), never a
    // get_json_object per field — each of those re-parses the whole
    // blob, and at index scale (~3×10⁹ captures/crawl) a 7-field
    // extraction would pay the JSON parse seven times per line
    val jsonSchema = StructType(Seq("url", "mime", "status", "digest",
      "length", "offset", "filename").map(StructField(_, StringType)))
    val staged = graft.operators.Materialize(
      raw.withColumn("__surt", try_element_at(parts, lit(1)))
        .withColumn("__ts", try_element_at(parts, lit(2)))
        .withColumn("__json", try_element_at(parts, lit(3)))
        .withColumn("__j", from_json(col("__json"), jsonSchema))
        .withColumn("__ok",
          col("__ts").rlike("^[0-9]{14}$") && col("__j.url").isNotNull &&
          col("__j.status").rlike("^[0-9]{3}$") &&
          col("__j.offset").rlike("^[0-9]+$") &&
          col("__j.length").rlike("^[0-9]+$")))
    val records = staged.filter(col("__ok"))
      .select(
        col("__surt").as("surt"),
        col("__ts").as("ts"),
        col("__j.url").as("url"),
        col("__j.mime").as("mime"),
        col("__j.status").cast("int").as("status"),
        col("__j.digest").as("digest"),
        col("__j.length").cast("long").as("length"),
        col("__j.offset").cast("long").as("offset"),
        col("__j.filename").as("warc_file"))
    val rejects = staged.filter(!coalesce(col("__ok"), lit(false)))
      .select(col("line"),
        when(col("__json").isNull, "expected 'surt ts {json}'")
          .when(!col("__ts").rlike("^[0-9]{14}$"), "bad timestamp")
          .when(col("__j.url").isNull, "json missing url")
          .otherwise("bad status/offset/length").as("reason"))
    (records, rejects)
  }

  /** The content-dedup FETCH PLAN: of all 200-status captures sharing
    * a content digest (the same page fetched from many urls / many
    * times — most of a crawl's bytes), keep ONE capture — the
    * deterministic `(warc_file, offset)` minimum — plus the copy
    * count. Downloading this plan instead of the raw index is the
    * standard index-first bandwidth cut. One hash aggregate with
    * map-side partials (`min_by` + count), shuffle keyed by digest;
    * no window, no self-join.
    */
  def fetchPlan(records: DataFrame): DataFrame =
    records.filter(col("status") === 200)
      .groupBy(col("digest"))
      .agg(
        min_by(
          struct(col("url"), col("warc_file"), col("offset"), col("length")),
          struct(col("warc_file"), col("offset"))).as("__pick"),
        count(lit(1)).as("n_copies"))
      .select(col("digest"),
        col("__pick.url").as("url"),
        col("__pick.warc_file").as("warc_file"),
        col("__pick.offset").as("offset"),
        col("__pick.length").as("length"),
        col("n_copies"))

  /** Politeness-scheduled fetch plan: within each host, planned
    * fetches lay out `delaySecondsCol` seconds apart — `slot` is the
    * 0-based per-host fetch rank (deterministic `orderCols` order,
    * ties impossible when the order includes the unique byte range)
    * and `not_before_s` the earliest polite fetch time relative to
    * the host's first fetch. This is the frontier shape a
    * `Crawl-delay`-honoring fetcher consumes
    * ([[graft.operators.Robots.crawlDelay]] supplies the per-host
    * delay); rows with a NULL delay schedule at 0 (no declared
    * spacing — politeness is the crawler's own default then).
    *
    * One keyed window — shuffle by host, task size bounded by one
    * host's plan (hosts are the natural parallelism unit of polite
    * fetching: the schedule is per-host serial BY DESIGN, and
    * distinct hosts fetch concurrently).
    */
  def schedule(
      plan: DataFrame,
      hostCol: String,
      delaySecondsCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(hostCol).orderBy(orderCols.map(col): _*)
    plan
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("not_before_s",
        col("slot") * coalesce(col(delaySecondsCol), lit(0.0)))
  }

  /** Render one CDXJ line (fixtures + index export). */
  def renderLine(
      surt: String, ts: String, url: String, mime: String, status: Int,
      digest: String, length: Long, offset: Long, filename: String): String =
    s"""$surt $ts {"url": "$url", "mime": "$mime", "status": "$status", """ +
      s""""digest": "$digest", "length": "$length", "offset": "$offset", """ +
      s""""filename": "$filename"}"""
}
