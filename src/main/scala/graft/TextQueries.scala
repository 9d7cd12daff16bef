package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.operators.{Bpe, Classifier, Dedup, Keywords, LmScore, Multimodal, Packing, Psl, Relational, Sampling, Sketches, TextAnalysis, Urls}

/** Text-analysis / dedup / multimodal query surface over `documents`
  * — the training-data-pipeline operators (builder prompt; SURVEY §7
  * "beyond-reference capability extensions").
  *
  * DuckDB oracles replicate every deterministic computation exactly
  * (same token split, same integer counts, same double expression
  * order) — INCLUDING the xxhash64-based signatures: since round 13
  * [[graft.operators.Xxh64Duck]] emulates Spark's xxhash64 on DuckDB
  * HUGEINTs (staged CTEs, one 64-bit wraparound op per stage), so
  * `q_minhash_neardup`, `q_simhash_neardup`, `q_doc_fingerprint`,
  * `q_video_neardup_hashed` and the rest of the signature family are
  * hash-exact in CORRECTNESS, not rows-only. ScalaTest property specs
  * additionally cross-validate the estimates against exact Jaccard.
  */
object TextQueries {

  /** DuckDB fragment for whitespace tokens of `e`, empties removed —
    * must stay in lockstep with [[TextAnalysis.tokens]].
    */
  private def duckToks(e: String) = TextAnalysis.tokensDuckSql(e)

  private def exactDedup(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d), "doc_id", "text")

  private def textStats(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.charCount(t).as("n_chars_calc"),
      TextAnalysis.tokenCount(t).as("n_tokens"),
      TextAnalysis.bpeTokenCount(t).as("n_bpe_tokens"),
      TextAnalysis.avgTokenLen(t).as("avg_token_len"),
      TextAnalysis.punctRatio(t).as("punct_ratio"),
      TextAnalysis.stopwordRatio(t).as("stopword_ratio"))
  }

  private def qualityScore(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))

  private def langIdQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred"))

  /** Language-id eval ([[graft.operators.Profile.confusion]]): the
    * declared `lang` column against the n-gram predictor, one
    * (actual, predicted, n) row per cell — the confusion matrix a
    * corpus-filter rollout reads before trusting the model.
    */
  private def langConfusionQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.confusion(
      Tables.documents(s, d).withColumn(
        "lang_pred", TextAnalysis.langId(col("text"))),
      "lang", "lang_pred")

  private def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

  private def minhashNeardup(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
      k = 3, n = 64, bands = 16, threshold = 0.5)

  private def simhashNeardup(s: SparkSession, d: String): DataFrame =
    Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3)

  /** Default geometric double-blocking (lossless at threshold 0.5):
    * candidates are bounded to docs within ~4× of each other's
    * shingle count instead of the whole corpus.
    */
  private def ngramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      block = None, k = 3, threshold = 0.5)

  /** Token-window chunking: one row per (doc, chunk). */
  private def docChunks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TextAnalysis.chunks(col("text"), chunkSize = 32, overlap = 8))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_chunk_tokens", TextAnalysis.tokenCount(col("chunk_text")))

  /** Digit-run redaction over the text column. */
  private def redact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.redactDigits(col("text")).as("redacted"))

  /** Typed PII scrub. The corpus carries no real PII, so the query
    * plants a deterministic email + phone + IPv4 (keyed off doc_id)
    * in front of each doc and scrubs the result; the oracle plants
    * the identical strings and applies the identical regex chain.
    */
  private def piiRedact(s: SparkSession, d: String): DataFrame = {
    val planted = concat(
      lit("contact user"), col("doc_id").cast("string"),
      lit("@mail.example.org or +61 2 "),
      (pmod(col("doc_id"), lit(9000)) + 1000).cast("string"),
      lit(" 1234 at 192.168."),
      pmod(col("doc_id"), lit(256)).cast("string"),
      lit(".7 re: "), col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.redactPii(planted).as("pii_redacted"))
  }

  /** Training-mixture sampling: named sources kept at 9/10, 1/2,
    * 1/10; every other source at the 1/4 default — all map-only
    * hash-threshold decisions (see [[Sampling.mixtureSample]]).
    */
  private def mixtureSampleQ(s: SparkSession, d: String): DataFrame =
    Sampling.mixtureSample(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "source", "doc_id",
      rates = Seq(("src0", 9, 10), ("src1", 1, 2), ("src2", 1, 10)),
      default = Some((1, 4)))

  /** Deterministic epoch ordering ([[Sampling.epochOrder]]): every
    * doc's position in the reproducible hash-shuffled read order.
    */
  private def epochShuffle(s: SparkSession, d: String): DataFrame =
    Sampling.epochOrder(Tables.documents(s, d).select(col("doc_id")), "doc_id")

  /** True token budgets under the COMMITTED BPE vocabulary
    * ([[graft.operators.BpeVocab]] → map-only [[Bpe.tokenCount]]):
    * encoding under a fixed shipped tokenizer, the production
    * steady-state. Driver-checked hash-exact since round 12 — the
    * oracle inlines the committed merge table and replays the encode
    * itself in SQL ([[Bpe.bpeTokensDuckSql]]'s rank-ordered recursive
    * CTE). Training stays covered by `q_bpe_roundtrip` (per-run
    * trained merges, decode-roundtrip oracle) and `BpeSpec`.
    */
  private def bpeTokensQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      Bpe.tokenCount(col("text"), graft.operators.BpeVocab.merges)
        .as("n_bpe_tokens"))

  /** Encode→decode roundtrip under the end-of-word marker: the
    * learned tokenizer must be lossless up to whitespace
    * normalization, which IS SQL-expressible — the oracle just
    * space-joins the whitespace tokens. A real cross-check of the
    * whole marked train/encode/decode path (any lost or doubled
    * boundary marker breaks equality on every affected doc).
    */
  private def bpeRoundtripQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = Bpe.trainMerges(docs, "text",
      numMerges = 200, maxWords = 5000, endOfWord = "</w>")
    docs.select(col("doc_id"),
      Bpe.decode(Bpe.encode(col("text"), merges, "</w>"), "</w>").as("decoded"))
  }

  /** True token budgets under the COMMITTED unigram-LM vocabulary
    * ([[graft.operators.UnigramVocab]] → map-only
    * [[Unigram.tokenCount]], round 18 — the tokenizer family's second
    * member beside BPE): Viterbi segmentation under fixed integer
    * scores. The oracle inlines the committed vocab and replays the
    * Viterbi DP itself in SQL ([[Unigram.unigramTokensDuckSql]]'s
    * windowed recursive CTE) — cross-engine exact because the DP
    * objective is one BIGINT key (scores integer-committed at
    * training time).
    */
  private def unigramTokensQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      graft.operators.Unigram.tokenCount(col("text"),
          graft.operators.UnigramVocab.vocab,
          graft.operators.UnigramVocab.maxPieceLen)
        .cast("long").as("n_unigram_tokens"))

  /** Per-run unigram TRAINING + encode losslessness: Viterbi pieces
    * of every word concatenate back to the word exactly (any lost,
    * doubled, or reordered piece breaks equality on every affected
    * doc), so the whole train → commit-scores → encode path is
    * query-covered while the oracle stays the closed form
    * (space-free fuse of the whitespace tokens).
    */
  private def unigramRoundtripQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val vocab = graft.operators.Unigram.trainVocab(docs, "text",
      vocabSize = 300, maxPieceLen = 4, maxWords = 5000, emIters = 2)
    docs.select(col("doc_id"),
      array_join(graft.operators.Unigram.encode(col("text"), vocab), "")
        .as("fused"))
  }

  /** Temperature-smoothed (α = 1/2) language mixture
    * ([[Sampling.sqrtTemperatureSample]]): sampled per-language sizes
    * ∝ sqrt(original) — large languages damped, smallest kept whole —
    * decided in exact integer arithmetic (h²·n < minN·M²), so the
    * oracle reproduces every boundary row.
    */
  private def temperatureSampleQ(s: SparkSession, d: String): DataFrame =
    Sampling.sqrtTemperatureSample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")), "lang", "doc_id")
      .select("doc_id", "lang")

  /** Cross-corpus line dedup ([[Dedup.dedupCorpusLines]]) over a
    * deterministically line-structured corpus: each doc becomes
    * 60-char-prefix line + a planted shared boilerplate line + the
    * full text — so the banner survives only in the globally first
    * doc, and prefix lines dedup exactly where near-dup docs share
    * their opening.
    */
  /** Gopher repetition-filter suite
    * ([[TextAnalysis.repetitionSignals]], round 13): each doc is
    * PLANTED into a lined shape (banner, 72-char head, banner again,
    * full text) so every signal has real surface — the duplicated
    * banner drives the dup-line fractions, natural token repetition
    * drives the top-n-gram ones, and short docs (head == text)
    * exercise the boundary. Integer-ppm end to end; the oracle
    * mirrors every list expression 1:1.
    */
  private def gopherRepetitionQ(s: SparkSession, d: String): DataFrame = {
    val banner = "accept all cookies to continue"
    val lined = Tables.documents(s, d).select(
      col("doc_id"),
      concat(lit(banner), lit("\n"), substring(col("text"), 1, 72),
        lit("\n"), lit(banner), lit("\n"), col("text")).as("text"))
    TextAnalysis.repetitionSignals(lined, "doc_id", "text")
  }

  private def corpusLineDedupQ(s: SparkSession, d: String): DataFrame = {
    val banner = "graft cookie banner: accept all cookies to continue"
    val lined = Tables.documents(s, d).select(
      col("doc_id"),
      concat(substring(col("text"), 1, 60), lit("\n"), lit(banner),
        lit("\n"), col("text")).as("text"))
    Dedup.dedupCorpusLines(lined, "doc_id", "text")
  }

  /** WARC crawl-container ingest roundtrip ([[graft.sources.Warc]],
    * round 13): the documents corpus is MUXED distributedly into
    * per-partition `.warc.gz` files (per-record gzip members — the
    * Common Crawl layout), read back through the streaming WARC
    * parser with its dead-letter split, and reduced to
    * engine-checkable fields. The oracle is the roundtrip identity:
    * every parsed record must reproduce its source row's UTF-8 byte
    * length and character count — a corrupted header, a mis-framed
    * payload, or a dropped record all break the hash.
    */
  /** Distributed mux of a `(doc_id, text)` frame into per-partition
    * `.warc.gz` files (per-record gzip members) under `dir` — the
    * shared front half of the crawl-ingest queries. URIs encode the
    * doc_id so parsers can recover it without hashing.
    */
  private def muxWarcGz(
      docs: org.apache.spark.sql.DataFrame, dir: String, tag: String): Unit = {
    // Shards scale with the session's parallelism (a fixed shard
    // count would serialize the gzip encode at 100×): one .warc.gz
    // per non-empty shard.
    val shards = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(shards, col("doc_id")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val recs = it.map { r =>
          graft.sources.Warc.renderRecord(
            "conversion", s"<urn:uuid:graft-${r.getLong(0)}>",
            s"https://graft.test/doc/${r.getLong(0)}",
            "2026-01-01T00:00:00Z", "text/plain",
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }.toSeq
        if (recs.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          // Atomic landing ([[graft.sources.Warc.stream]]'s producer
          // contract): the streaming drop-dir variant busy-polls the
          // directory while these shards are being written, and a
          // file listed half-written is ingested truncated FOREVER
          // (the source tracks paths, never re-reads). Stage under a
          // hidden dot-name (file sources ignore them), then
          // same-filesystem ATOMIC_MOVE into place.
          val name = f"$tag-$pid%05d.warc.gz"
          val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
          java.nio.file.Files.write(tmp, graft.sources.Warc.gzipMembers(recs))
          java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
    }
  }

  /** Distributed mux of `(doc_id, text)` into `.warc.gz` files of
    * WARC `response` records — each payload a rendered HTTP response
    * (status line, headers, CRLF CRLF, [[pageShellStr]] HTML page):
    * the Common Crawl primary-artifact shape, the raw-crawl front
    * door's fixture. Partition 0 additionally plants four records the
    * extraction filters must route OUT (a 404 page, a 200 image/png,
    * a 200 page declaring charset=iso-8859-1, and a `request`
    * record) — if any leaks through, its hashed id surfaces a row the
    * oracle doesn't have.
    */
  /** `multiHost = true` spreads docs over five hosts with varied
    * paths (`https://s<id%5>.graft.test/p<id%4>/doc/<id>`) and plants
    * per-host `robots.txt` RESPONSE records (hosts 0–2: a `graftbot`
    * group with literal longest-match rules PLUS RFC 9309 §2.2.3
    * patterns — a `*`-interior Disallow out-scoring the literal
    * Allow, a `$`-anchored Allow out-scoring both — and an
    * `aftbot/1.0` containment-trap group; host 3: only a `*`
    * fallback with `$`-anchored carve-outs; host 4: none; plus a
    * deep-path decoy robots capture for host 0) — the
    * self-contained-archive fixture for the robots-enforced flagship.
    */
  /** Memoized fixture staging: each muxed `.warc.gz` archive is a
    * pure function of (sf dir, fixture key), so within one JVM the
    * first caller builds it and every later call (bench timed runs
    * after the warmup pass, repeated verify invocations) reuses the
    * directory. This keeps fixture CONSTRUCTION out of timed bench
    * regions — the BENCH rows for the crawl queries measure the
    * engine, not the fixture writer (BASELINE.md records the one-time
    * staging share) — without changing what any query reads.
    */
  private val stagedFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stagedDir(key: String, d: String)(build: String => Unit): String =
    stagedFixtures.computeIfAbsent(s"$key|$d", _ => {
      val dir = graft.streaming.Scratch.tmpDir(key)
      build(dir)
      dir
    })

  private def muxWarcHttpGz(
      docs: org.apache.spark.sql.DataFrame, dir: String, tag: String,
      multiHost: Boolean = false): Unit = {
    def httpResponse(status: String, contentType: String, body: Array[Byte]): Array[Byte] = {
      val head = (s"HTTP/1.1 $status\r\n" +
        s"Content-Type: $contentType\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      head ++ body
    }
    def response(recId: String, uri: String, payload: Array[Byte]): Array[Byte] =
      graft.sources.Warc.renderRecord(
        "response", recId, uri, "2026-01-01T00:00:00Z",
        "application/http; msgtype=response", payload)
    val shards = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(shards, col("doc_id")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val robots: Seq[Array[Byte]] =
          if (pid != 0 || !multiHost) Seq.empty
          else (0 until 4).map { kk =>
            val body =
              if (kk < 3)
                // the aftbot/1.0 group is the containment trap: its
                // token is a SUBSTRING of "graftbot/1.0" (and longer
                // than "graftbot") but not a prefix of the product
                // token — RFC matching must ignore it or every page
                // on the host disappears. The graftbot group mixes
                // literal prefixes with a `*`-interior Disallow that
                // out-scores the longer-matching literal Allow, and a
                // `$`-anchored Allow that out-scores the wildcard.
                s"# graft robots\nUser-agent: aftbot/1.0\nDisallow: /\n\n" +
                  s"User-agent: graftbot\nDisallow: /p$kk/\n" +
                  s"Allow: /p$kk/doc/1\nDisallow: /p*/doc/*7*\n" +
                  s"Allow: /p*/doc/*77$$\n\nUser-agent: *\nDisallow: /tmp/\n"
              else
                "User-agent: otherbot\nDisallow: /\n\n" +
                  "User-agent: *\nDisallow: /p1/\n" +
                  "Allow: /p1/doc/*33$\nAllow: /p1/doc/13$\n"
            response(s"<urn:uuid:graft-robots-$kk>",
              s"https://s$kk.graft.test/robots.txt",
              httpResponse("200 OK", "text/plain; charset=utf-8",
                body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          } :+ {
            // deep-path decoy: a 200 text/plain capture of
            // .../mirror/robots.txt whose record id sorts BEFORE the
            // real root fetch — if robotsTable ever regresses to
            // suffix matching, min_by picks this Disallow-everything
            // body for host 0 and the oracle loses every s0 page.
            response("<urn:uuid:graft-decoy-0>",
              "https://s0.graft.test/mirror/robots.txt",
              httpResponse("200 OK", "text/plain; charset=utf-8",
                "User-agent: *\nDisallow: /\n"
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          }
        val junk: Seq[Array[Byte]] =
          if (pid != 0) Seq.empty
          else Seq(
            response("<urn:uuid:graft-junk-404>", "https://graft.test/junk/404",
              httpResponse("404 Not Found", "text/html; charset=utf-8",
                "<html><body>gone</body></html>".getBytes("UTF-8"))),
            response("<urn:uuid:graft-junk-png>", "https://graft.test/junk/png",
              httpResponse("200 OK", "image/png", Array[Byte](0x50, 0x4e, 0x47))),
            // REAL latin-1 bytes (é = 0xE9, not the UTF-8 pair):
            // conservative-keep-set queries route this page out;
            // q_warc_html_docs widens the set and must decode it
            // faithfully, not as mojibake
            response("<urn:uuid:graft-junk-latin>", "https://graft.test/junk/latin",
              httpResponse("200 OK", "text/html; charset=iso-8859-1",
                "<html><body>café</body></html>".getBytes("ISO-8859-1"))),
            graft.sources.Warc.renderRecord(
              "request", "<urn:uuid:graft-junk-req>",
              "https://graft.test/junk/req", "2026-01-01T00:00:00Z",
              "application/http; msgtype=request",
              "GET /junk HTTP/1.1\r\nHost: graft.test\r\n\r\n".getBytes("UTF-8")))
        val recs = robots ++ junk ++ it.map { r =>
          val id = r.getLong(0)
          val uri =
            if (multiHost)
              s"https://s${id % 5}.graft.test/p${id % 4}/doc/$id"
            else s"https://graft.test/doc/$id"
          response(s"<urn:uuid:graft-$id>", uri,
            httpResponse("200 OK", "text/html; charset=utf-8",
              pageShellStr(id, r.getString(1))
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.toSeq
        if (recs.nonEmpty) {
          val name = f"$tag-$pid%05d.warc.gz"
          val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
          java.nio.file.Files.write(tmp, graft.sources.Warc.gzipMembers(recs))
          java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
    }
  }

  /** The raw-crawl bridge driver-checked end to end
    * ([[graft.sources.Warc.responseDocuments]], round 14): HTTP
    * `response` records → envelope split → charset/status/media-type
    * routing → [[TextAnalysis.stripHtml]] → documents shape. The
    * oracle rebuilds each page from `documents`, strips it with the
    * identical SQL chain, and replays the xxhash64 record-id chain
    * ([[graft.operators.Xxh64Duck.ascii31DuckCtes]]) — so ids, hosts
    * AND extracted-text lengths are all hash-exact, and any planted
    * junk record leaking past the filters surfaces as an extra row.
    * Round 15: the keep set is WIDENED to include `iso-8859-1` (with
    * utf-8 that covers the overwhelming majority of the web), so the
    * planted latin-1 page — REAL 0xE9 bytes, non-ASCII content —
    * must survive with its text decoded faithfully (4 chars, `café`),
    * which the oracle pins as a closed-form row keyed by the same
    * xxhash64 record-id chain. The 404/png/request junk still routes
    * out.
    */
  private def warcHtmlDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_http", d)(
      muxWarcHttpGz(docs, _, "seg"))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    graft.sources.Warc.responseDocuments(recs,
        keepCharsets = Set("", "utf-8", "iso-8859-1"))
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** The raw-crawl FLAGSHIP (round 14): WARC `response` bytes →
    * HTTP envelope split → HTML→text extraction → quality gate →
    * near-dup dedup → leakage-safe split — `q_crawl_curate` with the
    * real Common Crawl front door in place of WET. Doc ids are
    * recovered from the target URI (the fixture encodes them) so the
    * oracle joins the curation chain back to `documents`; the
    * xxhash64 production ids are hash-checked by `q_warc_html_docs`.
    * Oracle: the page rebuild + strip chain (`duckStripHtml`) feeds
    * the SAME stage twins `q_crawl_curate` composes — the gate over
    * the EXTRACTED text, the minhash/CC chains over the gated
    * universe, the split CASE.
    */
  private def warcHtmlCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_http", d)(
      muxWarcHttpGz(docs, _, "seg"))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    // Materialized: the gate, the keeper semi-join and the dedup
    // signatures all reference this frame, and each un-cut reference
    // would re-run the envelope split + strip-chain regexes over
    // every payload (the parse cut upstream only caches raw records).
    val extracted = graft.operators.Materialize(
      graft.sources.Warc.responseDocuments(recs)
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("text")))
    val gated = TextAnalysis.qualityKeep(extracted, "text")
    Dedup.dropNearDuplicates(gated, "doc_id", "text")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        when(TextAnalysis.splitBucket(col("doc_id")) < 90, "train")
          .otherwise("valid").as("split"))
  }

  /** The SELF-CONTAINED-ARCHIVE flagship (round 14): robots
    * enforcement needs no side channel — the crawl's own `robots.txt`
    * fetches ride the archive as response records. One pass builds
    * the per-host rules table ([[graft.sources.Warc.robotsTable]]),
    * the HTML responses extract to text, disallowed URLs leave
    * (agent `graftbot` — hosts 0–2 disallow their own `/p<k>/` path
    * with a longest-match literal Allow carve-out PLUS RFC 9309
    * §2.2.3 patterns: a `*`-interior Disallow out-scoring the
    * literal Allow and a `$`-anchored Allow out-scoring the
    * wildcard; host 3 only has a `*` fallback with `$`-anchored
    * carve-outs; host 4 publishes nothing; a deep-path decoy robots
    * capture and an `aftbot/1.0` containment-trap group must both be
    * ignored), and the survivors run the usual curation tail
    * (gate → dedup → split). Oracle: the robots decision's CLOSED
    * FORM (the `q_robots_filter` CASE) folded into the
    * `q_warc_html_curate` stage-twin chain.
    */
  private def warcRobotsCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_robots", d)(
      muxWarcHttpGz(docs, _, "seg", multiHost = true))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    val robots = graft.sources.Warc.robotsTable(recs)
    val extracted = graft.operators.Materialize(
      graft.sources.Warc.responseDocuments(recs)
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("text"), col("target_uri")))
    val allowed = graft.operators.Robots.filterAllowed(
        extracted, "target_uri", robots, "host", "body", "graftbot/1.0")
      .select("doc_id", "text")
    val gated = TextAnalysis.qualityKeep(allowed, "text")
    Dedup.dropNearDuplicates(gated, "doc_id", "text")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        when(TextAnalysis.splitBucket(col("doc_id")) < 90, "train")
          .otherwise("valid").as("split"))
  }

  /** The PRODUCTION-EXTRACTOR crawl flagship (round 15): the same
    * response archive as `q_warc_html_curate`, but the body runs
    * [[TextAnalysis.mainContent]] (the jusText-core boilerplate
    * remover — `q_warc_html_curate`'s flat strip curates nav bars and
    * cookie banners; this one doesn't) before the usual tail
    * (gate → near-dup dedup → leakage-safe split). Oracle:
    * [[TextAnalysis.mainContentDuckSql]] over the rebuilt page
    * composed with the identical stage twins. Routing matches
    * `responseDocuments` (200, text/html, utf-8-or-unspecified), so
    * all four planted junk records stay out.
    */
  private def warcMainCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_http", d)(
      muxWarcHttpGz(docs, _, "seg"))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    val pages = graft.sources.Warc.httpParts(recs
        .filter(col("warc_type") === "response" &&
          col("content_type").startsWith("application/http")))
      .filter(col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html") &&
        col("http_charset").isin("", "utf-8"))
    // Materialized for the same reason as q_warc_html_curate: gate,
    // keeper semi-join and dedup signatures all reference the frame,
    // and each un-cut reference would re-run the envelope split plus
    // the block-scoring extractor over every payload.
    val extracted = graft.operators.Materialize(
      pages.select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        TextAnalysis.mainContent(col("http_body")).as("text")))
    val gated = TextAnalysis.qualityKeep(extracted, "text")
    Dedup.dropNearDuplicates(gated, "doc_id", "text")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        when(TextAnalysis.splitBucket(col("doc_id")) < 90, "train")
          .otherwise("valid").as("split"))
  }

  private def warcIngest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_ingest", d)(
      muxWarcGz(docs, _, "part"))
    val (recs, rejects) =
      graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    // synthesized members must all be well-formed — surface a parser
    // regression as a loud failure, not silently fewer rows
    val guarded = recs.join(
      rejects.agg(count(lit(1)).as("__nrej")).filter(
        assert_true(col("__nrej") === 0L,
          concat(lit("q_warc_ingest: "), col("__nrej").cast("string"),
            lit(" rejects on well-formed input"))).isNull))
    guarded.select(
      regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"),
      col("content_length"),
      length(col("payload")).as("n_chars"),
      col("warc_type"))
  }

  /** The crawl FLAGSHIP composition (round 13): raw web-archive
    * bytes → training split in one hash-exact pipeline. The corpus is
    * muxed into `.warc.gz`, parsed back through [[graft.sources
    * .Warc]] (dead letters and all), quality-gated
    * ([[TextAnalysis.qualityGate]] — Gopher-style rules), near-dup
    * deduplicated ([[Dedup.dropNearDuplicates]] — banded MinHash +
    * CC min-id keepers), and 90/10 split by the deterministic id
    * hash (leakage-safe by construction: near-dup components were
    * collapsed to one keeper BEFORE splitting, so no pair can
    * straddle). Oracle: the roundtrip identity composes the three
    * existing stage twins — `qualityGateSql` → the minhash/CC chains
    * over the gated universe → the split CASE — exactly the batch
    * `q_curate` discipline with the crawl container in front.
    */
  private def crawlCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_gz", d)(
      muxWarcGz(docs, _, "seg"))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    val parsed = recs.select(
      regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"),
      col("payload").as("text"))
    val gated = TextAnalysis.qualityKeep(parsed, "text")
    Dedup.dropNearDuplicates(gated, "doc_id", "text")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        when(TextAnalysis.splitBucket(col("doc_id")) < 90, "train")
          .otherwise("valid").as("split"))
  }

  /** The WET→documents bridge driver-checked END TO END — including
    * the hashed ids (round 13): `wetDocuments` assigns
    * `doc_id = xxhash64(record_id)`, and the oracle reconstructs each
    * record id string and replays Spark's XXH64 over it in SQL
    * ([[graft.operators.Xxh64Duck.ascii31DuckCtes]] — the
    * arbitrary-short-ASCII generalization of the 32-byte chain:
    * CASE-gated word/4-byte/tail rounds, one chain for all lengths).
    * So the crawl bridge's identity column is itself hash-exact, not
    * just its payload stats.
    */
  private def wetDocumentsQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_gz", d)(
      muxWarcGz(docs, _, "seg"))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    graft.sources.Warc.wetDocuments(recs)
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** [[TextAnalysis.mainContent]] as a CRAWL-PATH citizen: the same
    * response archive as `q_warc_html_docs`, but the body runs the
    * boilerplate-removing extractor instead of the flat strip — on
    * the fixture's page shell that drops the `<h1>Doc N</h1>` heading
    * (short block) and the link/entity tail, keeping only the prose
    * `<p>` block when it clears 80 chars. Oracle:
    * [[TextAnalysis.mainContentDuckSql]] over the rebuilt page.
    */
  private def warcMainDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_warc_http", d)(
      muxWarcHttpGz(docs, _, "seg"))
    val (recs, _) = graft.sources.Warc.readWithRejects(s, dir + "/*.warc.gz")
    val pages = graft.sources.Warc.httpParts(recs
        .filter(col("warc_type") === "response" &&
          col("content_type").startsWith("application/http")))
      // same routing as responseDocuments incl. the charset keep set
      // (the fixture's planted iso-8859-1 junk page must route OUT
      // here too — its /junk/ URI has no doc id)
      .filter(col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html") &&
        col("http_charset").isin("", "utf-8"))
    pages.select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        TextAnalysis.mainContent(col("http_body")).as("content"))
      .select(col("doc_id"), col("content"),
        length(col("content")).cast("long").as("n_chars"))
  }

  /** STREAMING WARC ingest ([[graft.sources.Warc.stream]], round 13):
    * the documents corpus muxed in two parity micro-batches into a
    * watched drop directory, parsed by the streaming ingest (paths
    * via the pruned `binaryFile` listing; payloads stream inside
    * tasks), landed idempotently under `batch_id` partitions, and
    * read back. Same roundtrip-identity oracle as `q_warc_ingest` —
    * the batch split is semantics-free for ingest (record union is
    * batching-invariant), which is exactly what the shared oracle
    * asserts.
    */
  private def streamWarcIngest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val drop = graft.streaming.Scratch.tmpDir("graft_warc_drop")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_warc_recs")
    val rejsDir = graft.streaming.Scratch.tmpDir("graft_warc_rejs")
    val ckpt = graft.streaming.Scratch.ckptDir("graft_warc_ckpt")
    val q = graft.sources.Warc.stream(s, drop, recsDir, rejsDir, ckpt)
    try {
      muxWarcGz(docs.filter(col("doc_id") % 2 === 0), drop, "b0")
      q.processAllAvailable()
      muxWarcGz(docs.filter(col("doc_id") % 2 =!= 0), drop, "b1")
      q.processAllAvailable()
    } finally q.stop()
    graft.sources.Warc.readRecords(s, recsDir).select(
      regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"),
      col("content_length"),
      length(col("payload")).as("n_chars"),
      col("warc_type"))
  }

  /** Deterministic CDXJ index fixture built IN-PLAN from documents
    * (so the oracle replays every field from the same source): one
    * capture per doc at `https://s<id%5>.graft.test/doc/<id>` —
    * status 404 every 13th, content digest `md5(text)`, the SURT via
    * the REAL [[graft.operators.Urls.surt]] column — plus a second
    * capture of the same content at a different (file, offset) every
    * 7th doc (the duplicate-fetch reality the fetch plan collapses),
    * and three malformed junk lines for the dead-letter split.
    * Written as gzip text shards (the cdx-NNNNN.gz deployment shape).
    */
  private def muxCdxGz(docs: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val url = concat(lit("https://s"), (col("doc_id") % 5).cast("string"),
      lit(".graft.test/doc/"), col("doc_id").cast("string"))
    def line(status: org.apache.spark.sql.Column, offset: org.apache.spark.sql.Column,
        file: org.apache.spark.sql.Column) = concat(
      graft.operators.Urls.surt(url), lit(" 20260101000000 {\"url\": \""), url,
      lit("\", \"mime\": \"text/html\", \"status\": \""), status,
      lit("\", \"digest\": \""), md5(col("text")),
      lit("\", \"length\": \""), length(col("text")).cast("string"),
      lit("\", \"offset\": \""), offset.cast("string"),
      lit("\", \"filename\": \""), file, lit("\"}"))
    val status = when(col("doc_id") % 13 === 0, lit("404")).otherwise(lit("200"))
    val f1 = concat(lit("crawl/seg-"), (col("doc_id") % 10).cast("string"),
      lit(".warc.gz"))
    val base = docs.select(line(status, col("doc_id") * 1000, f1).as("value"))
    val second = docs.filter(col("doc_id") % 7 === 0)
      .select(line(status, col("doc_id") * 1000 + 7,
        lit("crawl/seg-x.warc.gz")).as("value"))
    val sess = docs.sparkSession
    import sess.implicits._
    val junk = Seq(
      "not a cdx line",
      "test,junk)/a 2026bad {\"url\": \"https://junk/a\"}",
      "test,junk)/b 20260101000000 {\"status\": \"200\"}").toDF("value")
    base.union(second).union(junk)
      .coalesce(8)
      .write.option("compression", "gzip").mode("overwrite").text(dir)
  }

  /** CDX index ingest roundtrip ([[graft.sources.Cdx]]): the fixture
    * index parses back field-exact — SURT (the [[Urls.surt]] twin is
    * part of the oracle), timestamp, url, mime, status, digest,
    * byte ranges — with the three junk lines dead-lettered (in-plan
    * zero-tolerance guard: exactly 3 rejects or the hash breaks).
    */
  private def cdxIngest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = graft.streaming.Scratch.tmpDir("graft_cdx_ingest") + "/idx"
    muxCdxGz(docs, dir)
    val (recs, rejects) = graft.sources.Cdx.readWithRejects(s, dir)
    val guarded = recs.join(
      rejects.agg(count(lit(1)).as("__nrej")).filter(
        assert_true(col("__nrej") === 3L,
          concat(lit("q_cdx_ingest: expected 3 rejects, got "),
            col("__nrej").cast("string"))).isNull))
    guarded.select("surt", "ts", "url", "mime", "status", "digest",
      "length", "offset", "warc_file")
  }

  /** Content-dedup fetch plan ([[graft.sources.Cdx.fetchPlan]]): one
    * capture per 200-status digest (deterministic (file, offset)
    * minimum) + copy counts — the index-first bandwidth cut. Oracle
    * replays the grouping over the same derived captures.
    */
  private def cdxFetchPlan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = graft.streaming.Scratch.tmpDir("graft_cdx_plan") + "/idx"
    muxCdxGz(docs, dir)
    val (recs, _) = graft.sources.Cdx.readWithRejects(s, dir)
    graft.sources.Cdx.fetchPlan(recs)
  }

  /** A REAL archive-plus-index fixture: every doc becomes an HTTP
    * response record in `seg-<pid>.warc.gz` (own gzip member), docs
    * with `doc_id % 7 == 0` get a second byte-identical capture in
    * `xtra-<pid>.warc.gz` (distinct WARC record id, same payload →
    * same content digest — the re-crawl shape), and a true CDXJ shard
    * `idx-<pid>.cdx` records each capture's ACTUAL `(filename,
    * offset, length)` from [[graft.sources.Warc.gzipMembersIndexed]].
    * Unlike [[muxCdxGz]] (synthetic ranges for parse tests), these
    * ranges really dereference.
    */
  /** Planted link trailer for the crawl-loop fixture (`plantLinks`):
    * with `g = id % 5` (the host) and `b = id / 5`, pages link along
    * a BOUNDED-DEPTH BFS lattice — depth is `b % 4` regardless of
    * corpus size, so the discovery cascade is a CONSTANT number of
    * micro-batches at every SF:
    *
    *  - `b % 4 ∈ {0, 1}`: one RELATIVE link `../doc/<id+5>` (same
    *    host, next b — resolution against the page's own base URI is
    *    what's under test);
    *  - `b % 4 == 2`: one ABSOLUTE cross-host link to the doc at
    *    `(g+1 mod 5, b+1)`;
    *  - `b % 4 == 3`: no crawlable links (cascade floor);
    *  - every page: mailto/fragment/javascript junk that resolution
    *    must drop (plus [[pageShellStr]]'s own `ex.com` href — a
    *    capture-less ghost that exercises scheduled-state-without-
    *    landing every tick).
    */
  private def loopLinkTrailer(id: Long): String = {
    val g = id % 5; val b = id / 5
    val step =
      if (b % 4 == 0 || b % 4 == 1) s"""<a href="../doc/${id + 5}">n</a>"""
      else if (b % 4 == 2)
        s"""<a href="https://s${(g + 1) % 5}.graft.test/doc/${5 * (b + 1) + (g + 1) % 5}">x</a>"""
      else ""
    step + "<a href=\"mailto:crawl@graft.test\">m</a>" +
      "<a href=\"#top\">f</a><a href=\"javascript:void(0)\">j</a>"
  }

  private[graft] def muxWarcCdxGz(
      docs: org.apache.spark.sql.DataFrame, dir: String,
      multiHost: Boolean = false, plantBad: Boolean = false,
      plantLinks: Boolean = false): Unit = {
    val shards = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(shards, col("doc_id")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val md = java.security.MessageDigest.getInstance("MD5")
        def digestOf(b: Array[Byte]): String =
          md.digest(b).map(x => f"$x%02x").mkString
        def hostOf(id: Long): String =
          if (multiHost) s"s${id % 5}.graft.test" else "graft.test"
        def surtHost(id: Long): String =
          hostOf(id).split('.').reverse.mkString(",")
        val rows = it.map { r => (r.getLong(0), r.getString(1)) }.toSeq
        if (rows.nonEmpty) {
          def page(id: Long, text: String): Array[Byte] = {
            val body = (pageShellStr(id, text) +
              (if (plantLinks) loopLinkTrailer(id) else ""))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n")
              .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
          }
          def record(recId: String, id: Long, pg: Array[Byte]): Array[Byte] =
            graft.sources.Warc.renderRecord("response", recId,
              s"https://${hostOf(id)}/doc/$id", "2026-01-01T00:00:00Z",
              "application/http; msgtype=response", pg)
          def writeAtomic(name: String, bytes: Array[Byte]): Unit = {
            val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
            java.nio.file.Files.write(tmp, bytes)
            java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
          val segName = f"seg-$pid%05d.warc.gz"
          val xtraName = f"xtra-$pid%05d.warc.gz"
          val pages = rows.map { case (id, text) => (id, page(id, text)) }
          val (segBytes, segIdx) = graft.sources.Warc.gzipMembersIndexed(
            pages.map { case (id, pg) => record(s"<urn:uuid:graft-$id>", id, pg) })
          writeAtomic(segName, segBytes)
          val dups = pages.filter { case (id, _) => id % 7 == 0 }
          val (xtraBytes, xtraIdx) = graft.sources.Warc.gzipMembersIndexed(
            dups.map { case (id, pg) => record(s"<urn:uuid:graft-dup-$id>", id, pg) })
          if (dups.nonEmpty) writeAtomic(xtraName, xtraBytes)
          def cdxLine(id: Long, pg: Array[Byte], ts: String,
              file: String, off: Long, len: Long): String =
            graft.sources.Cdx.renderLine(
              s"${surtHost(id)})/doc/$id", ts, s"https://${hostOf(id)}/doc/$id",
              "text/html", 200, digestOf(pg), len, off, file)
          val lines =
            pages.zip(segIdx).map { case ((id, pg), (off, len)) =>
              cdxLine(id, pg, "20260101000000", segName, off, len) } ++
            dups.zip(xtraIdx).map { case ((id, pg), (off, len)) =>
              cdxLine(id, pg, "20260102000000", xtraName, off, len) } ++
            // planted dead-letter ranges (`plantBad`): a unique digest
            // whose range points 2 bytes INTO a gzip member — never
            // decompressible, so the planned fetch must dead-letter it
            // while consuming its schedule slot
            (if (plantBad)
               pages.zip(segIdx).collect {
                 case ((id, _), (off, len)) if id % 11 == 3 =>
                   graft.sources.Cdx.renderLine(
                     s"${surtHost(id)})/bad/$id", "20260103000000",
                     s"https://${hostOf(id)}/bad/$id", "text/html", 200,
                     s"BAD-$id", len, off + 2, segName)
               }
             else Seq.empty)
          writeAtomic(f"idx-$pid%05d.cdx",
            lines.mkString("", "\n", "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        ()
    }
  }

  /** CLOSING THE CDX LOOP (round 15): fetch plan → ranged fetch —
    * the real Common Crawl access pattern. The index is read and
    * deduped to one capture per content digest
    * ([[graft.sources.Cdx.fetchPlan]]), the plan's `(warc_file,
    * offset, length)` ranges are dereferenced against the segment
    * files ([[graft.sources.Warc.fetchRanged]] — one open per file,
    * ascending-offset seeks, payloads never shuffle), and the fetched
    * records extract to documents. The planted re-crawl duplicates
    * (`doc_id % 7 == 0`, byte-identical second capture) must be
    * planned AWAY (min `(file, offset)` picks the `seg-` capture over
    * `xtra-`), so the fetched set is EXACTLY one record per doc —
    * which is what the oracle hash-checks, copy counts included.
    * Zero dead letters tolerated (in-plan guard): every planned range
    * must dereference to a well-formed record.
    */
  private def cdxFetchJoin(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_fetch", d)(muxWarcCdxGz(docs, _))
    val (cdx, _) = graft.sources.Cdx.readWithRejects(s, dir + "/*.cdx")
    val plan = graft.sources.Cdx.fetchPlan(cdx)
    val (recs, rejects) = graft.sources.Warc.fetchRanged(s, plan, baseDir = dir)
    val guarded = recs.join(
      rejects.agg(count(lit(1)).as("__nrej")).filter(
        assert_true(col("__nrej") === 0L,
          concat(lit("q_cdx_fetch_join: "), col("__nrej").cast("string"),
            lit(" dead letters on planned ranges"))).isNull))
    val fetched = graft.sources.Warc.responseDocuments(guarded)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("n_chars"), col("target_uri"))
    fetched.join(plan.select(col("url"), col("n_copies")),
        fetched("target_uri") === col("url"))
      .select("doc_id", "n_chars", "n_copies")
  }

  /** robots.txt `Sitemap:` directives + governing-group `Crawl-delay`
    * ([[graft.operators.Robots.sitemaps]] / `crawlDelay`, round 15):
    * per-doc synthetic bodies carry a `graftbot` group with a
    * fractional delay (a SECOND declaration that must lose —
    * first-wins pinned), a `*` group with a decoy delay of 9 that
    * must NOT bind, and two sitemap directives in mixed key case
    * (global per the sitemaps protocol — extracted regardless of
    * group). Oracle: the closed form of both extractions.
    */
  private def robotsSitemapsQ(s: SparkSession, d: String): DataFrame = {
    val k = (col("doc_id") % 5).cast("string")
    val id = col("doc_id").cast("string")
    val body = concat(
      lit("# graft\nUser-agent: graftbot\nDisallow: /p/\nCrawl-delay: "),
      ((col("doc_id") % 4) + 1).cast("string"),
      lit(".5\nCrawl-delay: 7\n\nUser-agent: *\nCrawl-delay: 9\nDisallow: /x/\n"),
      lit("Sitemap: https://s"), k, lit(".graft.test/sm/"), id,
      lit("-a.xml\n# note\nsitemap: https://s"), k, lit(".graft.test/sm/"), id,
      lit("-b.xml\n"))
    Tables.documents(s, d).select(
      col("doc_id"),
      explode(graft.operators.Robots.sitemaps(body)).as("sitemap"),
      graft.operators.Robots.crawlDelay(body, "graftbot/1.0")
        .as("crawl_delay_s"))
  }

  /** Politeness-scheduled fetch plan ([[graft.sources.Cdx.schedule]],
    * round 15): the content-deduped fetch plan joined to per-host
    * crawl delays (host 4 declares none → NULL → schedules at 0) and
    * laid out `slot × delay` seconds apart within each host — the
    * frontier a `Crawl-delay`-honoring fetcher consumes. One keyed
    * window; hosts are the natural parallelism unit (per-host serial
    * BY DESIGN). Oracle: the fetch-plan CTE chain + the same
    * row_number window.
    */
  private def fetchScheduleQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = graft.streaming.Scratch.tmpDir("graft_cdx_sched") + "/idx"
    muxCdxGz(docs, dir)
    val (recs, _) = graft.sources.Cdx.readWithRejects(s, dir)
    val plan = graft.sources.Cdx.fetchPlan(recs)
      .withColumn("host", graft.operators.Urls.host(col("url")))
    val delays = Seq(
      ("s0.graft.test", 0.5), ("s1.graft.test", 1.0),
      ("s2.graft.test", 1.5), ("s3.graft.test", 2.0))
      .toDF("host", "delay_s")
    graft.sources.Cdx.schedule(
        plan.join(broadcast(delays), Seq("host"), "left"),
        "host", "delay_s", Seq("warc_file", "offset"))
      .select("digest", "url", "host", "slot", "not_before_s")
  }

  /** STREAMING CDX fetch ([[graft.streaming.CdxFetchStream]]) — the
    * index-first crawl loop run INCREMENTALLY: index lines replay in
    * two micro-batches (batch 0: primary captures of even doc ids;
    * batch 1: primary captures of odd ids PLUS every re-crawl
    * duplicate capture — so batch 1 carries already-fetched digests
    * across the batch boundary AND intra-batch duplicates of its own
    * docs), and only never-seen digests dereference. Cross-batch
    * dedup failing would land the even `%7==0` docs twice; in-batch
    * plan failing would land odd `%7==0` docs twice; either surfaces
    * as extra rows against the one-row-per-doc oracle.
    */
  private def streamCdxFetch(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_fetch", d)(muxWarcCdxGz(docs, _))
    val lines = s.read.text(dir + "/*.cdx").select(col("value").as("line"))
    // parity of the capture's doc id, recoverable from the url field
    val docId = regexp_extract(col("line"), "/doc/(\\d+)\"", 1).cast("long")
    val primary = col("line").contains("\"filename\": \"seg-")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_cdxf_state")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_cdxf_recs")
    val n0 = graft.streaming.CdxFetchStream.fetchBatch(
      lines.filter(docId % 2 === 0 && primary), 0L, stateDir, recsDir, dir)
    val n1 = graft.streaming.CdxFetchStream.fetchBatch(
      lines.filter(docId % 2 =!= 0 || !primary), 1L, stateDir, recsDir, dir)
    // committed manifest view: crash orphans invisible
    val landed = graft.sources.Warc.readRecords(s, recsDir)
    graft.sources.Warc.responseDocuments(landed.drop("batch_id"))
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("n_chars"))
  }

  /** POLITENESS ENFORCED ON THE FETCH PATH (round 16): the full
    * polite-crawl composition — CDX index → content-deduped fetch
    * plan → per-host `Crawl-delay`s extracted from robots bodies
    * ([[graft.operators.Robots.crawlDelay]]) → politeness schedule
    * ([[graft.sources.Cdx.schedule]]) → scheduled ranged fetch
    * ([[graft.sources.Warc.fetchScheduled]]), which dereferences each
    * host's ranges strictly in slot order and stamps every record
    * with `fetch_seq`, its ACTUAL per-host fetch position. The oracle
    * pins `fetch_seq == slot` row by row — the politeness contract
    * itself, which breaks if anything ever splits a host across
    * tasks or reorders within one — plus the schedule closed form and
    * the extracted page lengths.
    *
    * The fixture is multi-host (5 hosts; 4 declare delays via robots,
    * one publishes none → schedules at 0 spacing) and plants
    * dead-letter ranges (`doc_id % 11 == 3`: a unique digest whose
    * range points 2 bytes into a gzip member). The in-plan guard
    * asserts EXACTLY the planted count dead-letters; their consumed
    * slots must leave every later record's `fetch_seq == slot` intact
    * — dead letters unaffected AND non-disruptive.
    */
  private def politeFetchQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_polite", d)(
      muxWarcCdxGz(docs, _, multiHost = true, plantBad = true))
    val (cdx, _) = graft.sources.Cdx.readWithRejects(s, dir + "/*.cdx")
    val hosted = graft.sources.Cdx.fetchPlan(cdx)
      .withColumn("host", graft.operators.Urls.host(col("url")))
    val robots = Seq(
      ("s0.graft.test",
        "User-agent: graftbot\nCrawl-delay: 0.5\n\nUser-agent: *\nCrawl-delay: 9\n"),
      ("s1.graft.test",
        "User-agent: graftbot/1.0\nCrawl-delay: 1\n\nUser-agent: *\nCrawl-delay: 9\n"),
      ("s2.graft.test",
        "User-agent: graftbot\nCrawl-delay: 1.5\nCrawl-delay: 8\n"),
      ("s3.graft.test", "User-agent: graftbot\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val delays = robots.select(col("host"),
      graft.operators.Robots.crawlDelay(col("body"), "graftbot/1.0")
        .as("delay_s"))
    // slot order by URL: unique per capture and engine-replayable
    // (the synthetic-range queries order by (warc_file, offset); here
    // the REAL byte offsets are not closed-form, the url is)
    val plan = graft.operators.Materialize(graft.sources.Cdx.schedule(
      hosted.join(broadcast(delays), Seq("host"), "left"),
      "host", "delay_s", orderCols = Seq("url")))
    try {
      val (recs, rejects) =
        graft.sources.Warc.fetchScheduled(s, plan, baseDir = dir)
      val expected = docs.filter(col("doc_id") % 11 === 3)
        .agg(count(lit(1)).as("__nbad"))
      val guard = rejects.agg(count(lit(1)).as("__nrej"))
        .crossJoin(expected)
        .filter(assert_true(col("__nrej") === col("__nbad"),
          concat(lit("q_polite_fetch: "), col("__nrej").cast("string"),
            lit(" dead letters, planted "), col("__nbad").cast("string")))
          .isNull)
        .select(lit(1).as("__g"))
      graft.sources.Warc.httpParts(recs.filter(col("warc_type") === "response"))
        .filter(col("http_status") === 200)
        .join(guard)
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("host"), col("slot"), col("not_before_s"), col("fetch_seq"),
          length(graft.operators.TextAnalysis.stripHtml(col("http_body")))
            .cast("long").as("n_chars"))
    } finally graft.operators.Materialize.release(plan)
  }

  /** CRAWL FRONTIER from sitemap seeds ([[graft.operators.Frontier]],
    * round 16) — the operator between the crawl stack's two ends:
    * per-doc sitemap XML bodies yield `<loc>` seeds
    * ([[graft.operators.Frontier.sitemapLocs]]); the frontier
    * canonicalizes them to SURT keys, collapses the planted
    * cross-listing duplicates (every `doc_id % 9 == 0` sitemap also
    * lists one shared hub URL; `% 9 == 3` sitemaps list a
    * case+default-port variant of their own URL that must FOLD to the
    * same key), anti-joins the already-fetched state (`% 6 == 0`
    * seeds are crawled already — including ones whose variant
    * listing arrived this round), gates through per-host robots
    * (`/p2/` disallowed on the four robots-publishing hosts; the
    * fifth publishes none → allowed), and lays the survivors out
    * politely with robots-extracted `Crawl-delay` spacing. Oracle:
    * the closed form of every stage.
    */
  private def crawlFrontierQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val k = (col("doc_id") % 5).cast("string")
    val p = (col("doc_id") % 4).cast("string")
    val id = col("doc_id").cast("string")
    val own = concat(lit("https://s"), k, lit(".graft.test/p"), p,
      lit("/doc/"), id)
    val variant = concat(lit("https://S"), k, lit(".GRAFT.test:443/p"), p,
      lit("/doc/"), id)
    val xml = concat(
      lit("<?xml version=\"1.0\"?>\n<urlset>\n  <url><loc> "), own,
      lit(" </loc></url>\n"),
      when(col("doc_id") % 9 === 3,
        concat(lit("  <url><LOC>"), variant, lit("</LOC></url>\n")))
        .otherwise(lit("")),
      when(col("doc_id") % 9 === 0,
        lit("  <url><loc>https://shared.graft.test/hub</loc></url>\n"))
        .otherwise(lit("")),
      lit("</urlset>\n"))
    val docs = Tables.documents(s, d)
    val seeds = docs.select(
      explode(graft.operators.Frontier.sitemapLocs(xml)).as("url"))
    val fetched = docs.filter(col("doc_id") % 6 === 0)
      .select(graft.operators.Urls.surt(own).as("surt"))
    val robots = Seq(
      ("s0.graft.test",
        "User-agent: graftbot\nDisallow: /p2/\nCrawl-delay: 0.5\n\n" +
          "User-agent: *\nDisallow: /\n"),
      ("s1.graft.test",
        "User-agent: graftbot/1.0\nDisallow: /p2/\nCrawl-delay: 1\n"),
      ("s2.graft.test",
        "User-agent: graftbot\nDisallow: /p2/\nCrawl-delay: 1.5\nCrawl-delay: 8\n"),
      ("s3.graft.test", "User-agent: graftbot\nDisallow: /p2/\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    graft.operators.Frontier.build(
      seeds, "url", fetched, "surt", robots, "host", "body", "graftbot/1.0")
  }

  /** THE WHOLE CRAWL LOOP IN ONE QUERY (round 16): sitemap seeds →
    * frontier ([[graft.operators.Frontier.build]]: SURT fold, dedup,
    * fetched-state anti-join, robots gate, `Crawl-delay` schedule) →
    * CAPTURE-INDEX RESOLUTION (the index-first move: frontier SURTs
    * equi-join the CDX fetch plan's SURT keys — a URL is fetched via
    * its archived byte range, never a blind HTTP GET) → politely
    * scheduled ranged fetch ([[graft.sources.Warc.fetchScheduled]])
    * → extracted documents. Crawl discovery and crawl I/O, composed.
    *
    * Fixture shape (reusing the staged polite-fetch archive), with a
    * SITEMAP-INDEX LAYER in front since round 17
    * ([[graft.operators.Frontier.expandSitemaps]], maxDepth = 2):
    * each host publishes ONE primary index (`sitemap.xml`) listing
    * per-doc segment sitemaps for `%9 ∉ {5, 7}` docs plus `loop.xml`
    * (an index that lists the primary back — a CYCLE the seen-SURT
    * discipline must fetch exactly once) and `deep1.xml`, an index
    * chain `deep1 → {deep_ok (urlset of the host's %9==5 doc URLs),
    * deep2 → deep_far (urlset of %9==7 doc URLs)}` — so `%9==5` docs
    * are reachable ONLY at nested depth 2 (exactly the cap: they must
    * appear) and `%9==7` docs only at depth 3 (beyond the cap: they
    * must NOT, though their captures exist). Segment bodies for
    * `%9 ∈ {5, 7}` docs sit in the body table UNREFERENCED — never
    * fetched. Seeds from the expanded urlsets are each doc's own URL
    * plus folding case+port variants (`%9==3`) and a shared hub URL
    * (`%9==0`) that has NO capture — it must survive the frontier and
    * then drop at the index join (its whole single-row host
    * disappears, so per-host slot density — and with it the
    * `fetch_seq == slot` politeness pin — holds for everyone else);
    * `%6==0` seeds are already fetched; ids starting `1` are
    * robots-disallowed on the four robots-publishing hosts (the fifth
    * publishes none), with the versioned `graftbot/1.0` group line
    * exercising the round-16 group-value tokenization in composition.
    * The planted `/bad/` dead-letter captures of the shared fixture
    * are NEVER seeded, so the guard here is ZERO dead letters.
    */
  private def frontierFetchQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_polite", d)(
      muxWarcCdxGz(docs, _, multiHost = true, plantBad = true))
    val k = (col("doc_id") % 5).cast("string")
    val id = col("doc_id").cast("string")
    val own = concat(lit("https://s"), k, lit(".graft.test/doc/"), id)
    val variant = concat(lit("https://S"), k, lit(".GRAFT.test:443/doc/"), id)
    val xml = concat(
      lit("<urlset><url><loc>"), own, lit("</loc></url>"),
      when(col("doc_id") % 9 === 3,
        concat(lit("<url><loc>"), variant, lit("</loc></url>")))
        .otherwise(lit("")),
      when(col("doc_id") % 9 === 0,
        lit("<url><loc>https://shared.graft.test/hub</loc></url>"))
        .otherwise(lit("")),
      lit("</urlset>"))
    val nine = col("doc_id") % 9
    val segs = Tables.documents(s, d).select(
      concat(lit("https://s"), k, lit(".graft.test/sm/"), id,
        lit(".xml")).as("sm_url"),
      xml.as("sm_xml"))
    val hosts = Tables.documents(s, d).select(k.as("kk")).distinct()
    def sm(name: String): org.apache.spark.sql.Column =
      concat(lit("https://s"), col("kk"), lit(s".graft.test/$name"))
    def idxOf(names: String*): org.apache.spark.sql.Column = concat(
      lit("<sitemapindex>") +:
        names.map(n => concat(lit("<sitemap><loc>"), sm(n),
          lit("</loc></sitemap>"))) :+
        lit("</sitemapindex>"): _*)
    // per-host aggregated bodies (sort_array keeps them deterministic)
    def urlsetOf(pred: org.apache.spark.sql.Column): DataFrame = Tables.documents(s, d)
      .filter(pred).groupBy(k.as("kk"))
      .agg(concat_ws("", sort_array(collect_list(
        concat(lit("<url><loc>"), own, lit("</loc></url>"))))).as("ls"))
    val segLocs = Tables.documents(s, d)
      .filter(nine =!= 5 && nine =!= 7).groupBy(k.as("kk"))
      .agg(concat_ws("", sort_array(collect_list(
        concat(lit("<sitemap><loc>https://s"), k, lit(".graft.test/sm/"),
          id, lit(".xml</loc></sitemap>"))))).as("ls"))
    def bodyFrame(name: String, body: org.apache.spark.sql.Column): DataFrame =
      hosts.select(sm(name).as("sm_url"), body.as("sm_xml"))
    def joined(agg: DataFrame) = hosts.join(agg, Seq("kk"), "left")
      .select(col("kk"), coalesce(col("ls"), lit("")).as("ls"))
    val primary = joined(segLocs).select(sm("sitemap.xml").as("sm_url"),
      concat(lit("<sitemapindex>"), col("ls"),
        lit("<sitemap><loc>"), sm("loop.xml"), lit("</loc></sitemap>"),
        lit("<sitemap><loc>"), sm("deep1.xml"), lit("</loc></sitemap>"),
        lit("</sitemapindex>")).as("sm_xml"))
    val loop = bodyFrame("loop.xml", idxOf("sitemap.xml"))
    val deep1 = bodyFrame("deep1.xml", idxOf("deep_ok.xml", "deep2.xml"))
    val deep2 = bodyFrame("deep2.xml", idxOf("deep_far.xml"))
    val deepOk = joined(urlsetOf(nine === 5))
      .select(sm("deep_ok.xml").as("sm_url"),
        concat(lit("<urlset>"), col("ls"), lit("</urlset>")).as("sm_xml"))
    val deepFar = joined(urlsetOf(nine === 7))
      .select(sm("deep_far.xml").as("sm_url"),
        concat(lit("<urlset>"), col("ls"), lit("</urlset>")).as("sm_xml"))
    // the 7-branch body build (3 per-host aggregations) is FIXTURE,
    // not engine — staged once per (key, sf) like the archive muxes,
    // so warm runs read one parquet table
    val bodiesDir = stagedDir("graft_sitemap_bodies", d) { out =>
      segs.union(primary).union(loop).union(deep1)
        .union(deep2).union(deepOk).union(deepFar)
        .write.parquet(out + "/bodies")
    }
    val bodies = s.read.parquet(bodiesDir + "/bodies")
    val roots = hosts.select(sm("sitemap.xml").as("url"))
    val seeds = graft.operators.Frontier.expandSitemaps(
      roots, "url", bodies, "sm_url", "sm_xml", maxDepth = 2)
      .select("url")
    val fetchedState = Tables.documents(s, d)
      .filter(col("doc_id") % 6 === 0)
      .select(graft.operators.Urls.surt(own).as("surt"))
    val robots = Seq(
      ("s0.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 0.5\n\n" +
          "User-agent: *\nDisallow: /\n"),
      ("s1.graft.test",
        "User-agent: graftbot/1.0\nDisallow: /doc/1\nCrawl-delay: 1\n"),
      ("s2.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 1.5\n"),
      ("s3.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val frontier = graft.operators.Frontier.build(
      seeds, "url", fetchedState, "surt", robots, "host", "body",
      "graftbot/1.0")
    val (cdx, _) = graft.sources.Cdx.readWithRejects(s, dir + "/*.cdx")
    val plan = graft.sources.Cdx.fetchPlan(cdx)
      .select(graft.operators.Urls.surt(col("url")).as("__psurt"),
        col("warc_file"), col("offset"), col("length"))
    val resolved = graft.operators.Materialize(
      frontier.join(plan, frontier("surt") === plan("__psurt"))
        .select("warc_file", "offset", "length", "host", "slot",
          "not_before_s"))
    try {
      val (recs, rejects) =
        graft.sources.Warc.fetchScheduled(s, resolved, baseDir = dir)
      val guard = rejects.agg(count(lit(1)).as("__nrej"))
        .filter(assert_true(col("__nrej") === 0L,
          concat(lit("q_frontier_fetch: "), col("__nrej").cast("string"),
            lit(" dead letters on frontier-resolved ranges"))).isNull)
        .select(lit(1).as("__g"))
      graft.sources.Warc.httpParts(
          recs.filter(col("warc_type") === "response"))
        .filter(col("http_status") === 200)
        .join(guard)
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("host"), col("slot"), col("not_before_s"), col("fetch_seq"),
          length(graft.operators.TextAnalysis.stripHtml(col("http_body")))
            .cast("long").as("n_chars"))
    } finally graft.operators.Materialize.release(resolved)
  }

  /** STREAMING FRONTIER ([[graft.streaming.FrontierStream]], round
    * 17): the crawl loop CYCLING inside one driven stream — seed URLs
    * replay in two micro-batches; each batch anti-joins the
    * persistent seen-SURT state (pre-seeded with the `%6==0` crawled
    * set under `batch_id=-1`), robots-gates, schedules politely,
    * resolves against the capture index, fetches in per-host slot
    * order, and commits records + newly-scheduled SURTs — discovery
    * in batch N is fetched IN batch N.
    *
    * The two ticks plant the verdict's failure modes: batch 1 RE-SENDS
    * every `%4==0` even doc's URL (a cross-batch duplicate — the
    * state anti-join must drop it or it lands twice AND shifts batch
    * 1's slots), and the robots-disallowed ids-starting-`1` arrive
    * ONLY mid-stream in batch 1 (gated on the four robots-publishing
    * hosts; host s4 publishes none, so ITS `1…` ids must fetch — in
    * batch 1). Output pins per-batch politeness layout (`slot`,
    * `not_before_s`) and the `fetch_seq == slot` contract row by row.
    */
  private def streamFrontierQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_polite", d)(
      muxWarcCdxGz(docs, _, multiHost = true, plantBad = true))
    val k = (col("doc_id") % 5).cast("string")
    val id = col("doc_id").cast("string")
    val own = concat(lit("https://s"), k, lit(".graft.test/doc/"), id)
    val robots = Seq(
      ("s0.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 0.5\n\n" +
          "User-agent: *\nDisallow: /\n"),
      ("s1.graft.test",
        "User-agent: graftbot/1.0\nDisallow: /doc/1\nCrawl-delay: 1\n"),
      ("s2.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 1.5\n"),
      ("s3.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val (cdx, _) = graft.sources.Cdx.readWithRejects(s, dir + "/*.cdx")
    val plan = graft.operators.Materialize(graft.sources.Cdx.fetchPlan(cdx)
      .select(graft.operators.Urls.surt(col("url")).as("__psurt"),
        col("warc_file"), col("offset"), col("length")))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_sfr_state")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_sfr_recs")
    graft.streaming.FrontierStream.seedSeen(
      docs.filter(col("doc_id") % 6 === 0)
        .select(graft.operators.Urls.surt(own).as("surt")),
      "surt", stateDir)
    val notOne = substring(id, 1, 1) =!= "1"
    val tick1 = docs.filter(col("doc_id") % 2 === 0 && notOne)
      .select(own.as("url"))
    val tick2 = docs.filter(col("doc_id") % 2 =!= 0 || !notOne)
      .select(own.as("url"))
      .union(docs.filter(col("doc_id") % 4 === 0 && notOne)
        .select(own.as("url"))) // cross-batch duplicates
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, s.conf.get("spark.graft.streaming.shufflePartitions", "8"))
    val replay = new graft.streaming.FileReplay(s, tick1.schema)
    replay.add(tick1)
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = graft.streaming.FrontierStream.stream(
        replay.stream, "url", stateDir, recsDir,
        robots, "host", "body", "graftbot/1.0", plan, dir,
        graft.streaming.Scratch.ckptDir())
      q.processAllAvailable()
      replay.add(tick2)
      q.processAllAvailable()
    } finally {
      if (q != null) q.stop()
      s.conf.set(key, old)
      graft.operators.Materialize.release(plan)
    }
    graft.streaming.FrontierStream.readFetched(s, recsDir)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("host"), col("batch_id"), col("slot"), col("not_before_s"),
        col("fetch_seq"))
  }

  /** THE CLOSED CRAWL LOOP (round 18 — the r17 verdict's top missing
    * item): fetch → link-extract → frontier, SELF-CYCLING — each
    * batch's fetched pages' own `href`s ([[graft.operators.Frontier
    * .discoveredLinks]], resolved absolute against each page's base
    * URI via [[graft.operators.Urls.resolve]]) feed back as the next
    * micro-batch's seeds ([[graft.streaming.FrontierStream.stream]]'s
    * `selfFeed`), so ONE `processAllAvailable` drains the whole
    * reachable closure and a page's `batch_id` IS its BFS depth from
    * the external seeds.
    *
    * Fixture ([[loopLinkTrailer]]): depth is `(doc_id/5) % 4` by
    * construction — relative `../doc/<id+5>` links carry depths 0→1→2
    * (resolution against the page's own host), one absolute
    * cross-host hop carries 2→3, depth-3 pages link only junk
    * (mailto/fragment/javascript — dropped by resolution), and every
    * page carries the shell's capture-less `ex.com` href (a scheduled
    * ghost that must not affect landings). Robots gate ids starting
    * `1` on the four publishing hosts, so a gated page's whole
    * downstream chain must stay un-crawled — the oracle is the closed
    * form of the allowed-ancestor-chain conjunctions per depth, with
    * per-(host, batch) politeness layout and the `fetch_seq == slot`
    * pin.
    */
  private def streamCrawlLoopQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_loop", d)(
      muxWarcCdxGz(docs, _, multiHost = true, plantLinks = true))
    val k = (col("doc_id") % 5).cast("string")
    val id = col("doc_id").cast("string")
    val own = concat(lit("https://s"), k, lit(".graft.test/doc/"), id)
    val robots = Seq(
      ("s0.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 0.5\n\n" +
          "User-agent: *\nDisallow: /\n"),
      ("s1.graft.test",
        "User-agent: graftbot/1.0\nDisallow: /doc/1\nCrawl-delay: 1\n"),
      ("s2.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 1.5\n"),
      ("s3.graft.test",
        "User-agent: graftbot\nDisallow: /doc/1\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val (cdx, _) = graft.sources.Cdx.readWithRejects(s, dir + "/*.cdx")
    val plan = graft.operators.Materialize(graft.sources.Cdx.fetchPlan(cdx)
      .select(graft.operators.Urls.surt(col("url")).as("__psurt"),
        col("warc_file"), col("offset"), col("length")))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_scl_state")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_scl_recs")
    val seeds = docs.filter(floor(col("doc_id") / 5) % 4 === 0)
      .select(own.as("url"))
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, s.conf.get("spark.graft.streaming.shufflePartitions", "8"))
    val replay = new graft.streaming.FileReplay(s, seeds.schema)
    replay.add(seeds)
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = graft.streaming.FrontierStream.stream(
        replay.stream, "url", stateDir, recsDir,
        robots, "host", "body", "graftbot/1.0", plan, dir,
        graft.streaming.Scratch.ckptDir(), selfFeed = Some(replay))
      q.processAllAvailable() // the WHOLE cascade: seeds + discoveries
    } finally {
      if (q != null) q.stop()
      s.conf.set(key, old)
      graft.operators.Materialize.release(plan)
    }
    graft.streaming.FrontierStream.readFetched(s, recsDir)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("host"), col("batch_id"), col("slot"), col("not_before_s"),
        col("fetch_seq"))
  }

  /** RE-CRAWL FRESHNESS POLICY (round 18 — the r17 verdict's task 3):
    * the seen-SURT state's scheduled-RECENTLY semantics driven over
    * two ticks against sitemap seeds WITH `<lastmod>`
    * ([[graft.operators.Frontier.sitemapPageEntries]]). Batch 0
    * schedules the even docs under per-doc lastmods; batch 1 re-sends
    * EVERY doc under a fresh sitemap generation (lastmod `…-05`) with
    * `recrawlAfterBatches = 1`:
    *
    *  - `%4 == 1` docs sit in PRE-CRAWL state (`batch_id = -1`, age 2
    *    > ttl) — STALE, re-fetched;
    *  - even docs whose batch-0 lastmod was `…-02` (`%8 == 0`) are
    *    live but the new sitemap declares NEWER — re-fetched early;
    *  - even docs with batch-0 lastmod `…-06` are live and newer than
    *    the seed — blocked;
    *  - `%4 == 3` docs were never seen — plain new discoveries.
    *
    * Output pins per-(host, batch) politeness layout over both ticks.
    */
  private def frontierRecrawlQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val dir = stagedDir("graft_cdx_polite", d)(
      muxWarcCdxGz(docs, _, multiHost = true, plantBad = true))
    val k = (col("doc_id") % 5).cast("string")
    val id = col("doc_id").cast("string")
    val own = concat(lit("https://s"), k, lit(".graft.test/doc/"), id)
    val open = Seq(
      ("s0.graft.test", "User-agent: graftbot\nCrawl-delay: 0.5\n"),
      ("s1.graft.test", "User-agent: graftbot\nCrawl-delay: 1\n"),
      ("s2.graft.test", "User-agent: graftbot\nCrawl-delay: 1.5\n"),
      ("s3.graft.test", "User-agent: graftbot\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val (cdx, _) = graft.sources.Cdx.readWithRejects(s, dir + "/*.cdx")
    val plan = graft.operators.Materialize(graft.sources.Cdx.fetchPlan(cdx)
      .select(graft.operators.Urls.surt(col("url")).as("__psurt"),
        col("warc_file"), col("offset"), col("length")))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_frc_state")
    val recsDir = graft.streaming.Scratch.tmpDir("graft_frc_recs")
    // pre-crawl state: %4==1 docs, scheduled long ago (batch -1)
    graft.streaming.FrontierStream.seedSeen(
      docs.filter(col("doc_id") % 4 === 1)
        .select(graft.operators.Urls.surt(own).as("surt"),
          lit("2026-01-01").as("lm")),
      "surt", stateDir, lastmodCol = "lm")
    // sitemap generation 0: even docs, lastmod -02 (%8==0) / -06 (rest)
    def sitemapSeeds(gen0: Boolean): DataFrame = {
      val base = if (gen0) docs.filter(col("doc_id") % 2 === 0) else docs
      val lm = if (gen0)
        when(col("doc_id") % 8 === 0, lit("2026-01-02"))
          .otherwise(lit("2026-01-06"))
      else lit("2026-01-05")
      base.select(concat(lit("<urlset><url><loc>"), own,
          lit("</loc><lastmod>"), lm, lit("</lastmod></url></urlset>"))
          .as("xml"))
        .select(explode(
          graft.operators.Frontier.sitemapPageEntries(col("xml"))).as("e"))
        .select(col("e.loc").as("url"), col("e.lastmod").as("lm"))
    }
    try {
      graft.streaming.FrontierStream.frontierBatch(
        sitemapSeeds(gen0 = true), "url", 0L, stateDir, recsDir,
        open, "host", "body", "graftbot", plan, dir,
        recrawlAfterBatches = 1L, lastmodCol = "lm")
      graft.streaming.FrontierStream.frontierBatch(
        sitemapSeeds(gen0 = false), "url", 1L, stateDir, recsDir,
        open, "host", "body", "graftbot", plan, dir,
        recrawlAfterBatches = 1L, lastmodCol = "lm")
    } finally graft.operators.Materialize.release(plan)
    graft.streaming.FrontierStream.readFetched(s, recsDir)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("host"), col("batch_id"), col("slot"), col("not_before_s"),
        col("fetch_seq"))
  }

  /** robots.txt compliance decisions ([[graft.operators.Robots]]):
    * five hosts, four with deterministic robots bodies — hosts 0–2
    * carry a `graftbot` group (Disallow `/p<k>/`, longer literal
    * Allow `/p<k>/doc/1`, a `*`-interior Disallow — pattern
    * `"/p" * "/doc/" * "7" *` — that OUT-SCORES the literal Allow on
    * raw pattern octets, and a `$`-anchored Allow — `… "77" $` —
    * that out-scores the wildcard Disallow) plus an `aftbot/1.0`
    * containment-trap group (a
    * substring of the full agent string, NOT a prefix of the product
    * token — it must never bind) and an irrelevant `*` group; host 3
    * has NO matching agent group so the `*` fallback governs
    * (Disallow `/p1/` with `$`-anchored Allow carve-outs for ids
    * ending `33` and for id 13 exactly); host 4 publishes no robots
    * at all (allowed). The oracle is the CLOSED FORM of those rules
    * over each doc's URL (the image/audio closed-form-oracle
    * discipline) — the parser itself is spec-pinned in `RobotsSpec`.
    */
  private def robotsFilterQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val k = (col("doc_id") % 5).cast("string")
    val p = (col("doc_id") % 4).cast("string")
    val url = concat(lit("https://s"), k, lit(".graft.test/p"), p,
      lit("/doc/"), col("doc_id").cast("string"))
    val robots = (0 until 4).map { kk =>
      val body =
        if (kk < 3)
          s"# graft robots\nUser-agent: aftbot/1.0\nDisallow: /\n\n" +
            s"User-agent: graftbot\nDisallow: /p$kk/\n" +
            s"Allow: /p$kk/doc/1\nDisallow: /p*/doc/*7*\n" +
            s"Allow: /p*/doc/*77$$\n\nUser-agent: *\nDisallow: /tmp/\n"
        else
          "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\nDisallow: /p1/\n" +
            "Allow: /p1/doc/*33$\nAllow: /p1/doc/13$\n"
      (s"s$kk.graft.test", body)
    }.toDF("host", "body")
    val rules = robots.select(col("host"),
      graft.operators.Robots.rulesFor(col("body"), "graftbot/1.0").as("__rules"))
    val path = regexp_extract(col("url"),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    Tables.documents(s, d).select(col("doc_id"), url.as("url"))
      .join(broadcast(rules),
        graft.operators.Urls.host(col("url")) === col("host"), "left")
      .select(col("doc_id"), col("url"),
        graft.operators.Robots.isAllowed(col("__rules"), path)
          .cast("int").as("allowed"))
  }

  /** Deterministic 90/10 train/validation split. */
  private def trainSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      when(TextAnalysis.splitBucket(col("doc_id")) < 90, "train")
        .otherwise("valid").as("split"))

  /** End-to-end dedup: docs in → near-dup-free docs out
    * (deterministic keeper = component min id; oracle =
    * [[Dedup.minhashCandDuckCtes]] + recursive-CTE CC).
    */
  private def dedupDocs(s: SparkSession, d: String): DataFrame =
    Dedup.dropNearDuplicates(Tables.documents(s, d), "doc_id", "text")
      .select("doc_id", "lang", "source", "n_chars")

  /** [[dedupDocs]] in hub-STAR candidate mode (round 12 — the
    * dup-heavy-corpus form, 19× measured at 300×-dupes): each LSH
    * bucket verifies members against its min-id hub only. The oracle
    * replays the EXACT star semantics ([[Dedup.starPairsDuckCtes]]
    * over the shared signature chain), so the recall-bounded pair
    * subset is itself hash-checked — not merely spec-asserted equal
    * on cliques.
    */
  private def dedupDocsStar(s: SparkSession, d: String): DataFrame =
    Dedup.dropNearDuplicates(Tables.documents(s, d), "doc_id", "text",
      star = true)
      .select("doc_id", "lang", "source", "n_chars")

  /** Quality-ranked dedup ([[Dedup.dropNearDuplicatesBy]]): same
    * near-dup components as `q_dedup_docs`, but each component keeps
    * its LONGEST member (ties to the smaller id) — the keeper policy
    * production corpus dedup wants. Oracle: the CC CTEs plus a
    * max-quality-then-min-id keeper selection.
    */
  private def dedupBest(s: SparkSession, d: String): DataFrame =
    Dedup.dropNearDuplicatesBy(
        Tables.documents(s, d), "doc_id", "text",
        keepBy = length(col("text")))
      .select("doc_id", "lang", "source", "n_chars")

  /** The streaming near-dup gate replayed over the documents table in
    * two deterministic micro-batches (doc_id parity): first-wins
    * across batches, chain collapse within — table-backed state, the
    * same signature math as `q_dedup_docs`. Oracle:
    * [[Dedup.gateReplayDuckCtes]] — the two-batch greedy replay in
    * SQL over the `mh_pairs` candidate CTE.
    * Runs the default accepted-only state (state ∝ kept corpus — the
    * production trade at stream scale); `exact = true` persists
    * keeper-tagged rejected signatures instead, making acceptance
    * equal batch CC (pinned in `NearDupGateSpec`).
    */
  private def streamNeardup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_ndgate_state")
    val a0 = graft.streaming.NearDupGate.acceptBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "text", stateDir)
    // acceptBatch commits batch-0 state eagerly (its write is an
    // action), so batch 1 sees it through the table, not lineage.
    val a1 = graft.streaming.NearDupGate.acceptBatch(
      docs.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "text", stateDir)
    a0.union(a1).select("doc_id")
  }

  /** [[streamNeardup]] with the intra-batch candidates in hub-STAR
    * mode (`starIntra = true` — the dup-heavy-corpus mitigation, 19×
    * measured at 300×-dupes): each micro-batch verifies bucket
    * members against the batch's own min-id hub only, while the
    * cross-history state match stays the full bucket join. Oracle:
    * [[Dedup.starPairsParityDuckCtes]] (per-batch hubs — the batch's
    * min id per bucket, NOT the corpus hub filtered by parity)
    * feeding [[Dedup.gateReplayDuckCtes]]'s intra-pair overrides, so
    * the scale path's recall-bounded acceptance set is itself
    * hash-checked, not merely spec-asserted equal on cliques.
    */
  private def streamNeardupStar(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_ndgate_star_state")
    val a0 = graft.streaming.NearDupGate.acceptBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "text", stateDir,
      starIntra = true)
    val a1 = graft.streaming.NearDupGate.acceptBatch(
      docs.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "text", stateDir,
      starIntra = true)
    a0.union(a1).select("doc_id")
  }

  /** The composed curation pipeline as ONE driven stream
    * ([[graft.streaming.StreamCurate]] — the streaming twin of
    * `q_curate`): quality gate → near-dup gate → per-language
    * 5000-token budget → 90/10 split, over the documents table in two
    * parity micro-batches through the REAL `writeStream` path
    * (file-source replay → foreachBatch → partitioned accepted table).
    * Oracle: the stage twins composed per batch — the quality-gated
    * universe roots [[Dedup.minhashCandDuckCtes]] +
    * [[Dedup.gateReplayDuckCtes]], whose per-batch accepted sets
    * drive the `q_stream_token_budget` window pair, then the split
    * CASE. Stage exactness composes into pipeline exactness, exactly
    * as in the batch `q_curate`.
    */
  private def streamCurateQ(s: SparkSession, d: String): DataFrame =
    streamCurateImpl(s, d, exact = false)

  /** [[streamCurateQ]] with the near-dup stage in EXACT mode:
    * keeper-tagged rejected signatures persist, so a later doc
    * matching only a rejected doc still resolves transitively to its
    * accepted keeper (`q_stream_neardup_exact`'s trade, composed
    * through the whole pipeline). Its own oracle: the same composed
    * SQL with [[Dedup.gateReplayDuckCtes]]`(exact = true)`.
    */
  private def streamCurateExactQ(s: SparkSession, d: String): DataFrame =
    streamCurateImpl(s, d, exact = true)

  /** The composed two-parity-batch oracle for both curate streams:
    * quality-gated universe → [[Dedup.minhashCandDuckCtes]] →
    * [[Dedup.gateReplayDuckCtes]] (default or exact state mode) →
    * the `q_stream_token_budget` window pair → the split CASE.
    */
  private def streamCurateOracle(exact: Boolean): String = {
    val toks = duckToks("text")
    s"""WITH RECURSIVE sc_gated AS (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM documents d JOIN ($qualityGateSql) qg
       |    ON qg.doc_id = d.doc_id AND qg.pass = 1),
       |${Dedup.minhashCandDuckCtes(toks, table = "sc_gated")},
       |${Dedup.gateReplayDuckCtes("mh_pairs", exact = exact, table = "sc_gated")},
       |sc_t AS (
       |  SELECT g.doc_id, g.lang, CAST(len($toks) AS BIGINT) AS n_tokens,
       |    ((g.doc_id % 2147483647) * 2654435761) % 2147483647 AS h
       |  FROM sc_gated g),
       |sc_b0 AS (
       |  SELECT t.doc_id, t.lang, t.n_tokens,
       |    sum(t.n_tokens) OVER (PARTITION BY t.lang ORDER BY t.h, t.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM sc_t t JOIN g_acc0 a ON a.doc_id = t.doc_id),
       |sc_a0 AS (
       |  SELECT doc_id, lang, n_tokens FROM sc_b0
       |  WHERE cum - n_tokens < 5000),
       |sc_sp0 AS (
       |  SELECT lang, sum(n_tokens) AS spent FROM sc_a0 GROUP BY 1),
       |sc_b1 AS (
       |  SELECT t.doc_id, t.lang, t.n_tokens,
       |    COALESCE(s.spent, 0)
       |      + sum(t.n_tokens) OVER (PARTITION BY t.lang
       |          ORDER BY t.h, t.doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtot
       |  FROM sc_t t JOIN g_acc1 a ON a.doc_id = t.doc_id
       |  LEFT JOIN sc_sp0 s ON s.lang = t.lang),
       |sc_a1 AS (
       |  SELECT doc_id, lang, n_tokens FROM sc_b1
       |  WHERE cumtot - n_tokens < 5000),
       |sc_all AS (
       |  SELECT doc_id, lang, n_tokens FROM sc_a0
       |  UNION ALL
       |  SELECT doc_id, lang, n_tokens FROM sc_a1)
       |SELECT doc_id, lang, n_tokens,
       |  CASE WHEN (((doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
       |       THEN 'train' ELSE 'valid' END AS split
       |FROM sc_all""".stripMargin
  }

  /** Replay harness core for the streaming curation queries: the
    * documents table replays in two parity micro-batches through a
    * FILE-SOURCE stream ([[graft.streaming.FileReplay]]) — each batch
    * is a distributed parquet write into the temp source dir, so no
    * corpus row ever materializes on the driver (round 12; the
    * earlier MemoryStream fixture collected the whole table and was
    * heap-bound at the 100×-docs probes).
    */
  private def streamCurateImpl(
      s: SparkSession, d: String, exact: Boolean): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
    def tmp(tag: String) =
      graft.streaming.Scratch.tmpDir(s"graft_scur_$tag")
    val (nd, bud, acc) = (tmp("nd"), tmp("budget"), tmp("acc"))
    val ckp = graft.streaming.Scratch.ckptDir("graft_scur_ckpt")
    val replay = new graft.streaming.FileReplay(s, docs.schema)
    // Micro-batch jobs inside foreachBatch inherit the session's
    // shuffle partitioning WITHOUT AQE coalescing (the frame descends
    // from a streaming plan), so size them to batch volume like the
    // replay harness does — same knob, same restore discipline.
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, s.conf.get("spark.graft.streaming.shufflePartitions", "8"))
    try {
      replay.add(docs.filter(col("doc_id") % 2 === 0))
      val q = graft.streaming.StreamCurate.gate(
        replay.stream,
        "doc_id", "text", "lang", nd, bud, acc, ckp,
        budgetPerLang = 5000L, validPct = 10, exact = exact)
      try {
        q.processAllAvailable()
        replay.add(docs.filter(col("doc_id") % 2 =!= 0))
        q.processAllAvailable()
      } finally q.stop()
    } finally s.conf.set(key, old)
    // Explicit schema: a replay whose gates accept NOTHING (legal —
    // e.g. a corpus the quality rules reject wholesale) leaves no
    // parquet footer to infer from, and the empty result must still
    // be a typed frame, not an inference crash.
    import org.apache.spark.sql.types._
    s.read.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_tokens", LongType), StructField("split", StringType))))
      .parquet(acc)
      .select("doc_id", "lang", "n_tokens", "split")
  }

  /** [[streamNeardup]] in EXACT mode: keeper-tagged rejected
    * signatures persist too, so acceptance equals batch connected
    * components (pinned in `NearDupGateSpec`) at the price of state ∝
    * corpus instead of ∝ kept corpus. Benched alongside the default
    * so the extra state write's cost is visible (round-8 verdict
    * task).
    */
  private def streamNeardupExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_ndgate_exact_state")
    val a0 = graft.streaming.NearDupGate.acceptBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "text", stateDir,
      exact = true)
    val a1 = graft.streaming.NearDupGate.acceptBatch(
      docs.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "text", stateDir,
      exact = true)
    a0.union(a1).select("doc_id")
  }

  /** The 64-bit-signature streaming gate ([[graft.streaming
    * .Hamming64Gate]] — the SimHash/image/audio sibling of
    * `q_stream_neardup`, same SigGate core) replayed over the
    * documents table in two parity micro-batches on text SimHash
    * signatures. Oracle: [[Dedup.gateReplayDuckCtes]] over the
    * `sh_pairs` candidate CTE.
    */
  private def streamSimhashGate(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_h64gate_state")
    val a0 = graft.streaming.Hamming64Gate.acceptBatch(
      sigs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "sig", stateDir)
    val a1 = graft.streaming.Hamming64Gate.acceptBatch(
      sigs.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "sig", stateDir)
    a0.union(a1).select("doc_id")
  }

  /** [[streamSimhashGate]] with hub-STAR intra candidates
    * (round 13 — the 64-bit gate family's dup-heavy form now in the
    * hard gate alongside `q_stream_neardup_star`):
    * [[graft.streaming.Hamming64Gate.acceptBatch]]`(starIntra =
    * true)` over the two parity batches, oracle =
    * [[Dedup.starHamming64ParityDuckCtes]] (per-batch hubs over the
    * shared `sh_banded` chain) composed into the gate replay's
    * intra-pair overrides.
    */
  private def streamSimhashGateStar(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_h64gate_star_state")
    val a0 = graft.streaming.Hamming64Gate.acceptBatch(
      sigs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "sig", stateDir,
      starIntra = true)
    val a1 = graft.streaming.Hamming64Gate.acceptBatch(
      sigs.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "sig", stateDir,
      starIntra = true)
    a0.union(a1).select("doc_id")
  }

  // Synthetic-but-fixed 64-dim model: the Spark plan and the DuckDB
  // oracle inline the SAME vector from this one definition.
  private val linWeights: Seq[Double] =
    (0 until 64).map(i => ((i * 37) % 21 - 10) / 10.0)

  /** FastText-style hashed linear classifier inference
    * ([[Classifier.withLinearScore]]): hashing-trick features from
    * md5 hex (engine-portable), one sequential weight fold per doc —
    * map-only quality-filter scoring, oracle-checked bit-exactly.
    */
  private def linScoreQ(s: SparkSession, d: String): DataFrame =
    Classifier.withLinearScore(
        Tables.documents(s, d).select("doc_id", "text"),
        "text", linWeights, intercept = 0.25)
      .select("doc_id", "lin_score")

  /** Gate-calibration sweep ([[Classifier.thresholdSweep]]): the
    * hashed linear score against the declared-English label, one
    * confusion row per 0.001-wide score bucket — the table read
    * before choosing a [[Classifier.gate]] cutoff. Exact integer
    * counts; the oracle replays the SAME score expression and the
    * cumulative sums in SQL.
    */
  private def scoreSweepQ(s: SparkSession, d: String): DataFrame =
    Classifier.thresholdSweep(
      Classifier.withLinearScore(
          Tables.documents(s, d).select("doc_id", "text", "lang"),
          "text", linWeights, intercept = 0.25)
        .withColumn("is_en", col("lang") === "en"),
      "lin_score", "is_en")

  /** TRAINED quality/LID filter, the training half (round 16 —
    * [[Classifier.perceptronTrain]]): a fixed-3-iteration batch
    * perceptron learns an is-English classifier over hashed
    * bag-of-words features from the corpus's own `lang` labels — the
    * CCNet/fastText-LID story run INSIDE the engine, integer-exact so
    * the whole training trajectory replays in SQL
    * ([[Classifier.perceptronDuckCtes]]). Output: the dense
    * (feature, weight) table, bias at feature `dim`.
    */
  private val perceptronDim = 64
  private val perceptronIters = 3

  private def perceptronTrainQ(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val w = Classifier.perceptronTrain(
      Tables.documents(s, d).select("text", "lang"),
      "text", col("lang") === "en", perceptronDim, perceptronIters)
    w.zipWithIndex.map { case (wt, f) => (f, wt) }.toSeq
      .toDF("feature", "weight")
  }

  /** The composed TRAIN → GATE loop ([[Classifier.perceptronScore]]):
    * the weights [[perceptronTrainQ]] just learned score every
    * document map-only (weights ride as an array literal — the
    * serving path), and the gate keeps predicted-English. End-to-end
    * reproducible: the oracle replays training AND serving in one
    * statement.
    */
  private def perceptronGateQ(s: SparkSession, d: String): DataFrame = {
    val w = Classifier.perceptronTrain(
      Tables.documents(s, d).select("text", "lang"),
      "text", col("lang") === "en", perceptronDim, perceptronIters)
    Tables.documents(s, d).select(col("doc_id"),
        Classifier.perceptronScore(col("text"), w).as("score"))
      .withColumn("kept", col("score") > 0L)
  }

  /** AVERAGED perceptron TRAIN → GATE
    * ([[Classifier.perceptronTrainAvg]], round 17): identical
    * training trajectory to [[perceptronGateQ]], but serving from the
    * SUMMED per-iteration weight vectors — the Freund–Schapire
    * averaged perceptron held in ℤ (the ×T scaling never leaves
    * integers and cannot move sign or argmax). On non-separable data
    * the final iteration is arbitrary; the average is the robust
    * serve (spec-pinned on a planted non-separable corpus). The
    * oracle replays training AND the trajectory sum in one statement.
    */
  private def perceptronAvgQ(s: SparkSession, d: String): DataFrame = {
    val w = Classifier.perceptronTrainAvg(
      Tables.documents(s, d).select("text", "lang"),
      "text", col("lang") === "en", perceptronDim, perceptronIters)
    Tables.documents(s, d).select(col("doc_id"),
        Classifier.perceptronScore(col("text"), w).as("score"))
      .withColumn("kept", col("score") > 0L)
  }

  /** MULTI-CLASS LangID, trained and served in-engine
    * ([[Classifier.perceptronTrainOvr]], round 16): five one-vs-rest
    * integer perceptrons learn the corpus's `lang` labels
    * simultaneously (one map-only scoring pass + one gradient
    * aggregate per iteration for ALL classes), then every document is
    * classified by argmax score (ties → earlier class). The
    * fastText-LID shape end to end, bit-exactly SQL-replayable.
    */
  private val langidClasses = Seq("de", "en", "es", "fr", "zh")

  private def perceptronLangidQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text", "lang")
    val w = Classifier.perceptronTrainOvr(
      docs, "text", "lang", langidClasses, perceptronDim, perceptronIters)
    docs
      // staged ONCE: the argmax struct is a K-fold scoring pass, and
      // CollapseProject keeps non-cheap multi-referenced aliases staged
      .withColumn("__p", Classifier.perceptronPredictOvr(
        col("text"), langidClasses, w))
      .select(col("doc_id"),
        col("__p.cls").as("lang_pred"),
        col("__p.s").as("score"),
        (col("__p.cls") === col("lang")).as("correct"))
  }

  /** Shared oracle prelude for the perceptron pair: the labeled
    * token-list CTE + the unrolled training rounds. */
  private def perceptronOracleCtes: String =
    s"""pt_docs AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |    ${TextAnalysis.tokensDuckSql("coalesce(text, '')")} AS toks
       |  FROM documents),
       |${Classifier.perceptronDuckCtes(perceptronDim, perceptronIters)}""".stripMargin

  /** Per-language token budget ([[graft.operators.Sampling
    * .tokenBudgetPerGroup]]): each language keeps documents in
    * deterministic hash order until 5 000 tokens are spent — mixture
    * provisioning in the unit that matters for training mass.
    */
  private def tokenBudgetQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Sampling.tokenBudgetPerGroup(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
      "lang", "doc_id", "n_tokens", budget = 5000L)

  /** The composed curation pipeline ([[graft.operators.Curation]]):
    * quality gate → MinHash near-dup dedup → 5000-token/lang budget →
    * 90/10 split, as ONE plan chain. The oracle is the composition of
    * each stage's existing DuckDB twin (`qualityGateSql` as a nested
    * subquery, [[Dedup.minhashCandDuckCtes]] re-rooted on the gated
    * CTE, [[Dedup.ccDuckCtes]], the `q_token_budget` window sum, the
    * `q_train_split` hash) — stage exactness composes into pipeline
    * exactness.
    */
  private def curateQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Curation.curate(Tables.documents(s, d),
      "doc_id", "text", "lang", budgetPerLang = 5000L, validPct = 10)

  /** Portable-HLL register state
    * ([[Sketches.hllPortableRegisters]]): per-source token sketch
    * registers — the engine-exact mergeable distinct-sketch whose
    * STATE (not just row count) the oracle hash-checks; the
    * Datasketches-backed `q_hll_merge` remains the production
    * default with library-internal registers.
    */
  private def hllRegistersQ(s: SparkSession, d: String): DataFrame =
    Sketches.hllPortableRegisters(
      Tables.documents(s, d).select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok")),
      Seq("source"), col("tok"))

  /** Streaming portable-HLL maintenance
    * ([[graft.streaming.SketchStream.appendPortable]]): the token
    * stream replayed in two parity micro-batches into the batch-id-
    * partitioned register state, then served by max-merge. Exact
    * sketch algebra makes the streamed end state ≡ the one-shot batch
    * registers bit-for-bit, so this query shares `q_hll_registers`'
    * oracle — stream ≡ batch is itself driver-gated.
    */
  private def streamHllRegistersQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"), col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_hllreg_state")
    graft.streaming.SketchStream.appendPortable(
      toks.filter(col("doc_id") % 2 === 0), 0L, stateDir, Seq("source"), col("tok"))
    graft.streaming.SketchStream.appendPortable(
      toks.filter(col("doc_id") % 2 =!= 0), 1L, stateDir, Seq("source"), col("tok"))
    graft.streaming.SketchStream.servePortable(s, stateDir, Seq("source"))
  }

  /** Bigram collocation mining ([[Keywords.bigramLift]]): the top-40
    * adjacent token pairs (≥5 occurrences) by exact rational lift.
    */
  private def bigramLiftQ(s: SparkSession, d: String): DataFrame =
    Keywords.bigramLift(Tables.documents(s, d), "doc_id", "text",
      minCount = 5L, k = 40)

  /** Streaming per-group token-budget gate
    * ([[graft.streaming.BudgetGate]]): the documents replayed in two
    * micro-batches (doc_id even, then odd) through the table-backed
    * spent state at the SAME 5000-token/lang budget as
    * `q_token_budget`. Oracle: per-batch window running sums chained
    * through the spent totals — batch order is part of the gate's
    * declared semantics.
    */
  private def streamTokenBudgetQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val stateDir = graft.streaming.Scratch.tmpDir("graft_budget_state")
    val a0 = graft.streaming.BudgetGate.acceptBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L,
      "lang", "doc_id", "n_tokens", stateDir, budget = 5000L)
    val a1 = graft.streaming.BudgetGate.acceptBatch(
      docs.filter(col("doc_id") % 2 =!= 0), 1L,
      "lang", "doc_id", "n_tokens", stateDir, budget = 5000L)
    a0.union(a1).select("doc_id", "lang", "n_tokens")
  }

  /** Leakage-safe split ([[Dedup.leakageSafeSplit]]): bucket by
    * near-dup component label so planted duplicate pairs land on one
    * side of the 90/10 cut by construction.
    */
  private def leakageSafeSplitQ(s: SparkSession, d: String): DataFrame =
    Dedup.leakageSafeSplit(Tables.documents(s, d), "doc_id", "text")

  /** BM25-hard negative mining ([[Retrieval.hardNegatives]]): for the
    * first ten docs as queries, the top-5 corpus docs under each
    * query's own top-3 TF-IDF keywords, excluding the query — the
    * DPR-style negatives a contrastive retriever trains against.
    */
  private def hardNegativesQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Retrieval.hardNegatives(
      Tables.documents(s, d), "doc_id", "text",
      queryFilter = col("doc_id") < 10, m = 3, k = 5)

  /** Late-interaction MaxSim re-rank ([[Retrieval.maxSimRerank]]):
    * docs 0-7 as queries over the corpus, SimHash-Hamming shortlist
    * of 16, token-level MaxSim top-5. Binary token signatures make
    * every pairwise score `64 − 2·hamming` — integer until the one
    * final division by `64·|q|` — so the oracle replays the entire
    * path (signatures, shortlist ranking, interaction maxima)
    * hash-exactly.
    */
  private def maxsimQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.Retrieval.maxSimRerank(
      docs, "doc_id", "text",
      docs.filter(col("doc_id") < 8), "doc_id", "text",
      shortlist = 16, topK = 5)
  }

  private val maxsimSql = {
    val toks = duckToks("text")
    s"""WITH mx_th AS (
       |  SELECT doc_id,
       |    list_transform($toks, t -> ${TextAnalysis.tokenHash64DuckSql("t")}) AS th
       |  FROM documents),
       |mx_sig AS MATERIALIZED (
       |  SELECT doc_id, CAST(list_sum(list_transform(range(64), j ->
       |    CASE WHEN 2 * coalesce(list_sum(list_transform(th, h ->
       |           (h >> CAST(j AS INTEGER)) & 1)), 0) > len(th)
       |         THEN ${Dedup.pow2Signed64Array}[j + 1] ELSE 0 END)) AS BIGINT) AS sig
       |  FROM mx_th WHERE len(th) > 0),
       |mx_d AS MATERIALIZED (
       |  SELECT doc_id, list_distinct($toks) AS toks FROM documents
       |  WHERE len($toks) > 0),
       |mx_q AS (
       |  SELECT doc_id AS query_id, sig AS qsig FROM mx_sig WHERE doc_id < 8),
       |mx_short AS MATERIALIZED (
       |  SELECT query_id, doc_id FROM (
       |    SELECT q.query_id, d.doc_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY bit_count(xor(d.sig, q.qsig)), d.doc_id) AS r
       |    FROM mx_sig d JOIN mx_q q ON d.doc_id <> q.query_id) t
       |  WHERE r <= 16),
       |mx_dt AS MATERIALIZED (
       |  SELECT doc_id, ${TextAnalysis.tokenHash64DuckSql("u.t")} AS th
       |  FROM mx_d, unnest(toks) AS u(t)),
       |mx_qt AS (
       |  SELECT d.doc_id AS query_id, len(d.toks) AS nq, t.th AS qh
       |  FROM mx_d d JOIN mx_dt t ON t.doc_id = d.doc_id
       |  WHERE d.doc_id < 8),
       |mx_c AS (
       |  SELECT s.query_id, s.doc_id, q.nq, q.qh,
       |    max(64 - 2 * bit_count(xor(d.th, q.qh))) AS m
       |  FROM mx_short s
       |  JOIN mx_dt d ON d.doc_id = s.doc_id
       |  JOIN mx_qt q ON q.query_id = s.query_id
       |  GROUP BY 1, 2, 3, 4),
       |mx_sc AS (
       |  SELECT query_id, doc_id,
       |    ${Det.roundSql(
              "CAST(sum(m) AS DOUBLE) / CAST(64 * nq AS DOUBLE)", 6)} AS maxsim
       |  FROM mx_c GROUP BY query_id, doc_id, nq)
       |SELECT query_id, doc_id, maxsim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY maxsim DESC, doc_id) AS INTEGER) AS rank
       |  FROM mx_sc) t
       |WHERE rank <= 5""".stripMargin
  }

  /** Decontamination over the deterministic 90/10 split: how much of
    * each validation doc's 8-gram mass the train side already
    * contains ([[Dedup.contamination]]). Planted near-dup pairs that
    * straddle the split surface at contamination ≈ 1.
    */
  private def contaminationQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .withColumn("__b", TextAnalysis.splitBucket(col("doc_id")))
    Dedup.contamination(
      base.filter(col("__b") < 90).select("doc_id", "text"),
      base.filter(col("__b") >= 90).select("doc_id", "text"),
      "doc_id", "text", n = 8)
  }

  private val contaminationSql = {
    val toks = duckToks("text")
    val gram8 = (1 to 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    """WITH split AS (
      |  SELECT doc_id,
      |    ((((doc_id % 2147483647) * 2654435761) % 2147483647) % 100) AS b,
      |    TOKS AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, b,
      |    CASE WHEN len(t) < 8 THEN []
      |         ELSE list_distinct(list_transform(range(len(t) - 7), i -> GRAM8))
      |    END AS grams
      |  FROM split),
      |tg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE b < 90),
      |eg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE b >= 90)
      |SELECT eg.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  floor(CAST(sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) * 10000.0 + 0.5) / 10000.0 AS contamination
      |FROM eg LEFT JOIN tg ON eg.gram = tg.gram
      |GROUP BY eg.doc_id""".stripMargin
      .replace("TOKS", toks).replace("GRAM8", gram8)
  }

  /** Exact heavy hitters: tokens above 0.5% of all token
    * occurrences. The token-count aggregate is checkpointed once
    * (vocabulary-sized — bounded relative to the corpus) because
    * BOTH the filter side and the grand total derive from it;
    * without the checkpoint each use re-runs the corpus scan + agg
    * (column pruning makes the two exchanges differ, so
    * ReuseExchange cannot collapse them). The threshold compare
    * `200·n > total` is pure integer arithmetic.
    */
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val counts = graft.operators.Materialize(Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n")))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__tot"))))
      .filter(col("n") * 200 > col("__tot"))
      .select(col("token"), col("n"))
  }

  /** Unigram-LM quality scores ([[LmScore]]): vocabulary trained on
    * the 90% split-bucket slice, every doc scored for OOV rate and
    * mean frequency bits. The (doc, bucket, token) term-frequency
    * pre-aggregate is materialized once because BOTH the vocabulary
    * build and the scoring join derive from it (val sharing does not
    * dedupe plans), and it is what absorbs Zipf head-token skew —
    * each doc contributes at most one row per distinct token to the
    * token-keyed join.
    */
  private def lmScoreQ(s: SparkSession, d: String): DataFrame = {
    val tf = graft.operators.Materialize(Tables.documents(s, d)
      .select(
        col("doc_id"),
        TextAnalysis.splitBucket(col("doc_id")).as("__b"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("__b"), col("token"))
      .agg(count(lit(1)).as("k")))
    val vocab = tf.filter(col("__b") < 90)
      .groupBy("token")
      .agg(sum(col("k")).as("c"))
      .filter(col("c") >= 2)
    LmScore.scoreTf(tf.select("doc_id", "token", "k"), "doc_id", vocab)
  }

  private val lmScoreSql = {
    val toks = duckToks("text")
    s"""WITH split AS (
       |  SELECT doc_id,
       |    ((((doc_id % 2147483647) * 2654435761) % 2147483647) % 100) AS b,
       |    $toks AS t
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, b, token, count(*) AS k
       |  FROM (SELECT doc_id, b, unnest(t) AS token FROM split)
       |  GROUP BY 1, 2, 3),
       |vocab AS (
       |  SELECT token, CAST(sum(k) AS BIGINT) AS c
       |  FROM tf WHERE b < 90 GROUP BY 1 HAVING sum(k) >= 2)
       |SELECT tf.doc_id,
       |  CAST(sum(k) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN c IS NULL THEN k ELSE 0 END) AS BIGINT) AS n_oov,
       |  ${Det.roundSql(
            "CAST(sum(CASE WHEN c IS NULL THEN k ELSE 0 END) AS DOUBLE)" +
              " / CAST(sum(k) AS DOUBLE)", 4)} AS oov_rate,
       |  ${Det.roundSql(
            "CAST(sum(CASE WHEN c IS NOT NULL THEN k * (length(bin(c)) - 1) ELSE 0 END) AS DOUBLE)" +
              " / CAST(greatest(sum(CASE WHEN c IS NOT NULL THEN k ELSE 0 END), 1) AS DOUBLE)", 4)} AS mean_bits
       |FROM tf LEFT JOIN vocab USING (token)
       |GROUP BY tf.doc_id""".stripMargin
  }

  /** Exact-substring dedup stats ([[Dedup.duplicateSpans]]): per doc,
    * the merged duplicated-span count and character mass (0 for clean
    * docs) at gram length 30 — integer outputs, fully oracle-checked
    * against the same gram/rank/island pipeline in SQL.
    */
  private def dupSpansQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val stats = Dedup.duplicateSpans(docs, "doc_id", "text", l = 30)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum((col("span_end") - col("span_start")).cast("long")).as("dup_chars"))
    docs.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  /** Count-min-sketch frequency serving
    * ([[graft.operators.Sketches]]): per-source CMS partials over the
    * token stream — the persistable slice table — merged (bounded:
    * one blob per source) and point-queried for the exact top-20
    * tokens. Oracle-exact: cell-wise union algebra + Spark's
    * double-hashed murmur bucket derivation replayed in SQL
    * ([[Sketches.cmsTokensDuckSql]]); the never-underestimates /
    * eps·N bound is additionally spec-pinned (`SketchesSpec`).
    */
  private def cmsTokensQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Sketches
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val cms = Sketches.cmsMerge(Sketches.cmsPartials(toks, "source", "token"))
    // probe set: exact top-20 tokens — a bounded driver list
    val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import s.implicits._
    top.toSeq.map { case (t, n) => (t, n, cms.estimateCount(t)) }
      .toDF("token", "exact_n", "cms_est")
  }

  /** Quality-weighted corpus sample: survival probability = the
    * (Det-rounded, hence engine-exact) quality score.
    */
  private def weightedSampleQ(s: SparkSession, d: String): DataFrame =
    Sampling.weightedSample(
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      "doc_id", col("quality"))

  /** Frame-sample + resize plan over the media envelope (STUB decode
    * — deterministic fake dims; the exploded offset/resize plumbing
    * is the real Spark shape a demuxer feeds).
    */
  private def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    val bin = col("text").cast("binary")
    val resized = Multimodal.resizeMeta(Multimodal.decodeImageMeta(bin), 224)
    Tables.documents(s, d)
      .select(col("doc_id"),
        Multimodal.sampleFrameOffsets(bin, frameBytes = 32, everyN = 4).as("__offs"),
        resized.getField("width").as("r_width"),
        resized.getField("height").as("r_height"))
      .select(col("doc_id"),
        posexplode(col("__offs")).as(Seq("frame_idx", "byte_offset")),
        col("r_width"), col("r_height"))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("byte_offset"), col("r_width"), col("r_height"))
  }

  /** REAL image decode roundtrip: render one genuine PNG per doc
    * (dims + constant gray fill derived deterministically from the
    * doc, so the DuckDB oracle can PREDICT the decoded values), then
    * decode actual PNG bytes with `javax.imageio` in the batched
    * `mapPartitions` path. The output dims/px_mean come from parsing
    * real image bytes — the oracle only knows them because the test
    * images were rendered to spec.
    */
  private def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      (length(col("text")) % 64 + 16).cast("int").as("__w"),
      ((length(col("text")) * 7) % 48 + 16).cast("int").as("__h"),
      pmod(col("doc_id"), lit(256L)).cast("int").as("__g"))
    Multimodal.decodeBatch(
        Multimodal.withTestPng(docs, "__w", "__h", "__g"), "img")()
      .select(col("doc_id"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.px_mean").as("px_mean"))
  }

  /** Image FEATURE extraction over real decoded PNGs
    * ([[Multimodal.withImageFeatures]]): constant-fill frames make
    * every integer feature predictable (gray g → r_mean = g,
    * luminance bin = g div 32 holding all w·h pixels) while the
    * values still come from walking the decoded raster. Histogram
    * serialized to a string for the driver compare (array cells
    * break check.py's sort).
    */
  private def imageFeaturesQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      (length(col("text")) % 64 + 16).cast("int").as("__w"),
      ((length(col("text")) * 7) % 48 + 16).cast("int").as("__h"),
      pmod(col("doc_id"), lit(256L)).cast("int").as("__g"))
    Multimodal.withImageFeatures(
        Multimodal.withTestPng(docs, "__w", "__h", "__g"), "img")
      .select(col("doc_id"),
        col("feat.width").as("width"),
        col("feat.height").as("height"),
        col("feat.r_mean").as("r_mean"),
        array_join(transform(col("feat.hist"), _.cast("string")), ",")
          .as("hist"))
  }

  /** Image near-duplicate detection over REAL rendered PNGs
    * ([[Multimodal.imageNearDup]]): docs 0–49 render as 25 planted
    * near-dup pairs — doc `2k` and `2k+1` share pattern seed `k`, the
    * odd twin brightness-shifted (+4, dHash-invariant) with one cell
    * inverted (≤ 2 of 64 bits) — while docs 50–199 get unique seeds
    * (unrelated patterns land ~32 bits apart). The decode + dHash run
    * on genuine PNG bytes; candidates come from the banded-Hamming
    * equi-join shared with text SimHash, so the result is exactly the
    * 25 planted pairs, FP-free by construction. Oracle-exact: the
    * pattern renderer colors pixels by dHash's own grid walk, so each
    * sig is closed-form ([[Multimodal.dHashPatternDuckCtes]]) and the
    * oracle replays the identical banded join without inflating a
    * PNG byte.
    */
  private def imageNeardup(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        when(col("doc_id") < 50, expr("doc_id div 2"))
          .otherwise(col("doc_id") + 1000L).as("__seed"),
        when(col("doc_id") < 50 && pmod(col("doc_id"), lit(2)) === 1, lit(4))
          .otherwise(lit(0)).as("__delta"),
        when(col("doc_id") < 50 && pmod(col("doc_id"), lit(2)) === 1,
          pmod(col("doc_id"), lit(72)).cast("int"))
          .otherwise(lit(-1)).as("__flip"))
    Multimodal.imageNearDup(
        Multimodal.withPatternPng(planted, "__seed", "__delta", "__flip"),
        "doc_id", "img", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** End-to-end image dedup
    * ([[Multimodal.dropNearDuplicateImages]]): docs 0–29 render as 10
    * planted CHAINS — docs `3k, 3k+1, 3k+2` share pattern seed `k`;
    * the middle and last twins are brightness-shifted (dHash-
    * invariant) with DIFFERENT single cells inverted, so each twin
    * sits ≤ 2 bits from the hub `3k` (the twins themselves may sit up
    * to 4 apart — connectivity comes transitively through the hub,
    * which is exactly what component collapse must handle). Docs
    * 30–149 get unique seeds. Expected survivors: the 10 chain hubs
    * (min ids 0, 3, …, 27) + the 120 uniques. Oracle-exact: sigs are
    * closed-form for pattern PNGs ([[Multimodal.dHashPatternDuckCtes]])
    * and the recursive-CTE connected-components oracle
    * ([[Dedup.ccDuckCtes]]) replays the min-label collapse + keeper
    * anti-join in SQL.
    */
  private def imageDedup(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 150)
      .select(
        col("doc_id"),
        when(col("doc_id") < 30, expr("doc_id div 3"))
          .otherwise(col("doc_id") + 2000L).as("__seed"),
        when(col("doc_id") < 30, pmod(col("doc_id"), lit(3)) * 4)
          .otherwise(lit(0)).cast("int").as("__delta"),
        when(col("doc_id") < 30 && pmod(col("doc_id"), lit(3)) =!= 0,
          (pmod(col("doc_id"), lit(3)) * 20 + pmod(col("doc_id"), lit(13)))
            .cast("int"))
          .otherwise(lit(-1)).as("__flip"))
    Multimodal.dropNearDuplicateImages(
        Multimodal.withPatternPng(planted, "__seed", "__delta", "__flip"),
        "doc_id", "img", maxHamming = 3)
      .select("doc_id").orderBy("doc_id")
  }

  /** REAL audio decode over synthesized WAV bytes
    * ([[Multimodal.wavDecode]] via `javax.sound.sampled`): each doc
    * gets a constant-magnitude square tone whose decoded stats are
    * exactly predictable — `n_samples` and `amp` are integer
    * functions of `doc_id`, so `energy = n·amp²` — while the values
    * themselves come from parsing genuine RIFF/PCM bytes. The audio
    * twin of `q_multimodal_meta`.
    */
  private def audioMeta(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      (pmod(col("doc_id"), lit(7L)) * 32 + 1600).cast("int").as("__n"),
      (pmod(col("doc_id"), lit(97L)) * 64 + 128).cast("int").as("__amp"))
    Multimodal.withAudioMeta(
        Multimodal.withToneWav(docs, "__n", "__amp"), "wav")
      .select(col("doc_id"),
        col("audio.n_samples").as("n_samples"),
        col("audio.sample_rate").as("sample_rate"),
        col("audio.channels").as("channels"),
        col("audio.energy").as("energy"))
  }

  /** Audio near-duplicate detection over REAL rendered WAV clips
    * ([[Multimodal.audioNearDup]]): docs 0–49 render as 25 planted
    * pairs — doc `2k` and `2k+1` share pattern seed `k`, the odd twin
    * uniformly gain-doubled ([[Multimodal.aHash64]]-invariant: frame
    * energies scale by exactly `gain²` together) with one frame
    * attenuated (≤ 2 of 64 bits) — while docs 50–199 get unique
    * seeds. Candidates come from the SAME banded-Hamming equi-join
    * as text SimHash and image hashes. Oracle-exact: DuckDB never
    * decodes a WAV byte — the fingerprint is closed-form for pattern
    * clips (frame energies are `32·amp²`, gain cancels out of every
    * bit comparison), so the oracle predicts each sig with emulated
    * splitmix64 and replays the identical banded join
    * ([[Multimodal.aHashPatternDuckCtes]] +
    * [[Dedup.hamming64PairsDuckCtes]]).
    */
  private def audioNeardup(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        when(col("doc_id") < 50, expr("doc_id div 2"))
          .otherwise(col("doc_id") + 3000L).as("__seed"),
        when(col("doc_id") < 50 && pmod(col("doc_id"), lit(2)) === 1, lit(2))
          .otherwise(lit(1)).as("__gain"),
        when(col("doc_id") < 50 && pmod(col("doc_id"), lit(2)) === 1,
          pmod(col("doc_id"), lit(65)).cast("int"))
          .otherwise(lit(-1)).as("__quiet"))
    Multimodal.audioNearDup(
        Multimodal.withPatternWav(planted, "__seed", "__gain", "__quiet"),
        "doc_id", "wav", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** Cross-modal dedup (round 11): ONE connected-components collapse
    * over the UNION of pair sets from two modalities — text MinHash
    * candidates over the full corpus plus image dHash pairs over the
    * planted-PNG corpus (`q_image_dedup`'s derivation) — so a doc
    * kept by text evidence alone can still be dropped because its
    * IMAGE matches another doc's, and mixed chains (text pair (a,b) +
    * image pair (b,c)) merge into one component with one keeper. This
    * is multi-signal curation as pair-set ALGEBRA: modalities stay on
    * their own banded equi-join shapes, only (id, id) pairs meet —
    * the union adds no new shuffle class, and CC is the same driver
    * union-find under its 1M-edge cap. Output: surviving docs, as in
    * `q_dedup_docs`.
    */
  private def crossmodalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val textPairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val plantedImgs = docs
      .select(col("doc_id")).filter(col("doc_id") < 150)
      .select(
        col("doc_id"),
        when(col("doc_id") < 30, expr("doc_id div 3"))
          .otherwise(col("doc_id") + 2000L).as("__seed"),
        when(col("doc_id") < 30, pmod(col("doc_id"), lit(3)) * 4)
          .otherwise(lit(0)).cast("int").as("__delta"),
        when(col("doc_id") < 30 && pmod(col("doc_id"), lit(3)) =!= 0,
          (pmod(col("doc_id"), lit(3)) * 20 + pmod(col("doc_id"), lit(13)))
            .cast("int"))
          .otherwise(lit(-1)).as("__flip"))
    val imgPairs = Multimodal.imageNearDup(
        Multimodal.withPatternPng(plantedImgs, "__seed", "__delta", "__flip"),
        "doc_id", "img", maxHamming = 3)
      .select("id_a", "id_b")
    val losers = Dedup.connectedComponents(textPairs.union(imgPairs))
      .filter(col("id") =!= col("component"))
      .select(col("id"))
    docs.join(losers, docs("doc_id") === losers("id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")
  }

  /** Streaming video near-dup gate replay
    * ([[graft.streaming.VideoGate]] — the FIFTH modality through the
    * shared [[graft.streaming.SigGate]] core): the `q_video_neardup`
    * planted corpus in two parity micro-batches (even `doc_id`s then
    * odd), so every planted scene-sharing pair straddles the batch
    * boundary and the odd twin must be rejected via STATE, not
    * intra-batch CC. The gate minhashes each video's sampled-frame
    * energy multiset directly (energies are already < p — no
    * re-hashing), so the oracle composes three existing chains:
    * closed-form pattern energies
    * ([[Multimodal.videoEnergyPatternDuckCtes]]) → the minhash
    * signature/band/candidate tail
    * ([[Dedup.minhashPairsFromHsDuckCtes]]) → the two-batch gate
    * replay ([[Dedup.gateReplayDuckCtes]]).
    */
  private def streamVideoGate(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        (col("doc_id") + 5000L).as("__seed"),
        when(col("doc_id") < 50, expr("doc_id div 2") + 7000L)
          .otherwise(lit(0L)).as("__shseed"),
        when(col("doc_id") < 50, lit(0)).otherwise(lit(-1)).as("__shfrom"),
        when(col("doc_id") < 50, lit(30)).otherwise(lit(0)).as("__shcount"))
    val vids = Multimodal.withPatternVideo(
      planted, "__seed", "__shseed", "__shfrom", "__shcount")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_vidgate_state")
    val a0 = graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "video", stateDir)
    val a1 = graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", stateDir)
    a0.union(a1).select("doc_id")
  }

  /** [[streamVideoGate]] with hub-STAR intra candidates (round 13 —
    * the THIRD gate family's dup-heavy form driver-checked, after
    * `q_stream_neardup_star` and `q_stream_simhash_gate_star`):
    * [[graft.streaming.VideoGate.acceptBatch]]`(starIntra = true)`
    * over the planted two-parity corpus; the video chain minhashes
    * frame-energy sets, so [[Dedup.starPairsParityDuckCtes]] applies
    * VERBATIM over the `mh_banded`/`mh_sigs` the energy oracle tail
    * already emits.
    */
  private def streamVideoGateStar(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        (col("doc_id") + 5000L).as("__seed"),
        when(col("doc_id") < 50, expr("doc_id div 2") + 7000L)
          .otherwise(lit(0L)).as("__shseed"),
        when(col("doc_id") < 50, lit(0)).otherwise(lit(-1)).as("__shfrom"),
        when(col("doc_id") < 50, lit(30)).otherwise(lit(0)).as("__shcount"))
    val vids = Multimodal.withPatternVideo(
      planted, "__seed", "__shseed", "__shfrom", "__shcount")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_vidgate_star_state")
    val a0 = graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "video", stateDir,
      starIntra = true)
    val a1 = graft.streaming.VideoGate.acceptBatch(
      vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", stateDir,
      starIntra = true)
    a0.union(a1).select("doc_id")
  }

  /** Video near-duplicate detection — shared-SCENE semantics
    * ([[Multimodal.videoNearDup]], round 11): docs 0-49 render as 25
    * planted pairs — doc `2k` and `2k+1` embed the identical 30-frame
    * scene run (shared seed `k+7000`) ahead of 10 own frames, so the
    * sampled (every-2nd-frame) fingerprint sets share 15 of 20
    * members and Jaccard = 15/25 = 0.6 — while docs 50-199 are
    * all-unique scenes. Pairing is exact frame-set Jaccard through
    * the lossless geometric double-block ([[Dedup.setJaccardPairs]]),
    * position-shift-invariant, never a cartesian. Oracle-exact:
    * DuckDB never touches a payload byte — pattern frame energies are
    * the closed form `Σ ((v + i·w) mod 256)²` with `(v, w)` from the
    * same emulated splitmix64 as the audio/image oracles
    * ([[Multimodal.videoEnergyPatternDuckCtes]]), and the block join
    * replays the `q_ngram_jaccard` shape.
    */
  private def videoNeardup(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        (col("doc_id") + 5000L).as("__seed"),
        when(col("doc_id") < 50, expr("doc_id div 2") + 7000L)
          .otherwise(lit(0L)).as("__shseed"),
        when(col("doc_id") < 50, lit(0)).otherwise(lit(-1)).as("__shfrom"),
        when(col("doc_id") < 50, lit(30)).otherwise(lit(0)).as("__shcount"))
    Multimodal.videoNearDup(
        Multimodal.withPatternVideo(
          planted, "__seed", "__shseed", "__shfrom", "__shcount"),
        "doc_id", "video")
      .orderBy("id_a", "id_b")
  }

  /** The PRODUCTION video fingerprint, driver-checked (round 13):
    * [[Multimodal.videoNearDupHashed]] — `xxhash64` over raw 32-byte
    * frame slices (2⁶⁴ value domain; the at-scale form after the
    * exact-energy fingerprint's bounded domain measured
    * collision-quadratic past ~10⁴ videos) over the same planted
    * corpus as `q_video_neardup`. Oracle-exact: per sampled frame
    * DuckDB rebuilds the 32 closed-form pattern bytes, packs 4
    * little-endian words, and replays XXH64 in HUGEINT wraparound SQL
    * ([[Multimodal.videoHashPatternDuckCtes]] /
    * [[graft.operators.Xxh64Duck]]), then the identical
    * size-double-block set-Jaccard tail. Shared scenes share raw
    * encodes here (same muxed bytes), so the planted pairs surface
    * exactly as in the energy form.
    */
  private def videoNeardupHashed(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 200)
      .select(
        col("doc_id"),
        (col("doc_id") + 5000L).as("__seed"),
        when(col("doc_id") < 50, expr("doc_id div 2") + 7000L)
          .otherwise(lit(0L)).as("__shseed"),
        when(col("doc_id") < 50, lit(0)).otherwise(lit(-1)).as("__shfrom"),
        when(col("doc_id") < 50, lit(30)).otherwise(lit(0)).as("__shcount"))
    Multimodal.videoNearDupHashed(
        Multimodal.withPatternVideo(
          planted, "__seed", "__shseed", "__shfrom", "__shcount"),
        "doc_id", "video")
      .orderBy("id_a", "id_b")
  }

  /** Streaming video gate over REAL MJPEG-in-AVI containers
    * (round 12 — [[graft.streaming.VideoGate.acceptBatchAvi]]): the
    * `q_video_neardup_avi` planted corpus in two parity micro-batches,
    * so every planted scene-sharing pair straddles the batch boundary
    * and the odd twin must be rejected via STATE. Every byte the gate
    * fingerprints comes out of a RIFF demux + `javax.imageio` decode,
    * and the oracle still replays it closed-form: decoded uniform-gray
    * energies ([[Multimodal.videoEnergyAviDuckCtes]]) → the minhash
    * signature/band/candidate tail → the two-batch gate replay.
    */
  private def streamVideoGateAvi(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 120)
      .select(
        col("doc_id"),
        (col("doc_id") + 6000L).as("__seed"),
        when(col("doc_id") < 50, expr("doc_id div 2") + 8000L)
          .otherwise(lit(0L)).as("__shseed"),
        when(col("doc_id") < 50, lit(0)).otherwise(lit(-1)).as("__shfrom"),
        when(col("doc_id") < 50, lit(30)).otherwise(lit(0)).as("__shcount"))
    val vids = Multimodal.withMjpegAviVideo(
      planted, "__seed", "__shseed", "__shfrom", "__shcount")
    val stateDir = graft.streaming.Scratch.tmpDir("graft_vidgate_avi_state")
    val a0 = graft.streaming.VideoGate.acceptBatchAvi(
      vids.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "video", stateDir)
    val a1 = graft.streaming.VideoGate.acceptBatchAvi(
      vids.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "video", stateDir)
    a0.union(a1).select("doc_id")
  }

  /** [[videoNeardup]] over REAL MJPEG-in-AVI containers (round 12):
    * the same planted shared-scene layout (docs 0-49 pair up via a
    * 30-frame shared run, 50-119 all-unique), but each payload is a
    * genuinely muxed AVI — RIFF chunk tree, MJPEG '00dc' frames —
    * demuxed by the RIFF walk and decoded frame-by-frame with
    * `javax.imageio` ([[Multimodal.videoNearDupAvi]]). Each frame is
    * one uniform gray, which round-trips the JPEG encode/decode
    * bit-exactly at quality 1.0 (all 256 grays spec-pinned), so the
    * oracle predicts the DECODED energies closed-form
    * (`width·height·g²`, [[Multimodal.videoEnergyAviDuckCtes]]) and
    * the whole real-decode path stays hash-exact.
    */
  private def videoNeardupAvi(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 120)
      .select(
        col("doc_id"),
        (col("doc_id") + 6000L).as("__seed"),
        when(col("doc_id") < 50, expr("doc_id div 2") + 8000L)
          .otherwise(lit(0L)).as("__shseed"),
        when(col("doc_id") < 50, lit(0)).otherwise(lit(-1)).as("__shfrom"),
        when(col("doc_id") < 50, lit(30)).otherwise(lit(0)).as("__shcount"))
    Multimodal.videoNearDupAvi(
        Multimodal.withMjpegAviVideo(
          planted, "__seed", "__shseed", "__shfrom", "__shcount"),
        "doc_id", "video")
      .orderBy("id_a", "id_b")
  }

  /** Sequence packing: assign each doc to a fixed-256-token training
    * sequence (concat-then-chunk rule; [[Packing.concatChunkPack]]'s
    * two-pass distributed prefix sum — no single-partition window).
    */
  private def packSequences(s: SparkSession, d: String): DataFrame =
    Packing.concatChunkPack(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokenCount(col("text")), budget = 256)
      .select("doc_id", "n_tokens", "seq_id")

  /** Exact-quota 20% stratified sample by language
    * ([[Sampling.stratifiedSample]]): hash-ranked, integer-quota, so
    * the selected set is engine-reproducible.
    */
  private def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        strata = Seq("lang"), id = "doc_id", num = 1, den = 5)
      .select("doc_id", "lang")

  /** Corpus token-frequency top-k: explode → partial/final count →
    * bounded top-k (TakeOrderedAndProject). The explode multiplies
    * rows but map-side partial aggregation collapses them before the
    * shuffle, so the exchange carries ≤ |vocab| rows per partition.
    */
  private def tokenTopK(s: SparkSession, d: String): DataFrame = {
    val counted = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
    Relational.topK(counted, 100, col("n").desc, col("token").asc)
      .select("token", "n")
  }

  /** Gopher-style repetition signals. The token array is staged ONCE
    * in a projection before the n-gram measures reference it
    * (Catalyst re-inlines a higher-order subtree per reference —
    * CLAUDE.md trap; `wordNgrams` references its input n+2 times).
    */
  private def repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(
        col("doc_id"),
        TextAnalysis.dupTokenFraction(col("text")).as("dup_token_frac"),
        TextAnalysis.dupNgramFraction(col("__toks"), 2).as("dup_2gram_frac"),
        TextAnalysis.dupNgramFraction(col("__toks"), 3).as("dup_3gram_frac"))

  /** Intra-doc line dedup. The corpus is single-line, so the query
    * first folds each doc into 8-token lines (same regex both
    * engines), then dedups repeated lines keeping first occurrence —
    * the boilerplate scrub as a round-trip the oracle can diff.
    */
  private def dedupLinesQ(s: SparkSession, d: String): DataFrame = {
    val lined = regexp_replace(col("text"), "((?:\\S+ ){7}\\S+) ", "$1\n")
    Tables.documents(s, d)
      .select(col("doc_id"), lined.as("__t"))
      .select(
        col("doc_id"),
        size(TextAnalysis.lines(col("__t"))).as("n_lines"),
        size(array_distinct(TextAnalysis.lines(col("__t")))).as("n_uniq_lines"),
        TextAnalysis.dedupLines(col("__t")).as("dedup_text"))
  }

  /** URL canonicalization + dedup. The corpus has no URL column, so
    * the query manufactures deterministically-messy URLs (case,
    * default port, utm params, fragments, trailing slash — keyed off
    * doc_id residues, path collides on doc_id % 50) and the oracle
    * manufactures the identical strings; what's under test is the
    * normalizer chain + the dedup aggregation.
    */
  private def urlDedup(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(pmod(id, lit(2)) === 0, lit("https://")).otherwise(lit("HTTPS://")),
      when(pmod(id, lit(3)) === 0, upper(col("source"))).otherwise(col("source")),
      lit(".example.com"),
      when(pmod(id, lit(5)) === 0, lit(":443")).otherwise(lit("")),
      lit("/docs/"), pmod(id, lit(50)).cast("string"),
      when(pmod(id, lit(4)) === 0, lit("/?utm_campaign=x&ref=1")).otherwise(lit("")),
      when(pmod(id, lit(7)) === 0, lit("#frag")).otherwise(lit("")))
    Urls.dedupByUrl(
      Tables.documents(s, d).select(id, url.as("url")), "doc_id", "url")
  }

  /** Per-domain quota ([[Urls.domainQuota]]): top-5 docs per
    * registrable domain by quality score. URLs are manufactured with
    * case/userinfo/www/port noise keyed off doc_id (the corpus has no
    * URL column), so what's under test is host extraction + www fold
    * + the bounded-heap per-domain cut; the oracle mirrors the
    * string construction and states the cut as a window rank.
    */
  private def domainQuotaQ(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(pmod(id, lit(2)) === 0, lit("https://")).otherwise(lit("HTTPS://")),
      when(pmod(id, lit(11)) === 0, lit("crawler:s3cret@")).otherwise(lit("")),
      when(pmod(id, lit(6)) === 0, lit("www.")).otherwise(lit("")),
      when(pmod(id, lit(3)) === 0, upper(col("source"))).otherwise(col("source")),
      lit(".Example.COM"),
      when(pmod(id, lit(5)) === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), pmod(id, lit(7)).cast("string"))
    Urls.domainQuota(
      Tables.documents(s, d).select(
        id, url.as("url"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      "doc_id", "url", "quality", k = 5)
  }

  private val domainQuotaSql = {
    val toks = duckToks("text")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
       |    || (CASE WHEN doc_id % 11 = 0 THEN 'crawler:s3cret@' ELSE '' END)
       |    || (CASE WHEN doc_id % 6 = 0 THEN 'www.' ELSE '' END)
       |    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
       |    || '.Example.COM'
       |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
       |    || '/p/' || CAST(doc_id % 7 AS VARCHAR) AS url,
       |    floor((0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0)
       |        + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |                       / greatest(length(text), 1))
       |        + 0.4 * least((CAST(list_sum(list_transform($toks, t -> len(t))) AS DOUBLE)
       |                       / greatest(len($toks), 1)) / 8.0, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality
       |  FROM documents),
       |dom AS (
       |  SELECT doc_id, quality,
       |    regexp_replace(
       |      lower(regexp_extract(url,
       |        '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)),
       |      '^www\\.', '') AS domain
       |  FROM q),
       |ranked AS (
       |  SELECT domain, doc_id, quality,
       |    row_number() OVER (PARTITION BY domain
       |                       ORDER BY quality DESC, doc_id) AS rnk
       |  FROM dom)
       |SELECT domain, CAST(rnk AS INTEGER) AS rank, doc_id, quality
       |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  /** Per-domain quota on the PUBLIC-SUFFIX-LIST registrable domain
    * ([[Urls.domainQuota]] with `usePsl = true` →
    * [[Psl.withRegistrableDomain]]). URLs are manufactured (the
    * corpus has no URL column) to hit every PSL rule family where the
    * `www.`-strip heuristic gives a different key: plain subdomains
    * (`news.`, one two-deep), two-level TLDs (`.com.au`, `.co.uk`),
    * the `*.ck` wildcard (public suffix = `<label>.ck`, so the
    * registrable domain keeps the subdomain), the `!www.ck` exception
    * (`www.ck` IS registrable), and a host that is itself a public
    * suffix (`com.au` → returned unchanged). The DuckDB oracle's PSL
    * stage is GENERATED from the same rule list
    * ([[Psl.registrableDomainDuckSql]]), so engine and oracle cannot
    * drift.
    */
  private def domainQuotaPslQ(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val sub = when(pmod(id, lit(4)) === 0, lit("news."))
      .when(pmod(id, lit(4)) === 1, lit("shop.media."))
      .when(pmod(id, lit(4)) === 2, lit("www."))
      .otherwise(lit(""))
    val tld = when(pmod(id, lit(5)) === 0, lit(".com"))
      .when(pmod(id, lit(5)) === 1, lit(".com.au"))
      .when(pmod(id, lit(5)) === 2, lit(".co.uk"))
      .when(pmod(id, lit(5)) === 3, lit(".dev"))
      .otherwise(lit(".ck"))
    val url = when(pmod(id, lit(97)) === 0, lit("https://www.ck/x"))
      .when(pmod(id, lit(89)) === 0, lit("https://COM.AU/x"))
      .otherwise(concat(
        lit("https://"), sub, col("source"), tld,
        lit("/p/"), pmod(id, lit(7)).cast("string")))
    Urls.domainQuota(
      Tables.documents(s, d).select(
        id, url.as("url"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      "doc_id", "url", "quality", k = 5, usePsl = true)
  }

  private val domainQuotaPslSql = {
    val toks = duckToks("text")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 97 = 0 THEN 'https://www.ck/x'
       |          WHEN doc_id % 89 = 0 THEN 'https://COM.AU/x'
       |          ELSE 'https://'
       |            || (CASE WHEN doc_id % 4 = 0 THEN 'news.'
       |                     WHEN doc_id % 4 = 1 THEN 'shop.media.'
       |                     WHEN doc_id % 4 = 2 THEN 'www.'
       |                     ELSE '' END)
       |            || source
       |            || (CASE WHEN doc_id % 5 = 0 THEN '.com'
       |                     WHEN doc_id % 5 = 1 THEN '.com.au'
       |                     WHEN doc_id % 5 = 2 THEN '.co.uk'
       |                     WHEN doc_id % 5 = 3 THEN '.dev'
       |                     ELSE '.ck' END)
       |            || '/p/' || CAST(doc_id % 7 AS VARCHAR) END) AS url,
       |    floor((0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0)
       |        + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |                       / greatest(length(text), 1))
       |        + 0.4 * least((CAST(list_sum(list_transform($toks, t -> len(t))) AS DOUBLE)
       |                       / greatest(len($toks), 1)) / 8.0, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality
       |  FROM documents),
       |hosts AS (
       |  SELECT doc_id,
       |    lower(regexp_extract(url,
       |      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host
       |  FROM q),
       |${Psl.registrableDomainDuckSql("hosts")},
       |ranked AS (
       |  SELECT d.domain, q.doc_id, q.quality,
       |    row_number() OVER (PARTITION BY d.domain
       |                       ORDER BY q.quality DESC, q.doc_id) AS rnk
       |  FROM psl_dom d JOIN q ON d.doc_id = q.doc_id)
       |SELECT domain, CAST(rnk AS INTEGER) AS rank, doc_id, quality
       |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  /** Top-3 TF-IDF keywords per doc (exact-rational IDF — see
    * [[Keywords.tfIdfTopK]]).
    */
  private def tfidfKeywords(s: SparkSession, d: String): DataFrame =
    Keywords.tfIdfTopK(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", k = 3)

  private val repetitionSql = {
    val toks = duckToks("text")
    def rep(arr: String) =
      s"""floor((len($arr) - len(list_distinct($arr)))::DOUBLE
         |  / greatest(len($arr), 1) * 10000.0 + 0.5) / 10000.0""".stripMargin
    def grams(n: Int) = {
      val parts = (1 to n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"CASE WHEN len(t) < $n THEN [] ELSE list_transform(range(len(t) - ${n - 1}), i -> $parts) END"
    }
    s"""WITH staged AS (SELECT doc_id, $toks AS t FROM documents)
       |SELECT doc_id,
       |  ${rep("t")} AS dup_token_frac,
       |  ${rep(grams(2))} AS dup_2gram_frac,
       |  ${rep(grams(3))} AS dup_3gram_frac
       |FROM staged""".stripMargin
  }

  private val dedupLinesSql = {
    val ls = "string_split(t, chr(10))"
    val nonEmpty = s"list_filter($ls, l -> len(trim(l)) > 0)"
    s"""WITH lined AS (
       |  SELECT doc_id,
       |    regexp_replace(text, '((?:\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g') AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len($nonEmpty) AS INTEGER) AS n_lines,
       |  CAST(len(list_distinct($nonEmpty)) AS INTEGER) AS n_uniq_lines,
       |  array_to_string(
       |    list_filter($ls, (l, i) -> list_position($ls, l) = i),
       |    chr(10)) AS dedup_text
       |FROM lined""".stripMargin
  }

  private val urlDedupSql =
    """WITH urls AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
      |    || '.example.com'
      |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |    || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/?utm_campaign=x&ref=1' ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
      |  FROM documents),
      |norm AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        lower(regexp_extract(regexp_replace(url, '#.*', ''),
      |                             '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)),
      |        ':(80|443)$', '')
      |      || regexp_replace(
      |           regexp_replace(
      |             regexp_replace(
      |               regexp_replace(
      |                 regexp_replace(regexp_replace(url, '#.*', ''),
      |                                '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
      |                 '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
      |               '&&+', '&', 'g'),
      |             '\?&', '?', 'g'),
      |           '[?&]+$', '', 'g'),
      |    '/+$', '', 'g') AS norm_url
      |  FROM urls)
      |SELECT norm_url, min(doc_id) AS canonical_id,
      |  CAST(count(*) AS BIGINT) AS n_copies
      |FROM norm GROUP BY 1""".stripMargin

  private val tfidfSql = {
    val toks = duckToks("text")
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok GROUP BY 1, 2),
       |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
       |    floor(CAST(tf.tf * n.n_docs AS DOUBLE) / dfq.df * 10000.0 + 0.5)
       |      / 10000.0 AS score
       |  FROM tf JOIN dfq USING (token) CROSS JOIN n)
       |SELECT doc_id, token, tf, df, score, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, token) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin
  }

  private val statsSql = {
    val toks = duckToks("text")
    s"""SELECT doc_id,
       |  length(text) AS n_chars_calc,
       |  len($toks) AS n_tokens,
       |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       |  floor(CAST(list_sum(list_transform($toks, t -> len(t))) AS DOUBLE)
       |        / greatest(len($toks), 1) * 10000.0 + 0.5) / 10000.0 AS avg_token_len,
       |  floor(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |        / greatest(length(text), 1) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
       |  floor(CAST(len(list_filter($toks,
       |          t -> list_contains(['the','a','an','and','of','to','in','is','it','for'], t))) AS DOUBLE)
       |        / greatest(len($toks), 1) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio
       |FROM documents""".stripMargin
  }

  private val qualitySql = {
    val toks = duckToks("text")
    s"""SELECT doc_id,
       |  floor((0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0)
       |      + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |                     / greatest(length(text), 1))
       |      + 0.4 * least((CAST(list_sum(list_transform($toks, t -> len(t))) AS DOUBLE)
       |                     / greatest(len($toks), 1)) / 8.0, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality
       |FROM documents""".stripMargin
  }

  /** Composite Gopher-rule gate over the documents table. */
  private def qualityGateQ(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityGate(Tables.documents(s, d), "doc_id", "text")

  /** [[qualityGateSql]] over any `(doc_id, text)` table — the gate
    * twin the crawl-curation oracles nest over EXTRACTED text.
    */
  private def qualityGateSqlOver(table: String): String = {
    // COALESCEs mirror the Spark side exactly: NULL text = empty doc
    // (fails length/stopwords/token_len), and DuckDB's list_sum over
    // an empty list is NULL where Spark's aggregate starts at 0.
    val toks = duckToks("COALESCE(text, '')")
    def r4(e: String) = s"floor(($e) * 10000.0 + 0.5) / 10000.0"
    val awl = r4(s"""CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS DOUBLE)
                    |      / greatest(len(t), 1)""".stripMargin)
    val pr = r4(s"""CAST(len(regexp_extract_all(COALESCE(text, ''), '[^A-Za-z0-9\\s]')) AS DOUBLE)
                   |      / greatest(length(COALESCE(text, '')), 1)""".stripMargin)
    val sr = r4(s"""CAST(len(list_filter(t,
                   |        x -> list_contains(['the','a','an','and','of','to','in','is','it','for'], x))) AS DOUBLE)
                   |      / greatest(len(t), 1)""".stripMargin)
    val dtf = r4("CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)")
    // Rule order matches the Spark array: alphabetical.
    s"""WITH staged AS (SELECT doc_id, $toks AS t, text FROM $table),
       |sig AS (SELECT doc_id, len(t) AS n_tok,
       |  $awl AS awl, $pr AS pr, $sr AS sr, $dtf AS dtf
       |FROM staged)
       |SELECT doc_id,
       |  COALESCE(array_to_string(list_filter([
       |    CASE WHEN n_tok < 10 OR n_tok > 5000 THEN 'length' END,
       |    CASE WHEN pr > 0.2 THEN 'punctuation' END,
       |    CASE WHEN dtf > 0.3 THEN 'repetition' END,
       |    CASE WHEN sr < 0.05 THEN 'stopwords' END,
       |    CASE WHEN awl < 2.0 OR awl > 12.0 THEN 'token_len' END],
       |    x -> x IS NOT NULL), ','), '') AS failed_rules,
       |  CASE WHEN n_tok >= 10 AND n_tok <= 5000 AND pr <= 0.2 AND dtf <= 0.3
       |            AND sr >= 0.05 AND awl >= 2.0 AND awl <= 12.0
       |       THEN 1 ELSE 0 END AS pass
       |FROM sig""".stripMargin
  }

  private val qualityGateSql = qualityGateSqlOver("documents")

  private val langIdSql = {
    val toks = duckToks("lower(text)")
    def score(markers: Seq[String]) =
      s"len(list_filter($toks, t -> list_contains([${markers.map("'" + _ + "'").mkString(",")}], t)))"
    val Seq(en, de, es, fr) = TextAnalysis.langMarkers.map(m => score(m._2))
    s"""SELECT doc_id,
       |  CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
       |       WHEN $en >= $de AND $en >= $es AND $en >= $fr AND $en > 0 THEN 'en'
       |       WHEN $de >= $es AND $de >= $fr AND $de > 0 THEN 'de'
       |       WHEN $es >= $fr AND $es > 0 THEN 'es'
       |       WHEN $fr > 0 THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM documents""".stripMargin
  }

  private val ngramJaccardSql = {
    val toks = duckToks("text")
    // Mirrors the operator's geometric double-block: g =
    // floor(log2(len(grams))) via binary-string length (integer-exact,
    // same as Spark's bin()); each doc joins from buckets {g, g+1}.
    s"""WITH tk AS (
       |  SELECT doc_id, $toks AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |         ELSE list_distinct(list_transform(range(len(tk) - 2),
       |                i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))
       |    END AS grams
       |  FROM tk),
       |blocked AS (
       |  SELECT doc_id, grams, unnest([g, g + 1]) AS blk
       |  FROM (SELECT doc_id, grams,
       |          length(printf('%b', greatest(len(grams), 1))) - 1 AS g FROM sh)),
       |toks AS (SELECT blk, doc_id, unnest(grams) AS tok FROM blocked),
       |sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(DISTINCT a.tok) AS BIGINT) AS n_inter
       |  FROM toks a JOIN toks b
       |    ON a.blk = b.blk AND a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT id_a, id_b,
       |    floor(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) * 10000.0 + 0.5) / 10000.0 AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON id_a = sa.doc_id
       |  JOIN sizes sb ON id_b = sb.doc_id) t
       |WHERE jaccard >= 0.5""".stripMargin
  }

  /** HTML → text extraction ([[TextAnalysis.stripHtml]]): each doc
    * wrapped in a deterministic page shell (script/style/comment
    * blocks, tags, entities, an outlink) and stripped back to prose.
    * The oracle builds the identical page and applies the identical
    * chain in DuckDB — every pattern is backreference-free so the two
    * regex engines agree; NULL text null-propagates identically
    * through `||`/`concat`.
    */
  /** The deterministic page shell shared by `q_strip_html` and the
    * raw-WARC HTML fixtures (Spark-column form) — script/style/
    * comment blocks, tags, entities, an outlink around the doc text.
    */
  private def pageShellCol(
      id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val idS = id.cast("string")
    concat(
      lit("<html><head><title>t</title><style>p { color: red; }</style>"),
      lit("<script>var x = 1 < 2 && \"a\";</script></head><body><!-- note -->"),
      lit("<h1>Doc "), idS, lit("</h1><p class=\"b\">"),
      text,
      lit("</p><a href=\"http://ex.com/d/"), idS,
      lit("\">link</a> &amp; tail &lt;raw&gt; &quot;q&quot;&nbsp;end</body></html>"))
  }

  /** [[pageShellCol]] rendered in fixture-writer tasks — MUST stay
    * byte-identical to the column form (oracles rebuild the page in
    * SQL and strip it).
    */
  private def pageShellStr(id: Long, text: String): String =
    "<html><head><title>t</title><style>p { color: red; }</style>" +
      "<script>var x = 1 < 2 && \"a\";</script></head><body><!-- note -->" +
      s"""<h1>Doc $id</h1><p class="b">""" + text +
      s"""</p><a href="http://ex.com/d/$id">link</a>""" +
      " &amp; tail &lt;raw&gt; &quot;q&quot;&nbsp;end</body></html>"

  /** The page-shell rebuild as a DuckDB expression over `(doc_id,
    * text)` — the SQL twin of [[pageShellCol]]/[[pageShellStr]].
    */
  // single line, NO leading "||": this splices through multiple
  // levels of stripMargin (duckStripHtml, the QueryDef strings), and
  // each level eats one leading pipe from a "||" continuation line
  private val duckPageShell =
    "'<html><head><title>t</title><style>p { color: red; }</style>' || " +
      "'<script>var x = 1 < 2 && \"a\";</script></head><body><!-- note -->' || " +
      "'<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p class=\"b\">' || " +
      "text || " +
      "'</p><a href=\"http://ex.com/d/' || CAST(doc_id AS VARCHAR) || " +
      "'\">link</a> &amp; tail &lt;raw&gt; &quot;q&quot;&nbsp;end</body></html>'"

  /** [[TextAnalysis.stripHtml]]'s DuckDB twin over an HTML expression
    * — every pattern backreference-free so java.util.regex and RE2
    * agree; stage order identical (blocks → tags → entities → `&amp;`
    * last → whitespace collapse).
    */
  private def duckStripHtml(htmlExpr: String): String =
    s"""trim(regexp_replace(
       |      replace(
       |        replace(replace(replace(replace(replace(
       |          regexp_replace(
       |            regexp_replace(
       |              regexp_replace(
       |                regexp_replace($htmlExpr, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |              '(?s)<!--.*?-->', ' ', 'g'),
       |            '<[^>]*>', ' ', 'g'),
       |          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |          '&#39;', chr(39)), '&nbsp;', ' '),
       |        '&amp;', '&'),
       |      '\\s+', ' ', 'g'))""".stripMargin

  /** C4 filter suite ([[TextAnalysis.c4CleanLines]]/[[TextAnalysis
    * .c4DocPass]] — Raffel et al. 2020 §2.2, the other canonical
    * published web-filter set beside the Gopher gate): each doc is
    * planted into a lined shape exercising every rule — a kept
    * prefix sentence, a "javascript" line, a sub-5-word line, a
    * no-terminal-punctuation line, a constant kept sentence, the
    * full text as a sentence, plus "lorem ipsum" (every 17th doc)
    * and a curly-brace code line (every 19th) that doom the whole
    * page. Oracle mirrors the lined shape and both rule sets 1:1.
    */
  private def c4FiltersQ(s: SparkSession, d: String): DataFrame = {
    val lined = concat(
      substring(col("text"), 1, 60), lit(".\n"),
      lit("enable javascript to continue.\n"),
      lit("too short.\n"),
      lit("no terminal punctuation here at all\n"),
      lit("Another perfectly ordinary sentence with enough words here.\n"),
      col("text"), lit("."),
      when(col("doc_id") % 17 === 0,
        lit("\nLorem Ipsum dolor sit amet.")).otherwise(lit("")),
      when(col("doc_id") % 19 === 0,
        lit("\nconfig = { mode: on }.")).otherwise(lit("")))
    val clean = TextAnalysis.c4CleanLines(lined)
    Tables.documents(s, d).select(
      col("doc_id"),
      clean.as("clean"),
      size(TextAnalysis.lines(clean)).cast("long").as("n_kept"),
      TextAnalysis.c4DocPass(clean).as("pass"))
  }

  /** Unicode NFC normalization ([[TextAnalysis.normalizeUnicode]]):
    * each doc gets four planted DECOMPOSED sequences (combining
    * acute/diaeresis/grave after base letters) appended; NFC composes
    * them, so `clean` differs from the input and `n_after` =
    * `n_before − 4`. Oracle: DuckDB `nfc_normalize` over the
    * byte-identical planted string (combining marks via `chr`) —
    * both engines implement Unicode canonical composition, and
    * `length` counts codepoints in both.
    */
  private def unicodeNfcQ(s: SparkSession, d: String): DataFrame = {
    // DECOMPOSED on purpose: base letter + combining mark (U+0301
    // acute, U+0308 diaeresis, U+0300 grave), which NFC composes
    val deco = concat(col("text"),
      lit(" café naïve et déjà"))
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.normalizeUnicode(deco).as("clean"),
      length(deco).cast("long").as("n_before"),
      length(TextAnalysis.normalizeUnicode(deco)).cast("long").as("n_after"))
  }

  /** Unicode NFKC normalization with a CLOSED-FORM oracle (round 15):
    * DuckDB has no `nfkc_normalize`, so the fixture plants characters
    * whose compatibility decompositions are pinned by the Unicode
    * standard — ligatures (ﬁ ﬂ ﬀ ﬃ), circled digits (①②③),
    * fullwidth forms (Ａｂｃ１２３), superscripts (² ³), roman
    * numeral Ⅸ and squared units (㎞ ㎡) — one variant per
    * `doc_id % 6`, plus a canonically DECOMPOSED `cafe` + U+0301
    * suffix on every row (NFKC also composes). The oracle is a CASE
    * table of the known images; the normalizer itself is the same
    * native [[graft.functions.NormalizeExpr]] the NFC query
    * exercises. Inputs are otherwise ASCII by construction (NFKC
    * identity), so the expected outputs are exact, not
    * ICU-version-dependent.
    */
  private def unicodeNfkcQ(s: SparkSession, d: String): DataFrame = {
    val planted = Seq(
      "ﬁle ﬂow", // ﬁle ﬂow → file flow
      "①②③", // ①②③ → 123
      "Ａｂｃ１２３", // Ａｂｃ１２３ → Abc123
      "x²y³", // x²y³ → x2y3
      "Ⅸ㎞㎡", // Ⅸ㎞㎡ → IXkmm2
      "ﬀ oﬃce") // ﬀ oﬃce → ff office
    val variant = (0 until 6).foldLeft(lit(planted(5))) { (acc, i) =>
      when(col("doc_id") % 6 === i, lit(planted(i))).otherwise(acc)
    }
    val raw = concat(lit("v"), col("doc_id").cast("string"), lit(" "),
      variant, lit(" café"))
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.normalizeUnicode(raw, "NFKC").as("clean"),
      length(raw).cast("long").as("n_before"),
      length(TextAnalysis.normalizeUnicode(raw, "NFKC")).cast("long")
        .as("n_after"))
  }

  /** Unicode NFD/NFKD with CLOSED-FORM oracles (round 15 — completing
    * the normalization family: NFC has the DuckDB-native twin, NFKC
    * the round-15 CASE table; the DECOMPOSITION forms get the same
    * treatment). Planted per `doc_id % 4`: composed `é` (NFD splits
    * to `e` + U+0301), ligature+composed (NFKD also folds `ﬁ`→`fi`,
    * NFD leaves the ligature — compatibility vs canonical pinned
    * against each other), fullwidth+circled (canonically inert, NFKD
    * folds to ASCII), superscript. Images are fixed by the Unicode
    * standard; combining marks enter the SQL via `chr()`.
    */
  private def unicodeNfdQ(s: SparkSession, d: String): DataFrame = {
    val planted = Seq("é", "ﬁé", "Ａ①", "x²")
    val variant = (0 until 4).foldLeft(lit(planted(3))) { (acc, i) =>
      when(col("doc_id") % 4 === i, lit(planted(i))).otherwise(acc)
    }
    val raw = concat(lit("w"), col("doc_id").cast("string"), lit(" "), variant)
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.normalizeUnicode(raw, "NFD").as("clean_nfd"),
      TextAnalysis.normalizeUnicode(raw, "NFKD").as("clean_nfkd"),
      length(TextAnalysis.normalizeUnicode(raw, "NFD")).cast("long")
        .as("n_nfd"),
      length(TextAnalysis.normalizeUnicode(raw, "NFKD")).cast("long")
        .as("n_nfkd"))
  }

  // the boilerplate-laden page each doc is wrapped in for the
  // main-content queries — nav/newsletter/related/footer blocks the
  // extractor must drop, the <p> prose it must keep; ONE LINE in both
  // engines (multi-level stripMargin splicing eats leading pipes)
  private val mcPageHead =
    "<html><head><title>t</title></head><body><nav><a href=\"/\">Home</a> " +
      "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>" +
      "<div>Subscribe to our newsletter!</div><p>"
  private val mcPageTail =
    "</p><div>Related: <a href=\"/r1\">More on this topic from our archive" +
      " pages</a></div><footer><a href=\"/privacy\">Privacy</a> (c) 2026" +
      " graft</footer></body></html>"
  private val mcPageDuck =
    s"'$mcPageHead' || text || '$mcPageTail'"

  /** Main-content extraction ([[TextAnalysis.mainContent]] —
    * length + link-density block scoring, the jusText/readability
    * core): each doc rendered into a page with nav, newsletter,
    * link-dense "related" and footer boilerplate around its prose;
    * the extractor must return exactly the prose block (or nothing
    * for sub-80-char docs). Oracle: the identical block split +
    * per-block scoring replayed via [[TextAnalysis.mainContentDuckSql]].
    */
  private def mainContentQ(s: SparkSession, d: String): DataFrame = {
    val page = concat(lit(mcPageHead), col("text"), lit(mcPageTail))
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.mainContent(page).as("content"),
      length(TextAnalysis.mainContent(page)).cast("long").as("n_chars"))
  }

  private def stripHtmlQ(s: SparkSession, d: String): DataFrame = {
    val html = pageShellCol(col("doc_id"), col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.stripHtml(html).as("clean"),
      length(TextAnalysis.stripHtml(html)).cast("long").as("n_chars"),
      try_element_at(TextAnalysis.extractLinks(html), lit(1)).as("first_link"))
  }

  private val stripHtmlSql =
    s"""WITH h AS (
       |  SELECT doc_id, $duckPageShell AS html
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, html,
       |    ${duckStripHtml("html")} AS clean
       |  FROM h)
       |SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_chars,
       |  CASE WHEN html IS NULL THEN NULL
       |       ELSE regexp_extract(html, '(?i)href\\s*=\\s*"([^"]*)"', 1) END AS first_link
       |FROM s""".stripMargin

  /** Inverted-index build ([[graft.operators.Keywords.invertedIndex]])
    * probed at three vocabulary terms; postings serialize to a
    * comma-joined string for the cell-exact compare (the operator
    * returns the real array).
    */
  private def invertedPostingsQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Keywords.invertedIndex(Tables.documents(s, d), "doc_id", "text")
      .filter(col("token").isin("table", "spark", "scan"))
      .select(col("token"), col("df_block").as("df"),
        array_join(transform(col("postings"), _.cast("string")), ",").as("postings"))

  /** Conjunctive keyword retrieval
    * ([[graft.operators.Keywords.searchAll]]): docs containing all
    * three terms, graded by total query-term occurrences.
    */
  private def invertedSearchQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Keywords.searchAll(
      Tables.documents(s, d), "doc_id", "text", Seq("table", "spark", "scan"))

  /** Link-graph extraction → in-degree ([[TextAnalysis.extractLinks]]
    * + [[graft.operators.Graphs.degrees]]): every doc rendered as a
    * page with two arithmetic outlinks, links parsed back out of the
    * HTML (both engines run a regex extractor over the same string —
    * not the arithmetic shortcut), and in-degree counted per target.
    */
  private def linkDegreeQ(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.documents(s, d).select(
      concat(lit("http://ex.com/d/"), col("doc_id").cast("string")).as("src"),
      explode(TextAnalysis.extractLinks(linkPage)).as("dst"))
    graft.operators.Graphs.degrees(edges)
      .filter(col("in_deg") > 0)
      .select(col("node").as("url"), col("in_deg"))
  }

  /** Per-node triangle counts ([[graft.operators.Graphs
    * .triangleCount]]) over the arithmetic mod-97 link graph (two
    * functional maps per node — corpus-size-independent shape). The
    * oracle replays the SAME degree-oriented wedge-join formulation
    * in SQL, so the count, the orientation tie-breaks, and the
    * zero-fill are all cross-checked.
    */
  private def trianglesQ(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(pmod(col("doc_id"), lit(97L)).as("u"))
    val edges = base.select(col("u").as("src"),
        pmod(col("u") * 7 + 1, lit(97L)).as("dst"))
      .unionAll(base.select(col("u").as("src"),
        pmod(col("u") * 13 + 3, lit(97L)).as("dst")))
    graft.operators.Graphs.triangleCount(edges)
      .select(col("node").cast("long").as("node"), col("triangles"))
  }

  /** Two-outlink page shell: targets `(7·id+1) mod 97` and
    * `(13·id+3) mod 97` — corpus-size-independent, so the graph shape
    * is stable across SFs.
    */
  private def linkPage = concat(
    lit("<html><body><a href=\"http://ex.com/d/"),
    pmod(col("doc_id") * 7 + 1, lit(97)).cast("string"),
    lit("\">a</a> <a href=\"http://ex.com/d/"),
    pmod(col("doc_id") * 13 + 3, lit(97)).cast("string"),
    lit("\">b</a></body></html>"))

  /** PageRank over the same arithmetic link graph
    * ([[graft.operators.Graphs.pageRank]], 5 iterations, DECIMAL mass
    * — bit-deterministic). Oracle-exact: engines' DECIMAL division
    * scales differ, so the twin replays Spark's exact rounding chain
    * in HUGEINT fixed-point — see [[Graphs.pageRankDuckSql]].
    */
  private def pagerankQ(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.documents(s, d).select(
      col("doc_id").as("src"),
      explode(array(
        pmod(col("doc_id") * 7 + 1, lit(97)),
        pmod(col("doc_id") * 13 + 3, lit(97)))).as("dst"))
    graft.operators.Graphs.pageRank(edges, iterations = 5)
      .select(col("node"), Det.round(col("rank").cast("double"), 10).as("rank"))
  }

  /** BM25 ranking ([[graft.operators.Keywords.bm25]]) over the same
    * three query terms as `q_inverted_search` — rational IDF, real tf
    * saturation + length normalization, per-term doubles Det-rounded
    * and summed in DECIMAL so the total is aggregation-order-free.
    * The oracle repeats the EXACT expression tree including the
    * unfolded constants (`1.2 + 1.0`, `1.0 - 0.75`): both engines
    * constant-fold in IEEE doubles, where a hand-folded `2.2` could
    * differ by an ulp from `1.2 + 1.0`.
    */
  private def bm25Q(s: SparkSession, d: String): DataFrame =
    graft.operators.Keywords.bm25(
      Tables.documents(s, d), "doc_id", "text", Seq("table", "spark", "scan"))

  private val bm25Sql =
    s"""WITH ${Keywords.bm25DuckCtes(duckToks("text"),
            Seq("table", "spark", "scan"))}
       |SELECT doc_id, score FROM bm_scores""".stripMargin

  /** Deterministic punctuation for the sentence queries: every run of
    * five words gains a terminator — the corpus is unpunctuated word
    * soup, so the boundary structure is planted identically in both
    * engines (global leftmost non-overlapping replace in RE2 and
    * java.util.regex alike).
    */
  private def punctuated = regexp_replace(
    col("text"), "(\\w+ \\w+ \\w+ \\w+ \\w+) ", "$1. ")

  /** Sentence segmentation ([[TextAnalysis.sentences]]) over the
    * planted-boundary text, one row per sentence in order.
    */
  private def sentencesQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TextAnalysis.sentences(punctuated))
          .as(Seq("seq", "sentence")))
      .withColumn("seq", col("seq").cast("int"))

  /** Sentence-aware greedy chunking
    * ([[TextAnalysis.sentenceChunks]], 20-token budget). Oracle-exact:
    * the greedy fold is pure integer/string arithmetic, so the DuckDB
    * twin replays it with `list_reduce` — see [[sentenceChunksSql]]
    * for the packed-string accumulator that works around DuckDB's
    * broken struct-typed fold state.
    */
  private def sentenceChunksQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TextAnalysis.sentenceChunks(punctuated, maxTokens = 20))
          .as(Seq("chunk_seq", "chunk")))
      .withColumn("chunk_seq", col("chunk_seq").cast("int"))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("chunk")))

  /** DuckDB twin of the [[TextAnalysis.sentenceChunks]] greedy fold.
    *
    * The Spark side folds an `aggregate` over the sentence list with
    * struct state (done chunks, current buffer, token count). DuckDB's
    * `list_reduce` is the matching sequential fold, but its
    * struct-typed accumulators are broken (a list field inside the
    * struct keeps only the last appended element — verified on 1.0.0),
    * so the twin packs the state into ONE VARCHAR:
    * `n CHR(2) cur CHR(2) done-chunks-joined-by-CHR(3)` — control
    * chars that cannot occur in the word corpus. Each step re-parses
    * the fields with `split_part`, applies the identical
    * fits/flush/carry arithmetic (`fits = n + sn <= 20`; a flush moves
    * `cur` onto the done list; an oversized first sentence becomes its
    * own over-budget chunk), and the epilogue appends the non-empty
    * buffer exactly like the Spark finish lambda. Token counts on both
    * sides are whitespace splits with empties removed, so every
    * quantity compared is exact integer/string equality.
    */
  private val sentenceChunksSql =
    """WITH p AS (
      |  SELECT doc_id,
      |    regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g') AS t
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    list_filter(
      |      list_transform(
      |        string_split(
      |          regexp_replace(t, '([.!?])\s+', '\1' || chr(1), 'g'),
      |          chr(1)),
      |        x -> trim(x)),
      |      x -> len(x) > 0) AS ss
      |  FROM p),
      |f AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend('0' || chr(2) || chr(2), ss),
      |      (acc, x) -> CASE
      |        WHEN CAST(split_part(acc, chr(2), 1) AS INTEGER)
      |             + len(list_filter(string_split_regex(trim(x), '\s+'),
      |                               w -> len(w) > 0)) <= 20
      |        THEN CASE
      |          WHEN CAST(split_part(acc, chr(2), 1) AS INTEGER) > 0
      |          THEN CAST(CAST(split_part(acc, chr(2), 1) AS INTEGER)
      |                 + len(list_filter(string_split_regex(trim(x), '\s+'),
      |                                   w -> len(w) > 0)) AS VARCHAR)
      |            || chr(2) || split_part(acc, chr(2), 2) || ' ' || x
      |            || chr(2) || split_part(acc, chr(2), 3)
      |          ELSE CAST(CAST(split_part(acc, chr(2), 1) AS INTEGER)
      |                 + len(list_filter(string_split_regex(trim(x), '\s+'),
      |                                   w -> len(w) > 0)) AS VARCHAR)
      |            || chr(2) || x
      |            || chr(2) || split_part(acc, chr(2), 3)
      |        END
      |        ELSE CAST(len(list_filter(string_split_regex(trim(x), '\s+'),
      |                                  w -> len(w) > 0)) AS VARCHAR)
      |          || chr(2) || x || chr(2)
      |          || CASE WHEN CAST(split_part(acc, chr(2), 1) AS INTEGER) = 0
      |                  THEN split_part(acc, chr(2), 3)
      |                  WHEN split_part(acc, chr(2), 3) = ''
      |                  THEN split_part(acc, chr(2), 2)
      |                  ELSE split_part(acc, chr(2), 3) || chr(3)
      |                       || split_part(acc, chr(2), 2) END
      |      END) AS st
      |  FROM s),
      |c AS (
      |  SELECT doc_id,
      |    list_filter(
      |      string_split(
      |        CASE WHEN CAST(split_part(st, chr(2), 1) AS INTEGER) > 0
      |             THEN CASE WHEN split_part(st, chr(2), 3) = ''
      |                       THEN split_part(st, chr(2), 2)
      |                       ELSE split_part(st, chr(2), 3) || chr(3)
      |                            || split_part(st, chr(2), 2) END
      |             ELSE split_part(st, chr(2), 3) END,
      |        chr(3)),
      |      x -> len(x) > 0) AS cs
      |  FROM f)
      |SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS chunk_seq,
      |  cs[CAST(u.i AS INTEGER)] AS chunk,
      |  CAST(len(list_filter(
      |    string_split_regex(trim(cs[CAST(u.i AS INTEGER)]), '\s+'),
      |    w -> len(w) > 0)) AS INTEGER) AS n_tokens
      |FROM c, unnest(range(1, len(cs) + 1)) AS u(i)""".stripMargin

  /** Corpus-internal novelty profile
    * ([[Dedup.gramNoveltyStats]]): per doc, distinct 30-char-gram
    * counts, how many grams appear in other docs, and the unique
    * fraction in ppm — all integer outputs. Oracle: the md5-gram
    * equality twin the `q_dup_spans` oracle established (only gram
    * EQUALITY matters, so md5 stands in for the rolling hash).
    */
  private def noveltyQ(s: SparkSession, d: String): DataFrame =
    Dedup.gramNoveltyStats(Tables.documents(s, d), "doc_id", "text", l = 30)

  /** Vocabulary coverage / OOV rate
    * ([[TextAnalysis.vocabCoverage]]) against the corpus's own
    * top-64 token vocabulary — integer outputs end-to-end.
    */
  private def vocabCoverageQ(s: SparkSession, d: String): DataFrame =
    TextAnalysis.vocabCoverage(Tables.documents(s, d), "doc_id", "text",
      vocabSize = 64)

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_novelty", noveltyQ, Some(
      """WITH nv_grams AS (
        |  SELECT DISTINCT doc_id,
        |    md5(substr(text, CAST(i AS INTEGER) + 1, 30)) AS h
        |  FROM documents,
        |    unnest(range(0, greatest(length(text) - 30 + 1, 0))) AS u(i)),
        |nv_nd AS (
        |  SELECT h, count(*) AS nd FROM nv_grams GROUP BY 1),
        |nv_stats AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_grams
        |  FROM nv_grams g JOIN nv_nd USING (h) GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(st.n_grams, 0) AS n_grams,
        |  COALESCE(st.shared_grams, 0) AS shared_grams,
        |  CASE WHEN COALESCE(st.n_grams, 0) = 0 THEN NULL
        |       ELSE (st.n_grams - st.shared_grams) * 1000000 // st.n_grams
        |  END AS novelty_ppm
        |FROM documents d LEFT JOIN nv_stats st ON d.doc_id = st.doc_id""".stripMargin),
      headline = true),
    QueryDef("q_vocab_coverage", vocabCoverageQ, Some {
      val toks = duckToks("coalesce(text, '')")
      s"""WITH vc_tok AS (
         |  SELECT doc_id, unnest($toks) AS tok FROM documents),
         |vc_vocab AS (
         |  SELECT tok, 1 AS inv FROM (
         |    SELECT tok, count(*) AS n FROM vc_tok
         |    GROUP BY 1 ORDER BY n DESC, tok LIMIT 64)),
         |vc_stats AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(COALESCE(v.inv, 0)) AS BIGINT) AS in_vocab
         |  FROM vc_tok t LEFT JOIN vc_vocab v USING (tok) GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(st.n_tokens, 0) AS n_tokens,
         |  COALESCE(st.in_vocab, 0) AS in_vocab,
         |  CASE WHEN COALESCE(st.n_tokens, 0) = 0 THEN NULL
         |       ELSE (st.n_tokens - st.in_vocab) * 1000000 // st.n_tokens
         |  END AS oov_ppm
         |FROM documents d LEFT JOIN vc_stats st ON d.doc_id = st.doc_id""".stripMargin
    }),
    QueryDef("q_c4_filters", c4FiltersQ, Some(
      """WITH c4_in AS (
        |  SELECT doc_id,
        |    substr(text, 1, 60) || '.' || chr(10)
        |    || 'enable javascript to continue.' || chr(10)
        |    || 'too short.' || chr(10)
        |    || 'no terminal punctuation here at all' || chr(10)
        |    || 'Another perfectly ordinary sentence with enough words here.' || chr(10)
        |    || text || '.'
        |    || CASE WHEN doc_id % 17 = 0
        |            THEN chr(10) || 'Lorem Ipsum dolor sit amet.' ELSE '' END
        |    || CASE WHEN doc_id % 19 = 0
        |            THEN chr(10) || 'config = { mode: on }.' ELSE '' END AS t
        |  FROM documents),
        |c4_clean AS (
        |  SELECT doc_id,
        |    coalesce(array_to_string(list_filter(
        |      list_filter(string_split(t, chr(10)), l -> len(trim(l)) > 0),
        |      l -> regexp_matches(l, '[.!?"]$')
        |        AND len(string_split_regex(l, '\s+')) >= 5
        |        AND NOT contains(lower(l), 'javascript')), chr(10)), '') AS clean
        |  FROM c4_in)
        |SELECT doc_id, clean,
        |  CAST(len(list_filter(string_split(clean, chr(10)),
        |    l -> len(trim(l)) > 0)) AS BIGINT) AS n_kept,
        |  CASE WHEN len(list_filter(string_split(clean, chr(10)),
        |         l -> len(trim(l)) > 0)) >= 3
        |        AND NOT contains(lower(clean), 'lorem ipsum')
        |        AND NOT contains(clean, '{')
        |       THEN 1 ELSE 0 END AS pass
        |FROM c4_clean""".stripMargin)),
    QueryDef("q_main_content", mainContentQ, Some(
      s"""WITH mc AS (
         |  SELECT doc_id,
         |    ${TextAnalysis.mainContentDuckSql(mcPageDuck)} AS content
         |  FROM documents)
         |SELECT doc_id, content,
         |  CAST(length(content) AS BIGINT) AS n_chars
         |FROM mc""".stripMargin)),
    QueryDef("q_unicode_nfc", unicodeNfcQ, Some(
      """WITH un_in AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' nai' || chr(776) || 've et de'
        |      || chr(769) || 'ja' || chr(768) AS t
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(t) AS clean,
        |  CAST(length(t) AS BIGINT) AS n_before,
        |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_after
        |FROM un_in""".stripMargin)),
    QueryDef("q_unicode_nfkc", unicodeNfkcQ, Some(
      // the CASE table of Unicode-standard compatibility images: the
      // planted inputs' NFKC forms are all ASCII, the composed suffix
      // is caf + chr(233); input codepoint counts are per-variant
      // constants (7,3,6,4,3,6) + 'v'+id+' ' (2+digits) + 6 suffix
      """WITH nk AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 6 AS INTEGER)
        |      WHEN 0 THEN 'file flow' WHEN 1 THEN '123'
        |      WHEN 2 THEN 'Abc123' WHEN 3 THEN 'x2y3'
        |      WHEN 4 THEN 'IXkmm2' ELSE 'ff office' END AS img,
        |    CASE CAST(doc_id % 6 AS INTEGER)
        |      WHEN 0 THEN 7 WHEN 1 THEN 3 WHEN 2 THEN 6
        |      WHEN 3 THEN 4 WHEN 4 THEN 3 ELSE 6 END AS plen
        |  FROM documents)
        |SELECT doc_id,
        |  'v' || CAST(doc_id AS VARCHAR) || ' ' || img || ' caf'
        |    || chr(233) AS clean,
        |  CAST(2 + length(CAST(doc_id AS VARCHAR)) + plen + 6 AS BIGINT)
        |    AS n_before,
        |  CAST(length('v' || CAST(doc_id AS VARCHAR) || ' ' || img
        |    || ' caf' || chr(233)) AS BIGINT) AS n_after
        |FROM nk""".stripMargin)),
    QueryDef("q_unicode_nfd", unicodeNfdQ, Some(
      // chr(769)=combining acute, chr(64257)=fi ligature,
      // chr(65313)=fullwidth A, chr(9312)=circled 1, chr(178)=²
      """WITH nd AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 'e' || chr(769)
        |      WHEN 1 THEN chr(64257) || 'e' || chr(769)
        |      WHEN 2 THEN chr(65313) || chr(9312)
        |      ELSE 'x' || chr(178) END AS img_nfd,
        |    CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 'e' || chr(769)
        |      WHEN 1 THEN 'fie' || chr(769)
        |      WHEN 2 THEN 'A1'
        |      ELSE 'x2' END AS img_nfkd
        |  FROM documents)
        |SELECT doc_id,
        |  'w' || CAST(doc_id AS VARCHAR) || ' ' || img_nfd AS clean_nfd,
        |  'w' || CAST(doc_id AS VARCHAR) || ' ' || img_nfkd AS clean_nfkd,
        |  CAST(length('w' || CAST(doc_id AS VARCHAR) || ' ' || img_nfd)
        |    AS BIGINT) AS n_nfd,
        |  CAST(length('w' || CAST(doc_id AS VARCHAR) || ' ' || img_nfkd)
        |    AS BIGINT) AS n_nfkd
        |FROM nd""".stripMargin)),
    QueryDef("q_strip_html", stripHtmlQ, Some(stripHtmlSql),
      headline = true),
    QueryDef("q_sentences", sentencesQ, Some(
      """WITH p AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g') AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_filter(
        |      list_transform(
        |        string_split(
        |          regexp_replace(t, '([.!?])\s+', '\1' || chr(1), 'g'),
        |          chr(1)),
        |        x -> trim(x)),
        |      x -> len(x) > 0) AS ss
        |  FROM p)
        |SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS seq,
        |  ss[CAST(u.i AS INTEGER)] AS sentence
        |FROM s, unnest(range(1, len(ss) + 1)) AS u(i)""".stripMargin)),
    QueryDef("q_sentence_chunks", sentenceChunksQ, Some(sentenceChunksSql)),
    QueryDef("q_bm25", bm25Q, Some(bm25Sql), headline = true),
    QueryDef("q_link_degree", linkDegreeQ, Some(
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><a href="http://ex.com/d/'
        |    || CAST((doc_id * 7 + 1) % 97 AS VARCHAR)
        |    || '">a</a> <a href="http://ex.com/d/'
        |    || CAST((doc_id * 13 + 3) % 97 AS VARCHAR)
        |    || '">b</a></body></html>' AS html
        |  FROM documents),
        |e AS (
        |  SELECT unnest(regexp_extract_all(html, 'href\s*=\s*"([^"]*)"', 1)) AS url
        |  FROM h)
        |SELECT url, CAST(count(*) AS BIGINT) AS in_deg
        |FROM e GROUP BY url""".stripMargin)),
    QueryDef("q_pagerank", pagerankQ,
      Some(graft.operators.Graphs.pageRankDuckSql(
        """SELECT doc_id AS src,
          |    unnest([(doc_id * 7 + 1) % 97, (doc_id * 13 + 3) % 97]) AS dst
          |  FROM documents""".stripMargin,
        iterations = 5)),
      headline = true),
    QueryDef("q_triangles", trianglesQ, Some(
      """WITH base AS (SELECT doc_id % 97 AS u FROM documents),
        |e0 AS (
        |  SELECT u, (u * 7 + 1) % 97 AS v FROM base
        |  UNION ALL SELECT u, (u * 13 + 3) % 97 FROM base),
        |und AS (
        |  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        |  FROM e0 WHERE u <> v),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node),
        |ori AS (
        |  SELECT
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |      THEN und.u ELSE und.v END AS a,
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |      THEN und.v ELSE und.u END AS b,
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |      THEN dv.deg ELSE du.deg END AS db
        |  FROM und
        |  JOIN deg du ON du.node = und.u
        |  JOIN deg dv ON dv.node = und.v),
        |wed AS (
        |  SELECT e1.a, e1.b AS x, e2.b AS y
        |  FROM ori e1 JOIN ori e2
        |    ON e1.a = e2.a
        |   AND (e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b))),
        |tri AS (
        |  SELECT w.a, w.x, w.y FROM wed w
        |  JOIN ori c ON c.a = w.x AND c.b = w.y),
        |pn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT x FROM tri
        |    UNION ALL SELECT y FROM tri)
        |  GROUP BY node)
        |SELECT CAST(d.node AS BIGINT) AS node,
        |  COALESCE(pn.triangles, CAST(0 AS BIGINT)) AS triangles
        |FROM deg d LEFT JOIN pn ON d.node = pn.node""".stripMargin), headline = true),
    QueryDef("q_inverted_postings", invertedPostingsQ, Some {
      val toks = duckToks("text")
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, token
         |  FROM (SELECT doc_id, unnest($toks) AS token FROM documents))
         |SELECT token, CAST(count(*) AS BIGINT) AS df,
         |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         |FROM tok WHERE token IN ('table', 'spark', 'scan')
         |GROUP BY token""".stripMargin
    }),
    QueryDef("q_inverted_search", invertedSearchQ, Some {
      val toks = duckToks("text")
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS hits
         |FROM tok WHERE token IN ('table', 'spark', 'scan')
         |GROUP BY doc_id
         |HAVING count(DISTINCT token) = 3""".stripMargin
    },
      headline = true),
    QueryDef("q_doc_exact_dedup", exactDedup, Some(
      """SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS canonical_id
        |FROM documents GROUP BY md5(text)""".stripMargin)),
    QueryDef("q_text_stats", textStats, Some(statsSql), headline = true),
    QueryDef("q_quality_score", qualityScore, Some(qualitySql)),
    QueryDef("q_quality_gate", qualityGateQ, Some(qualityGateSql), headline = true),
    QueryDef("q_gopher_repetition", gopherRepetitionQ, Some {
      val toks = duckToks("t")
      s"""WITH rp_lined AS (
         |  SELECT doc_id,
         |    'accept all cookies to continue' || chr(10) || substr(text, 1, 72)
         |      || chr(10) || 'accept all cookies to continue' || chr(10) || text AS t
         |  FROM documents),
         |rp_arr AS (
         |  SELECT doc_id,
         |    list_filter(string_split(t, chr(10)), l -> len(trim(l)) > 0) AS ls,
         |    $toks AS ts
         |  FROM rp_lined),
         |rp_g AS (
         |  SELECT doc_id, ls, ts,
         |    CASE WHEN len(ts) >= 2 THEN list_transform(
         |        range(1, CAST(len(ts) AS BIGINT)),
         |        i -> ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i + 1 AS INTEGER)])
         |      ELSE CAST([] AS VARCHAR[]) END AS g2,
         |    CASE WHEN len(ts) >= 3 THEN list_transform(
         |        range(1, CAST(len(ts) AS BIGINT) - 1),
         |        i -> ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i + 1 AS INTEGER)]
         |          || ' ' || ts[CAST(i + 2 AS INTEGER)])
         |      ELSE CAST([] AS VARCHAR[]) END AS g3
         |  FROM rp_arr),
         |rp_m AS (
         |  SELECT doc_id,
         |    CAST(len(ls) AS BIGINT) AS nl,
         |    CAST(len(ts) AS BIGINT) AS nt,
         |    CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS dupl,
         |    CAST(coalesce(list_sum(list_transform(list_distinct(ls), x ->
         |      (len(list_filter(ls, y -> y = x)) - 1) * length(x))), 0)
         |      AS BIGINT) AS dupchars,
         |    CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
         |      AS BIGINT) AS chars,
         |    CAST(coalesce(list_max(list_transform(g2, b ->
         |      len(list_filter(g2, x -> x = b)))), 0) AS BIGINT) AS c2,
         |    CAST(coalesce(list_max(list_transform(g3, b ->
         |      len(list_filter(g3, x -> x = b)))), 0) AS BIGINT) AS c3
         |  FROM rp_g)
         |SELECT doc_id, nl AS n_lines,
         |  (dupl * 1000000) // greatest(nl, 1) AS dup_line_ppm,
         |  (dupchars * 1000000) // greatest(chars, 1) AS dup_line_char_ppm,
         |  (c2 * 2000000) // greatest(nt, 1) AS top2_ppm,
         |  (c3 * 3000000) // greatest(nt, 1) AS top3_ppm,
         |  CASE WHEN (dupl * 1000000) // greatest(nl, 1) <= 300000
         |        AND (dupchars * 1000000) // greatest(chars, 1) <= 200000
         |        AND (c2 * 2000000) // greatest(nt, 1) <= 200000
         |        AND (c3 * 3000000) // greatest(nt, 1) <= 180000
         |       THEN 1 ELSE 0 END AS pass
         |FROM rp_m""".stripMargin
    }, headline = true),
    QueryDef("q_lang_id", langIdQ, Some(langIdSql)),
    // confusion matrix of the declared `lang` vs the n-gram language
    // id — the model-eval query shape: one scan, one aggregate; the
    // oracle nests the SAME langIdSql prediction
    QueryDef("q_lang_confusion", langConfusionQ, Some(
      s"""WITH pred AS ($langIdSql)
         |SELECT d.lang AS actual, p.lang_pred AS predicted,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM documents d JOIN pred p ON d.doc_id = p.doc_id
         |GROUP BY 1, 2""".stripMargin)),
    QueryDef("q_per_class_metrics",
      (s, d) => graft.operators.Profile.perClassMetrics(langConfusionQ(s, d)),
      Some(
        s"""WITH pred AS ($langIdSql),
           |pc_conf AS (
           |  SELECT d.lang AS actual, p.lang_pred AS predicted,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
           |  GROUP BY 1, 2),
           |pc_a AS (SELECT actual AS label, sum(n) AS support FROM pc_conf GROUP BY 1),
           |pc_p AS (SELECT predicted AS label, sum(n) AS predicted FROM pc_conf GROUP BY 1),
           |pc_tp AS (SELECT actual AS label, n AS tp FROM pc_conf WHERE actual = predicted)
           |SELECT label,
           |  CAST(COALESCE(tp, 0) AS BIGINT) AS tp,
           |  CAST(COALESCE(support, 0) AS BIGINT) AS support,
           |  CAST(COALESCE(p.predicted, 0) AS BIGINT) AS predicted,
           |  CASE WHEN COALESCE(p.predicted, 0) = 0 THEN NULL
           |       ELSE CAST(COALESCE(tp, 0) * 1000000 // p.predicted AS BIGINT)
           |  END AS precision_ppm,
           |  CASE WHEN COALESCE(support, 0) = 0 THEN NULL
           |       ELSE CAST(COALESCE(tp, 0) * 1000000 // support AS BIGINT)
           |  END AS recall_ppm
           |FROM pc_a FULL OUTER JOIN pc_p p USING (label)
           |LEFT JOIN pc_tp USING (label)""".stripMargin)),
    QueryDef("q_doc_fingerprint", fingerprint, Some(
      s"""SELECT doc_id, ${TextAnalysis.fingerprintDuckSql(duckToks("text"))} AS fp
         |FROM documents""".stripMargin)),
    QueryDef("q_minhash_neardup", minhashNeardup, Some(
      s"""WITH ${Dedup.minhashCandDuckCtes(duckToks("text"))}
         |SELECT id_a, id_b, est_jaccard FROM mh_pairs""".stripMargin),
      headline = true),
    QueryDef("q_simhash_neardup", simhashNeardup, Some(
      s"""WITH ${Dedup.simhashCandDuckCtes(duckToks("text"))}
         |SELECT id_a, id_b, hamming FROM sh_pairs""".stripMargin)),
    QueryDef("q_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    QueryDef("q_dedup_docs", dedupDocs, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin),
      headline = true),
    QueryDef("q_dedup_docs_star", dedupDocsStar, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.starPairsDuckCtes()},
         |${Dedup.ccDuckCtes("mh_spairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin)),
    QueryDef("q_warc_ingest", warcIngest, Some(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  'conversion' AS warc_type
        |FROM documents""".stripMargin)),
    QueryDef("q_crawl_curate", crawlCurate, Some(
      s"""WITH RECURSIVE cr_gated AS (
         |  SELECT d.doc_id, d.text
         |  FROM documents d JOIN ($qualityGateSql) qg
         |    ON qg.doc_id = d.doc_id AND qg.pass = 1),
         |${Dedup.minhashCandDuckCtes(duckToks("text"), table = "cr_gated")},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT g.doc_id, CAST(length(g.text) AS BIGINT) AS n_chars,
         |  CASE WHEN (((g.doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
         |       THEN 'train' ELSE 'valid' END AS split
         |FROM cr_gated g LEFT JOIN losers l ON g.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin),
      headline = true),
    QueryDef("q_wet_documents", wetDocumentsQ, Some(
      s"""WITH wd_in AS (
         |  SELECT doc_id, 0 AS k,
         |    '<urn:uuid:graft-' || CAST(doc_id AS VARCHAR) || '>' AS s
         |  FROM documents),
         |${graft.operators.Xxh64Duck.ascii31DuckCtes("wd_in")}
         |SELECT x.h AS doc_id, 'graft.test' AS source,
         |  CAST(length(d.text) AS BIGINT) AS n_chars
         |FROM xs_xh x JOIN documents d ON d.doc_id = x.doc_id""".stripMargin)),
    QueryDef("q_stream_warc_ingest", streamWarcIngest, Some(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  'conversion' AS warc_type
        |FROM documents""".stripMargin)),
    QueryDef("q_robots_filter", robotsFilterQ, Some(
      """WITH u AS (
        |  SELECT doc_id, doc_id % 5 AS k, doc_id % 4 AS p,
        |    '/p' || CAST(doc_id % 4 AS VARCHAR) || '/doc/'
        |      || CAST(doc_id AS VARCHAR) AS path
        |  FROM documents)
        |SELECT doc_id,
        |  'https://s' || CAST(k AS VARCHAR) || '.graft.test' || path AS url,
        |  CAST(CASE
        |    WHEN k = 4 THEN 1
        |    WHEN k = 3 THEN CASE
        |      WHEN p <> 1 THEN 1
        |      WHEN CAST(doc_id AS VARCHAR) LIKE '%33' OR doc_id = 13 THEN 1
        |      ELSE 0 END
        |    WHEN CAST(doc_id AS VARCHAR) LIKE '%77' THEN 1
        |    WHEN CAST(doc_id AS VARCHAR) LIKE '%7%' THEN 0
        |    WHEN p = k THEN CASE WHEN CAST(doc_id AS VARCHAR) LIKE '1%' THEN 1 ELSE 0 END
        |    ELSE 1 END AS INTEGER) AS allowed
        |FROM u""".stripMargin)),
    QueryDef("q_cdx_ingest", cdxIngest, Some(
      """WITH cx AS (
        |  SELECT doc_id, text,
        |    'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.graft.test/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url,
        |    'test,graft,s' || CAST(doc_id % 5 AS VARCHAR) || ')/doc/'
        |      || CAST(doc_id AS VARCHAR) AS surt,
        |    md5(text) AS digest,
        |    CAST(CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS INTEGER) AS status
        |  FROM documents)
        |SELECT surt, '20260101000000' AS ts, url, 'text/html' AS mime, status,
        |  digest, CAST(length(text) AS BIGINT) AS length,
        |  CAST(doc_id * 1000 AS BIGINT) AS offset,
        |  'crawl/seg-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz' AS warc_file
        |FROM cx
        |UNION ALL
        |SELECT surt, '20260101000000', url, 'text/html', status,
        |  digest, CAST(length(text) AS BIGINT),
        |  CAST(doc_id * 1000 + 7 AS BIGINT), 'crawl/seg-x.warc.gz'
        |FROM cx WHERE doc_id % 7 = 0""".stripMargin)),
    QueryDef("q_cdx_fetch_plan", cdxFetchPlan, Some(
      """WITH cx AS (
        |  SELECT doc_id, text,
        |    'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.graft.test/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url,
        |    md5(text) AS digest
        |  FROM documents WHERE doc_id % 13 <> 0),
        |caps AS (
        |  SELECT digest, url,
        |    'crawl/seg-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz' AS warc_file,
        |    CAST(doc_id * 1000 AS BIGINT) AS "offset",
        |    CAST(length(text) AS BIGINT) AS length
        |  FROM cx
        |  UNION ALL
        |  SELECT digest, url, 'crawl/seg-x.warc.gz',
        |    CAST(doc_id * 1000 + 7 AS BIGINT), CAST(length(text) AS BIGINT)
        |  FROM cx WHERE doc_id % 7 = 0),
        |ranked AS (
        |  SELECT digest, url, warc_file, "offset", length,
        |    row_number() OVER (PARTITION BY digest ORDER BY warc_file, "offset") AS rn,
        |    count(*) OVER (PARTITION BY digest) AS nc
        |  FROM caps)
        |SELECT digest, url, warc_file, "offset", length,
        |  CAST(nc AS BIGINT) AS n_copies
        |FROM ranked WHERE rn = 1""".stripMargin)),
    QueryDef("q_cdx_fetch_join", cdxFetchJoin, Some(
      s"""WITH cfj AS (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS clean
         |  FROM documents)
         |SELECT doc_id, CAST(length(clean) AS BIGINT) AS n_chars,
         |  CAST(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 1 END AS BIGINT)
         |    AS n_copies
         |FROM cfj""".stripMargin)),
    QueryDef("q_stream_cdx_fetch", streamCdxFetch, Some(
      s"""WITH scf AS (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS clean
         |  FROM documents)
         |SELECT doc_id, CAST(length(clean) AS BIGINT) AS n_chars
         |FROM scf""".stripMargin)),
    QueryDef("q_polite_fetch", politeFetchQ, Some(
      s"""WITH pf_docs AS (
         |  SELECT doc_id,
         |    's' || CAST(doc_id % 5 AS VARCHAR) || '.graft.test' AS host
         |  FROM documents),
         |pf_caps AS (
         |  SELECT doc_id, host,
         |    'https://' || host || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
         |    TRUE AS good
         |  FROM pf_docs
         |  UNION ALL
         |  SELECT doc_id, host,
         |    'https://' || host || '/bad/' || CAST(doc_id AS VARCHAR), FALSE
         |  FROM pf_docs WHERE doc_id % 11 = 3),
         |pf_sched AS (
         |  SELECT doc_id, host, good,
         |    CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
         |      AS BIGINT) AS slot,
         |    CASE host WHEN 's0.graft.test' THEN 0.5
         |      WHEN 's1.graft.test' THEN 1.0 WHEN 's2.graft.test' THEN 1.5
         |      WHEN 's3.graft.test' THEN 2.0 ELSE NULL END AS delay_s
         |  FROM pf_caps),
         |pf_clean AS (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS clean
         |  FROM documents)
         |SELECT s.doc_id, s.host, s.slot,
         |  CAST(s.slot AS DOUBLE) * coalesce(s.delay_s, 0.0) AS not_before_s,
         |  s.slot AS fetch_seq,
         |  CAST(length(c.clean) AS BIGINT) AS n_chars
         |FROM pf_sched s JOIN pf_clean c ON c.doc_id = s.doc_id
         |WHERE s.good""".stripMargin), headline = true),
    QueryDef("q_crawl_frontier", crawlFrontierQ, Some(
      """WITH cf_base AS (
        |  SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS k,
        |    CAST(doc_id % 4 AS VARCHAR) AS p,
        |    CAST(doc_id AS VARCHAR) AS i
        |  FROM documents),
        |cf_seed AS (
        |  SELECT 'test,graft,s' || k || ')/p' || p || '/doc/' || i AS surt,
        |    'https://s' || k || '.graft.test/p' || p || '/doc/' || i AS url
        |  FROM cf_base
        |  UNION ALL
        |  SELECT 'test,graft,s' || k || ')/p' || p || '/doc/' || i,
        |    'https://S' || k || '.GRAFT.test:443/p' || p || '/doc/' || i
        |  FROM cf_base WHERE doc_id % 9 = 3
        |  UNION ALL
        |  SELECT 'test,graft,shared)/hub', 'https://shared.graft.test/hub'
        |  FROM cf_base WHERE doc_id % 9 = 0),
        |cf_dedup AS (
        |  SELECT surt, min(url) AS url, CAST(count(*) AS BIGINT) AS n_listed
        |  FROM cf_seed GROUP BY surt),
        |cf_fetched AS (
        |  SELECT 'test,graft,s' || k || ')/p' || p || '/doc/' || i AS surt
        |  FROM cf_base WHERE doc_id % 6 = 0),
        |cf_fresh AS (
        |  SELECT d.surt, d.url, d.n_listed
        |  FROM cf_dedup d LEFT JOIN cf_fetched f USING (surt)
        |  WHERE f.surt IS NULL),
        |cf_host AS (
        |  SELECT surt, url, n_listed,
        |    regexp_extract(surt, '^test,graft,([^)]+)\)', 1) AS lbl,
        |    regexp_extract(surt, '\)(.*)$', 1) AS path
        |  FROM cf_fresh),
        |cf_gated AS (
        |  SELECT surt, url, lbl || '.graft.test' AS host, n_listed,
        |    CASE lbl WHEN 's0' THEN 0.5 WHEN 's1' THEN 1.0
        |      WHEN 's2' THEN 1.5 WHEN 's3' THEN 2.0 ELSE NULL END AS delay_s
        |  FROM cf_host
        |  WHERE NOT (lbl IN ('s0', 's1', 's2', 's3')
        |             AND path LIKE '/p2/%'))
        |SELECT surt, url, host, n_listed,
        |  CAST(row_number() OVER (PARTITION BY host ORDER BY surt) - 1
        |    AS BIGINT) AS slot,
        |  CAST(row_number() OVER (PARTITION BY host ORDER BY surt) - 1
        |    AS DOUBLE) * coalesce(delay_s, 0.0) AS not_before_s
        |FROM cf_gated""".stripMargin), headline = true),
    QueryDef("q_frontier_fetch", frontierFetchQ, Some(
      s"""WITH ff_base AS (
         |  SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS k,
         |    CAST(doc_id AS VARCHAR) AS i
         |  FROM documents),
         |ff_rows AS (
         |  -- survives the sitemap-index expansion (depth cap 2:
         |  -- %9==7 docs are listed only by deep_far.xml at depth 3 —
         |  -- never fetched; %9==5 docs ride deep_ok.xml at exactly
         |  -- the cap) AND the frontier AND resolves against the
         |  -- index: not already fetched, not robots-disallowed; the
         |  -- hub seed has no capture and its single-row host drops
         |  -- whole
         |  SELECT doc_id, k, i FROM ff_base
         |  WHERE doc_id % 6 <> 0
         |    AND doc_id % 9 <> 7
         |    AND NOT (k IN ('0', '1', '2', '3') AND i LIKE '1%')),
         |ff_sched AS (
         |  SELECT doc_id, 's' || k || '.graft.test' AS host,
         |    CAST(row_number() OVER (PARTITION BY k ORDER BY i) - 1
         |      AS BIGINT) AS slot,
         |    CASE k WHEN '0' THEN 0.5 WHEN '1' THEN 1.0
         |      WHEN '2' THEN 1.5 WHEN '3' THEN 2.0 ELSE NULL END AS delay_s
         |  FROM ff_rows),
         |ff_clean AS (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS clean
         |  FROM documents)
         |SELECT s.doc_id, s.host, s.slot,
         |  CAST(s.slot AS DOUBLE) * coalesce(s.delay_s, 0.0) AS not_before_s,
         |  s.slot AS fetch_seq,
         |  CAST(length(c.clean) AS BIGINT) AS n_chars
         |FROM ff_sched s JOIN ff_clean c ON c.doc_id = s.doc_id""".stripMargin),
      headline = true),
    QueryDef("q_stream_frontier", streamFrontierQ, Some(
      """WITH sfr_base AS (
        |  SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS k,
        |    CAST(doc_id AS VARCHAR) AS i
        |  FROM documents),
        |sfr_rows AS (
        |  -- lands iff not pre-crawled (%6==0 seeded state) and not
        |  -- robots-disallowed (ids starting 1 on the four publishing
        |  -- hosts); batch = 0 when seeded in tick 1 (even, non-1),
        |  -- else 1 — the tick-2 re-sends of %4==0 evens anti-join
        |  -- against state and land NOWHERE twice
        |  SELECT doc_id, k, i,
        |    CASE WHEN doc_id % 2 = 0 AND i NOT LIKE '1%' THEN 0 ELSE 1 END AS b
        |  FROM sfr_base
        |  WHERE doc_id % 6 <> 0
        |    AND NOT (k IN ('0', '1', '2', '3') AND i LIKE '1%'))
        |SELECT doc_id, 's' || k || '.graft.test' AS host,
        |  CAST(b AS BIGINT) AS batch_id,
        |  CAST(row_number() OVER (PARTITION BY k, b ORDER BY i) - 1
        |    AS BIGINT) AS slot,
        |  CAST(row_number() OVER (PARTITION BY k, b ORDER BY i) - 1
        |    AS DOUBLE) * CASE k WHEN '0' THEN 0.5 WHEN '1' THEN 1.0
        |      WHEN '2' THEN 1.5 WHEN '3' THEN 2.0 ELSE 0.0 END
        |    AS not_before_s,
        |  CAST(row_number() OVER (PARTITION BY k, b ORDER BY i) - 1
        |    AS BIGINT) AS fetch_seq
        |FROM sfr_rows""".stripMargin), headline = true),
    QueryDef("q_stream_crawl_loop", streamCrawlLoopQ, Some(
      """WITH scl AS (
        |  SELECT doc_id, doc_id % 5 AS g, doc_id // 5 AS b,
        |    CAST(doc_id AS VARCHAR) AS i
        |  FROM documents),
        |scl_ok AS (
        |  -- robots allow: host publishes none (g=4) or id not '1…'
        |  SELECT doc_id, g, b, i, (g = 4 OR i NOT LIKE '1%') AS ok
        |  FROM scl),
        |scl_land AS (
        |  -- closed form of the planted BFS lattice: depth = b % 4;
        |  -- a page lands iff IT is allowed and every ancestor on its
        |  -- unique inbound chain landed (rel +5 for depths 1-2, one
        |  -- cross-host hop (g-1, b-1) into depth 3)
        |  SELECT s.doc_id, s.g, s.i, CAST(s.b % 4 AS BIGINT) AS batch
        |  FROM scl_ok s
        |  LEFT JOIN scl_ok p1 ON p1.doc_id = s.doc_id - 5
        |  LEFT JOIN scl_ok p2 ON p2.doc_id = s.doc_id - 10
        |  LEFT JOIN scl_ok c1 ON c1.doc_id = 5 * (s.b - 1) + (s.g + 4) % 5
        |  LEFT JOIN scl_ok c2 ON c2.doc_id = 5 * (s.b - 1) + (s.g + 4) % 5 - 5
        |  LEFT JOIN scl_ok c3 ON c3.doc_id = 5 * (s.b - 1) + (s.g + 4) % 5 - 10
        |  WHERE s.ok AND (
        |    (s.b % 4 = 0) OR
        |    (s.b % 4 = 1 AND p1.ok) OR
        |    (s.b % 4 = 2 AND p1.ok AND p2.ok) OR
        |    (s.b % 4 = 3 AND c1.ok AND c2.ok AND c3.ok)))
        |SELECT doc_id, 's' || CAST(g AS VARCHAR) || '.graft.test' AS host,
        |  batch AS batch_id,
        |  CAST(row_number() OVER (PARTITION BY g, batch ORDER BY i) - 1
        |    AS BIGINT) AS slot,
        |  CAST(row_number() OVER (PARTITION BY g, batch ORDER BY i) - 1
        |    AS DOUBLE) * (CASE g WHEN 0 THEN 0.5 WHEN 1 THEN 1.0
        |      WHEN 2 THEN 1.5 WHEN 3 THEN 2.0 ELSE 0.0 END) AS not_before_s,
        |  CAST(row_number() OVER (PARTITION BY g, batch ORDER BY i) - 1
        |    AS BIGINT) AS fetch_seq
        |FROM scl_land""".stripMargin), headline = true),
    QueryDef("q_frontier_recrawl", frontierRecrawlQ, Some(
      """WITH frc AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS i, doc_id % 5 AS g
        |  FROM documents),
        |frc_land AS (
        |  SELECT doc_id, g, i, CAST(0 AS BIGINT) AS batch
        |  FROM frc WHERE doc_id % 2 = 0
        |  UNION ALL
        |  -- batch 1 re-admissions: TTL-stale pre-crawl entries
        |  -- (%4==1), live entries whose new sitemap lastmod is newer
        |  -- (%8==0), and never-seen docs (%4==3)
        |  SELECT doc_id, g, i, CAST(1 AS BIGINT)
        |  FROM frc WHERE doc_id % 4 = 1 OR doc_id % 8 = 0 OR doc_id % 4 = 3)
        |SELECT doc_id, 's' || CAST(g AS VARCHAR) || '.graft.test' AS host,
        |  batch AS batch_id,
        |  CAST(row_number() OVER (PARTITION BY g, batch ORDER BY i) - 1
        |    AS BIGINT) AS slot,
        |  CAST(row_number() OVER (PARTITION BY g, batch ORDER BY i) - 1
        |    AS DOUBLE) * (CASE g WHEN 0 THEN 0.5 WHEN 1 THEN 1.0
        |      WHEN 2 THEN 1.5 WHEN 3 THEN 2.0 ELSE 0.0 END) AS not_before_s,
        |  CAST(row_number() OVER (PARTITION BY g, batch ORDER BY i) - 1
        |    AS BIGINT) AS fetch_seq
        |FROM frc_land""".stripMargin)),
    QueryDef("q_robots_sitemaps", robotsSitemapsQ, Some(
      """WITH rs AS (
        |  SELECT doc_id,
        |    'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.graft.test/sm/'
        |      || CAST(doc_id AS VARCHAR) AS base,
        |    CAST(doc_id % 4 + 1 AS DOUBLE) + 0.5 AS delay_s
        |  FROM documents)
        |SELECT doc_id, base || sfx AS sitemap, delay_s AS crawl_delay_s
        |FROM rs, unnest(['-a.xml', '-b.xml']) AS u(sfx)""".stripMargin)),
    QueryDef("q_fetch_schedule", fetchScheduleQ, Some(
      """WITH fs_cx AS (
        |  SELECT doc_id, text,
        |    'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.graft.test/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url,
        |    md5(text) AS digest
        |  FROM documents WHERE doc_id % 13 <> 0),
        |fs_caps AS (
        |  SELECT digest, url,
        |    'crawl/seg-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz' AS warc_file,
        |    CAST(doc_id * 1000 AS BIGINT) AS "offset"
        |  FROM fs_cx
        |  UNION ALL
        |  SELECT digest, url, 'crawl/seg-x.warc.gz',
        |    CAST(doc_id * 1000 + 7 AS BIGINT)
        |  FROM fs_cx WHERE doc_id % 7 = 0),
        |fs_plan AS (
        |  SELECT digest, url, warc_file, "offset" FROM (
        |    SELECT digest, url, warc_file, "offset",
        |      row_number() OVER (PARTITION BY digest
        |        ORDER BY warc_file, "offset") AS rn
        |    FROM fs_caps) t WHERE rn = 1),
        |fs_host AS (
        |  SELECT digest, url, warc_file, "offset",
        |    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
        |  FROM fs_plan),
        |fs_delay AS (
        |  SELECT *, CASE host
        |    WHEN 's0.graft.test' THEN 0.5 WHEN 's1.graft.test' THEN 1.0
        |    WHEN 's2.graft.test' THEN 1.5 WHEN 's3.graft.test' THEN 2.0
        |    ELSE NULL END AS delay_s
        |  FROM fs_host)
        |SELECT digest, url, host,
        |  CAST(row_number() OVER (PARTITION BY host
        |    ORDER BY warc_file, "offset") - 1 AS BIGINT) AS slot,
        |  CAST((row_number() OVER (PARTITION BY host
        |    ORDER BY warc_file, "offset") - 1) AS DOUBLE)
        |    * coalesce(delay_s, 0.0) AS not_before_s
        |FROM fs_delay""".stripMargin)),
    QueryDef("q_warc_html_docs", warcHtmlDocs, Some(
      s"""WITH wd_in AS (
         |  SELECT doc_id, 0 AS k,
         |    '<urn:uuid:graft-' || CAST(doc_id AS VARCHAR) || '>' AS s
         |  FROM documents
         |  UNION ALL
         |  SELECT -1, 0, '<urn:uuid:graft-junk-latin>'),
         |${graft.operators.Xxh64Duck.ascii31DuckCtes("wd_in")},
         |wh_clean AS (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS clean
         |  FROM documents)
         |SELECT x.h AS doc_id, 'graft.test' AS source,
         |  CAST(length(c.clean) AS BIGINT) AS n_chars
         |FROM xs_xh x JOIN wh_clean c ON c.doc_id = x.doc_id
         |UNION ALL
         |SELECT x.h, 'graft.test', CAST(4 AS BIGINT)
         |FROM xs_xh x WHERE x.doc_id = -1""".stripMargin)),
    QueryDef("q_warc_main_docs", warcMainDocs, Some(
      s"""WITH wm AS (
         |  SELECT doc_id,
         |    ${TextAnalysis.mainContentDuckSql(s"($duckPageShell)")} AS content
         |  FROM documents)
         |SELECT doc_id, content,
         |  CAST(length(content) AS BIGINT) AS n_chars
         |FROM wm""".stripMargin)),
    QueryDef("q_crawl_robots_curate", warcRobotsCurate, Some(
      s"""WITH RECURSIVE wr_docs AS MATERIALIZED (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS text
         |  FROM documents
         |  WHERE NOT (
         |    (doc_id % 5 <= 2 AND CAST(doc_id AS VARCHAR) NOT LIKE '%77'
         |       AND (CAST(doc_id AS VARCHAR) LIKE '%7%'
         |         OR (doc_id % 4 = doc_id % 5
         |             AND CAST(doc_id AS VARCHAR) NOT LIKE '1%')))
         |    OR (doc_id % 5 = 3 AND doc_id % 4 = 1
         |       AND NOT (CAST(doc_id AS VARCHAR) LIKE '%33' OR doc_id = 13)))),
         |wr_gated AS MATERIALIZED (
         |  SELECT d.doc_id, d.text
         |  FROM wr_docs d JOIN (${qualityGateSqlOver("wr_docs")}) qg
         |    ON qg.doc_id = d.doc_id AND qg.pass = 1),
         |${Dedup.minhashCandDuckCtes(duckToks("text"), table = "wr_gated")},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT g.doc_id, CAST(length(g.text) AS BIGINT) AS n_chars,
         |  CASE WHEN (((g.doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
         |       THEN 'train' ELSE 'valid' END AS split
         |FROM wr_gated g LEFT JOIN losers l ON g.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin),
      headline = true),
    QueryDef("q_warc_html_curate", warcHtmlCurate, Some(
      s"""WITH RECURSIVE wh_docs AS MATERIALIZED (
         |  SELECT doc_id, ${duckStripHtml(s"($duckPageShell)")} AS text
         |  FROM documents),
         |wh_gated AS MATERIALIZED (
         |  SELECT d.doc_id, d.text
         |  FROM wh_docs d JOIN (${qualityGateSqlOver("wh_docs")}) qg
         |    ON qg.doc_id = d.doc_id AND qg.pass = 1),
         |${Dedup.minhashCandDuckCtes(duckToks("text"), table = "wh_gated")},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT g.doc_id, CAST(length(g.text) AS BIGINT) AS n_chars,
         |  CASE WHEN (((g.doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
         |       THEN 'train' ELSE 'valid' END AS split
         |FROM wh_gated g LEFT JOIN losers l ON g.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin),
      headline = true),
    QueryDef("q_warc_main_curate", warcMainCurate, Some(
      s"""WITH RECURSIVE wm_docs AS MATERIALIZED (
         |  SELECT doc_id,
         |    ${TextAnalysis.mainContentDuckSql(s"($duckPageShell)")} AS text
         |  FROM documents),
         |wm_gated AS MATERIALIZED (
         |  SELECT d.doc_id, d.text
         |  FROM wm_docs d JOIN (${qualityGateSqlOver("wm_docs")}) qg
         |    ON qg.doc_id = d.doc_id AND qg.pass = 1),
         |${Dedup.minhashCandDuckCtes(duckToks("text"), table = "wm_gated")},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT g.doc_id, CAST(length(g.text) AS BIGINT) AS n_chars,
         |  CASE WHEN (((g.doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
         |       THEN 'train' ELSE 'valid' END AS split
         |FROM wm_gated g LEFT JOIN losers l ON g.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin),
      headline = true),
    QueryDef("q_dedup_best", dedupBest, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |scored AS (
         |  SELECT c.id, c.component, length(d.text) AS q
         |  FROM cc_comp c JOIN documents d ON d.doc_id = c.id),
         |best AS (SELECT component, max(q) AS bq FROM scored GROUP BY component),
         |keep AS (
         |  SELECT component, min(id) AS keeper
         |  FROM scored JOIN best USING (component) WHERE q = bq
         |  GROUP BY component),
         |losers AS (
         |  SELECT id FROM cc_comp JOIN keep USING (component) WHERE id <> keeper)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin)),
    QueryDef("q_stream_neardup", streamNeardup, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.gateReplayDuckCtes("mh_pairs", exact = false)}
         |SELECT doc_id FROM gate_accept""".stripMargin),
      headline = true),
    QueryDef("q_stream_neardup_star", streamNeardupStar, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.starPairsParityDuckCtes()},
         |${Dedup.gateReplayDuckCtes("mh_pairs", exact = false,
             intraEvenCte = Some("mh_spairs_e"),
             intraOddCte = Some("mh_spairs_o"))}
         |SELECT doc_id FROM gate_accept""".stripMargin),
      headline = true),
    QueryDef("q_stream_video_gate", streamVideoGate, Some(
      s"""WITH RECURSIVE ${Multimodal.videoEnergyPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(doc_id + 5000 AS HUGEINT) AS seed,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2 + 7000
               |              ELSE 0 END AS HUGEINT) AS shseed,
               |    CASE WHEN doc_id < 50 THEN 0 ELSE -1 END AS shfrom,
               |    CASE WHEN doc_id < 50 THEN 30 ELSE 0 END AS shcount
               |  FROM documents WHERE doc_id < 200""".stripMargin)},
         |vg_hs AS (
         |  SELECT doc_id, list(e ORDER BY k) AS hs
         |  FROM vid_en GROUP BY doc_id),
         |${Dedup.minhashPairsFromHsDuckCtes("vg_hs")},
         |vg_univ AS (SELECT doc_id FROM documents WHERE doc_id < 200),
         |${Dedup.gateReplayDuckCtes("mh_pairs", exact = false, table = "vg_univ")}
         |SELECT doc_id FROM gate_accept""".stripMargin)),
    QueryDef("q_stream_video_gate_avi", streamVideoGateAvi, Some(
      s"""WITH RECURSIVE ${Multimodal.videoEnergyAviDuckCtes(
             """SELECT doc_id,
               |    CAST(doc_id + 6000 AS HUGEINT) AS seed,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2 + 8000
               |              ELSE 0 END AS HUGEINT) AS shseed,
               |    CASE WHEN doc_id < 50 THEN 0 ELSE -1 END AS shfrom,
               |    CASE WHEN doc_id < 50 THEN 30 ELSE 0 END AS shcount
               |  FROM documents WHERE doc_id < 120""".stripMargin)},
         |vga_hs AS (
         |  SELECT doc_id, list(e ORDER BY k) AS hs
         |  FROM vav_en GROUP BY doc_id),
         |${Dedup.minhashPairsFromHsDuckCtes("vga_hs")},
         |vga_univ AS (SELECT doc_id FROM documents WHERE doc_id < 120),
         |${Dedup.gateReplayDuckCtes("mh_pairs", exact = false, table = "vga_univ")}
         |SELECT doc_id FROM gate_accept""".stripMargin)),
    QueryDef("q_stream_video_gate_star", streamVideoGateStar, Some(
      s"""WITH RECURSIVE ${Multimodal.videoEnergyPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(doc_id + 5000 AS HUGEINT) AS seed,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2 + 7000
               |              ELSE 0 END AS HUGEINT) AS shseed,
               |    CASE WHEN doc_id < 50 THEN 0 ELSE -1 END AS shfrom,
               |    CASE WHEN doc_id < 50 THEN 30 ELSE 0 END AS shcount
               |  FROM documents WHERE doc_id < 200""".stripMargin)},
         |vgs_hs AS (
         |  SELECT doc_id, list(e ORDER BY k) AS hs
         |  FROM vid_en GROUP BY doc_id),
         |${Dedup.minhashPairsFromHsDuckCtes("vgs_hs")},
         |${Dedup.starPairsParityDuckCtes()},
         |vgs_univ AS (SELECT doc_id FROM documents WHERE doc_id < 200),
         |${Dedup.gateReplayDuckCtes("mh_pairs", exact = false,
             table = "vgs_univ",
             intraEvenCte = Some("mh_spairs_e"),
             intraOddCte = Some("mh_spairs_o"))}
         |SELECT doc_id FROM gate_accept""".stripMargin)),
    QueryDef("q_stream_curate", streamCurateQ,
      Some(streamCurateOracle(exact = false)), headline = true),
    QueryDef("q_stream_curate_exact", streamCurateExactQ,
      Some(streamCurateOracle(exact = true))),
    QueryDef("q_stream_neardup_exact", streamNeardupExact, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.gateReplayDuckCtes("mh_pairs", exact = true)}
         |SELECT doc_id FROM gate_accept""".stripMargin),
      headline = true),
    QueryDef("q_stream_simhash_gate", streamSimhashGate, Some(
      s"""WITH RECURSIVE ${Dedup.simhashCandDuckCtes(duckToks("text"))},
         |${Dedup.gateReplayDuckCtes("sh_pairs", exact = false)}
         |SELECT doc_id FROM gate_accept""".stripMargin)),
    QueryDef("q_stream_simhash_gate_star", streamSimhashGateStar, Some(
      s"""WITH RECURSIVE ${Dedup.simhashCandDuckCtes(duckToks("text"))},
         |${Dedup.starHamming64ParityDuckCtes()},
         |${Dedup.gateReplayDuckCtes("sh_pairs", exact = false,
             intraEvenCte = Some("sh_spairs_e"),
             intraOddCte = Some("sh_spairs_o"))}
         |SELECT doc_id FROM gate_accept""".stripMargin)),
    QueryDef("q_doc_chunks", docChunks, Some {
      val toks = duckToks("text")
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(i // 24 AS INTEGER) AS chunk_id,
         |  array_to_string(toks[i+1 : i+32], ' ') AS chunk_text,
         |  CAST(len(toks[i+1 : i+32]) AS INTEGER) AS n_chunk_tokens
         |FROM t, unnest(range(0, greatest(len(toks), 1), 24)) AS u(i)""".stripMargin
    }),
    QueryDef("q_repetition", repetition, Some(repetitionSql)),
    QueryDef("q_dedup_lines", dedupLinesQ, Some(dedupLinesSql)),
    QueryDef("q_url_dedup", urlDedup, Some(urlDedupSql)),
    QueryDef("q_domain_quota", domainQuotaQ, Some(domainQuotaSql), headline = true),
    QueryDef("q_domain_quota_psl", domainQuotaPslQ, Some(domainQuotaPslSql)),
    QueryDef("q_tfidf_keywords", tfidfKeywords, Some(tfidfSql), headline = true),
    QueryDef("q_redact", redact, Some(
      "SELECT doc_id, regexp_replace(text, '[0-9]+', '#', 'g') AS redacted FROM documents")),
    QueryDef("q_pii_redact", piiRedact, Some(
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        'contact user' || CAST(doc_id AS VARCHAR)
        |          || '@mail.example.org or +61 2 '
        |          || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |          || ' 1234 at 192.168.'
        |          || CAST(doc_id % 256 AS VARCHAR) || '.7 re: ' || text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9][0-9 -]{5,}[0-9]', '<PHONE>', 'g') AS pii_redacted
        |FROM documents""".stripMargin)),
    QueryDef("q_epoch_shuffle", epochShuffle, Some(
      """SELECT doc_id,
        |  ((doc_id % 2147483647) * 2654435761) % 2147483647 AS shuffle_key,
        |  CAST(row_number() OVER (
        |    ORDER BY ((doc_id % 2147483647) * 2654435761) % 2147483647, doc_id)
        |    - 1 AS BIGINT) AS epoch_pos
        |FROM documents""".stripMargin)),
    QueryDef("q_mixture_sample", mixtureSampleQ, Some(
      """SELECT doc_id, source FROM documents
        |WHERE (((doc_id % 2147483647) * 2654435761) % 2147483647)
        |    * (CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 2
        |                   WHEN 'src2' THEN 10 ELSE 4 END)
        |  < CAST(2147483647 AS BIGINT)
        |    * (CASE source WHEN 'src0' THEN 9 WHEN 'src1' THEN 1
        |                   WHEN 'src2' THEN 1 ELSE 1 END)""".stripMargin)),
    QueryDef("q_train_split", trainSplit, Some(
      """SELECT doc_id,
        |  CASE WHEN (((doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
        |       THEN 'train' ELSE 'valid' END AS split
        |FROM documents""".stripMargin)),
    QueryDef("q_pack_sequences", packSequences, Some {
      val toks = duckToks("text")
      s"""SELECT doc_id, len($toks) AS n_tokens,
         |  CAST((sum(len($toks)) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        - len($toks)) // 256 AS BIGINT) AS seq_id
         |FROM documents""".stripMargin
    }),
    QueryDef("q_stratified_sample", stratifiedSample, Some(
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 2147483647) * 2654435761) % 2147483647, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents) t
        |WHERE rn * 5 <= n""".stripMargin)),
    QueryDef("q_token_topk", tokenTopK, Some {
      val toks = duckToks("text")
      s"""SELECT token, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT unnest($toks) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin
    }),
    // The oracle predicts what the real javax.imageio decode must
    // read back from the rendered PNGs (dims + constant-fill mean).
    QueryDef("q_multimodal_meta", multimodalMeta, Some(
      """SELECT doc_id,
        |  CAST(length(text) % 64 + 16 AS BIGINT) AS width,
        |  CAST((length(text) * 7) % 48 + 16 AS BIGINT) AS height,
        |  CAST(doc_id % 256 AS BIGINT) AS px_mean
        |FROM documents""".stripMargin)),
    QueryDef("q_image_neardup", imageNeardup, Some(
      s"""WITH ${Multimodal.dHashPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2
               |              ELSE doc_id + 1000 END AS HUGEINT) AS seed,
               |    CASE WHEN doc_id < 50 AND doc_id % 2 = 1 THEN 4
               |         ELSE 0 END AS delta,
               |    CASE WHEN doc_id < 50 AND doc_id % 2 = 1 THEN doc_id % 72
               |         ELSE -1 END AS flip
               |  FROM documents WHERE doc_id < 200""".stripMargin)},
         |${Dedup.hamming64PairsDuckCtes("im_sigs", "imp_")}
         |SELECT id_a, id_b, hamming FROM imp_pairs""".stripMargin)),
    QueryDef("q_image_dedup", imageDedup, Some(
      s"""WITH RECURSIVE ${Multimodal.dHashPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(CASE WHEN doc_id < 30 THEN doc_id // 3
               |              ELSE doc_id + 2000 END AS HUGEINT) AS seed,
               |    CASE WHEN doc_id < 30 THEN (doc_id % 3) * 4
               |         ELSE 0 END AS delta,
               |    CASE WHEN doc_id < 30 AND doc_id % 3 <> 0
               |         THEN (doc_id % 3) * 20 + doc_id % 13
               |         ELSE -1 END AS flip
               |  FROM documents WHERE doc_id < 150""".stripMargin)},
         |${Dedup.hamming64PairsDuckCtes("im_sigs", "imp_")},
         |${Dedup.ccDuckCtes("imp_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT s.doc_id
         |FROM im_seed s LEFT JOIN losers l ON s.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin)),
    // The oracle predicts the decoded-raster walk on constant fills:
    // r_mean = gray, the g div 32 luminance bin holds every pixel.
    QueryDef("q_image_features", imageFeaturesQ, Some(
      """SELECT doc_id,
        |  CAST(length(text) % 64 + 16 AS BIGINT) AS width,
        |  CAST((length(text) * 7) % 48 + 16 AS BIGINT) AS height,
        |  CAST(doc_id % 256 AS BIGINT) AS r_mean,
        |  array_to_string(list_transform(range(0, 8), i ->
        |    CAST(CASE WHEN i = (doc_id % 256) // 32
        |      THEN (length(text) % 64 + 16) * ((length(text) * 7) % 48 + 16)
        |      ELSE 0 END AS VARCHAR)), ',') AS hist
        |FROM documents""".stripMargin)),
    // The oracle predicts what the real javax.sound decode must read
    // back from the rendered WAVs (constant-magnitude square tone:
    // energy = n_samples * amp^2, all exact integers).
    QueryDef("q_audio_meta", audioMeta, Some(
      """SELECT doc_id,
        |  CAST(doc_id % 7 * 32 + 1600 AS BIGINT) AS n_samples,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST((doc_id % 7 * 32 + 1600)
        |    * (doc_id % 97 * 64 + 128) * (doc_id % 97 * 64 + 128)
        |    AS BIGINT) AS energy
        |FROM documents""".stripMargin)),
    QueryDef("q_audio_neardup", audioNeardup, Some(
      s"""WITH ${Multimodal.aHashPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2
               |              ELSE doc_id + 3000 END AS HUGEINT) AS seed,
               |    CASE WHEN doc_id < 50 AND doc_id % 2 = 1 THEN doc_id % 65
               |         ELSE -1 END AS quiet
               |  FROM documents WHERE doc_id < 200""".stripMargin)},
         |${Dedup.hamming64PairsDuckCtes("au_sigs", "aup_")}
         |SELECT id_a, id_b, hamming FROM aup_pairs""".stripMargin)),
    QueryDef("q_crossmodal_dedup", crossmodalDedup, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Multimodal.dHashPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(CASE WHEN doc_id < 30 THEN doc_id // 3
               |              ELSE doc_id + 2000 END AS HUGEINT) AS seed,
               |    CASE WHEN doc_id < 30 THEN (doc_id % 3) * 4
               |         ELSE 0 END AS delta,
               |    CASE WHEN doc_id < 30 AND doc_id % 3 <> 0
               |         THEN (doc_id % 3) * 20 + doc_id % 13
               |         ELSE -1 END AS flip
               |  FROM documents WHERE doc_id < 150""".stripMargin)},
         |${Dedup.hamming64PairsDuckCtes("im_sigs", "imp_")},
         |un_pairs AS (
         |  SELECT id_a, id_b FROM mh_pairs
         |  UNION
         |  SELECT id_a, id_b FROM imp_pairs),
         |${Dedup.ccDuckCtes("un_pairs")},
         |losers AS (SELECT id FROM cc_comp WHERE id <> component)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |WHERE l.id IS NULL""".stripMargin)),
    QueryDef("q_video_neardup", videoNeardup, Some(
      s"""WITH ${Multimodal.videoEnergyPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(doc_id + 5000 AS HUGEINT) AS seed,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2 + 7000
               |              ELSE 0 END AS HUGEINT) AS shseed,
               |    CASE WHEN doc_id < 50 THEN 0 ELSE -1 END AS shfrom,
               |    CASE WHEN doc_id < 50 THEN 30 ELSE 0 END AS shcount
               |  FROM documents WHERE doc_id < 200""".stripMargin)},
         |vid_sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |           FROM vid_fr GROUP BY 1),
         |vid_blk AS (
         |  SELECT doc_id, e, unnest([g, g + 1]) AS blk
         |  FROM (SELECT f.doc_id, f.e,
         |          length(printf('%b', greatest(s.n, 1))) - 1 AS g
         |        FROM vid_fr f JOIN vid_sz s USING (doc_id))),
         |vid_inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(DISTINCT a.e) AS BIGINT) AS n_inter
         |  FROM vid_blk a JOIN vid_blk b
         |    ON a.blk = b.blk AND a.e = b.e AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT id_a, id_b,
         |    floor(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) * 10000.0 + 0.5)
         |      / 10000.0 AS jaccard
         |  FROM vid_inter
         |  JOIN vid_sz sa ON id_a = sa.doc_id
         |  JOIN vid_sz sb ON id_b = sb.doc_id) t
         |WHERE jaccard >= 0.5""".stripMargin)),
    QueryDef("q_video_neardup_hashed", videoNeardupHashed, Some(
      s"""WITH ${Multimodal.videoHashPatternDuckCtes(
             """SELECT doc_id,
               |    CAST(doc_id + 5000 AS HUGEINT) AS seed,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2 + 7000
               |              ELSE 0 END AS HUGEINT) AS shseed,
               |    CASE WHEN doc_id < 50 THEN 0 ELSE -1 END AS shfrom,
               |    CASE WHEN doc_id < 50 THEN 30 ELSE 0 END AS shcount
               |  FROM documents WHERE doc_id < 200""".stripMargin)},
         |vh_sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |          FROM vh_fr GROUP BY 1),
         |vh_blk AS (
         |  SELECT doc_id, e, unnest([g, g + 1]) AS blk
         |  FROM (SELECT f.doc_id, f.e,
         |          length(printf('%b', greatest(s.n, 1))) - 1 AS g
         |        FROM vh_fr f JOIN vh_sz s USING (doc_id))),
         |vh_inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(DISTINCT a.e) AS BIGINT) AS n_inter
         |  FROM vh_blk a JOIN vh_blk b
         |    ON a.blk = b.blk AND a.e = b.e AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT id_a, id_b,
         |    floor(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) * 10000.0 + 0.5)
         |      / 10000.0 AS jaccard
         |  FROM vh_inter
         |  JOIN vh_sz sa ON id_a = sa.doc_id
         |  JOIN vh_sz sb ON id_b = sb.doc_id) t
         |WHERE jaccard >= 0.5""".stripMargin),
      headline = true),
    QueryDef("q_video_neardup_avi", videoNeardupAvi, Some(
      s"""WITH ${Multimodal.videoEnergyAviDuckCtes(
             """SELECT doc_id,
               |    CAST(doc_id + 6000 AS HUGEINT) AS seed,
               |    CAST(CASE WHEN doc_id < 50 THEN doc_id // 2 + 8000
               |              ELSE 0 END AS HUGEINT) AS shseed,
               |    CASE WHEN doc_id < 50 THEN 0 ELSE -1 END AS shfrom,
               |    CASE WHEN doc_id < 50 THEN 30 ELSE 0 END AS shcount
               |  FROM documents WHERE doc_id < 120""".stripMargin)},
         |vav_sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |           FROM vav_fr GROUP BY 1),
         |vav_blk AS (
         |  SELECT doc_id, e, unnest([g, g + 1]) AS blk
         |  FROM (SELECT f.doc_id, f.e,
         |          length(printf('%b', greatest(s.n, 1))) - 1 AS g
         |        FROM vav_fr f JOIN vav_sz s USING (doc_id))),
         |vav_inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(DISTINCT a.e) AS BIGINT) AS n_inter
         |  FROM vav_blk a JOIN vav_blk b
         |    ON a.blk = b.blk AND a.e = b.e AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT id_a, id_b,
         |    floor(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) * 10000.0 + 0.5)
         |      / 10000.0 AS jaccard
         |  FROM vav_inter
         |  JOIN vav_sz sa ON id_a = sa.doc_id
         |  JOIN vav_sz sb ON id_b = sb.doc_id) t
         |WHERE jaccard >= 0.5""".stripMargin)),
    QueryDef("q_contamination", contaminationQ, Some(contaminationSql), headline = true),
    QueryDef("q_lm_score", lmScoreQ, Some(lmScoreSql), headline = true),
    QueryDef("q_lin_score", linScoreQ, Some(
      s"""SELECT doc_id,
         |  ${Classifier.linearScoreDuckSql(duckToks("coalesce(text, '')"), linWeights, 0.25)}
         |    AS lin_score
         |FROM documents""".stripMargin)),
    QueryDef("q_perceptron_train", perceptronTrainQ, Some(
      s"""WITH $perceptronOracleCtes
         |SELECT CAST(u.f AS INTEGER) AS feature,
         |  CAST(coalesce(w.w, 0) AS BIGINT) AS weight
         |FROM range(0, ${perceptronDim + 1}) AS u(f)
         |LEFT JOIN pt_w$perceptronIters w ON w.f = u.f""".stripMargin),
      headline = true),
    QueryDef("q_perceptron_gate", perceptronGateQ, Some(
      s"""WITH $perceptronOracleCtes,
         |pt_serve AS (
         |  SELECT d.doc_id, coalesce(sum(w.w * d.cnt), 0) AS s
         |  FROM pt_feat d LEFT JOIN pt_w$perceptronIters w USING (f)
         |  GROUP BY d.doc_id)
         |SELECT doc_id, CAST(s AS BIGINT) AS score, s > 0 AS kept
         |FROM pt_serve""".stripMargin)),
    QueryDef("q_perceptron_avg", perceptronAvgQ, Some(
      s"""WITH $perceptronOracleCtes,
         |${Classifier.perceptronAvgDuckCte(perceptronIters)},
         |pt_serve_avg AS (
         |  SELECT d.doc_id, coalesce(sum(w.w * d.cnt), 0) AS s
         |  FROM pt_feat d LEFT JOIN pt_wavg w USING (f)
         |  GROUP BY d.doc_id)
         |SELECT doc_id, CAST(s AS BIGINT) AS score, s > 0 AS kept
         |FROM pt_serve_avg""".stripMargin)),
    QueryDef("q_perceptron_langid", perceptronLangidQ, Some(
      s"""WITH po_docs AS (
         |  SELECT doc_id, lang,
         |    ${TextAnalysis.tokensDuckSql("coalesce(text, '')")} AS toks
         |  FROM documents),
         |${Classifier.perceptronOvrDuckCtes(
              langidClasses, perceptronDim, perceptronIters)},
         |po_serve AS (
         |  SELECT f.doc_id, k.ci, k.c, coalesce(sum(w.w * f.cnt), 0) AS s
         |  FROM po_feat f CROSS JOIN po_cls k
         |  LEFT JOIN po_w$perceptronIters w ON w.ci = k.ci AND w.f = f.f
         |  GROUP BY 1, 2, 3),
         |po_pred AS (
         |  SELECT doc_id, c AS lang_pred, CAST(s AS BIGINT) AS score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY s DESC, ci ASC) AS rn
         |  FROM po_serve)
         |SELECT p.doc_id, p.lang_pred, p.score,
         |  p.lang_pred = d.lang AS correct
         |FROM po_pred p JOIN documents d USING (doc_id)
         |WHERE rn = 1""".stripMargin)),
    QueryDef("q_token_budget", tokenBudgetQ, Some {
      val toks = duckToks("text")
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens,
         |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spent
         |  FROM t)
         |SELECT doc_id, lang, n_tokens FROM c
         |WHERE spent - n_tokens < 5000""".stripMargin
    }),
    QueryDef("q_hll_registers", hllRegistersQ, Some {
      val toks = duckToks("text")
      s"""WITH hp_src AS (
         |  SELECT source, unnest($toks) AS k FROM documents)
         |${Sketches.hllPortableRegistersDuckSql("hp_src", Seq("source"))}""".stripMargin
    }),
    QueryDef("q_stream_hll_registers", streamHllRegistersQ, Some {
      // SAME oracle as q_hll_registers: exact max algebra makes the
      // two-batch streamed state ≡ the one-shot build
      val toks = duckToks("text")
      s"""WITH hp_src AS (
         |  SELECT source, unnest($toks) AS k FROM documents)
         |${Sketches.hllPortableRegistersDuckSql("hp_src", Seq("source"))}""".stripMargin
    }),
    QueryDef("q_curate", curateQ, Some {
      val toks = duckToks("text")
      s"""WITH RECURSIVE cp_gated AS (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM documents d JOIN ($qualityGateSql) qg
         |    ON qg.doc_id = d.doc_id AND qg.pass = 1),
         |${Dedup.minhashCandDuckCtes(toks, table = "cp_gated")},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |cp_kept AS (
         |  SELECT g.doc_id, g.lang,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    ((g.doc_id % 2147483647) * 2654435761) % 2147483647 AS h
         |  FROM cp_gated g LEFT JOIN cc_comp c ON c.id = g.doc_id
         |  WHERE c.component IS NULL OR c.component = g.doc_id),
         |cp_cum AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spent
         |  FROM cp_kept)
         |SELECT doc_id, lang, n_tokens,
         |  CASE WHEN (((doc_id % 2147483647) * 2654435761) % 2147483647) % 100 < 90
         |       THEN 'train' ELSE 'valid' END AS split
         |FROM cp_cum WHERE spent - n_tokens < 5000""".stripMargin
    }, headline = true),
    QueryDef("q_bigram_lift", bigramLiftQ, Some {
      val toks = duckToks("text")
      s"""WITH bl_ts AS (
         |  SELECT $toks AS ts FROM documents),
         |bl_uni AS (SELECT unnest(ts) AS tok FROM bl_ts),
         |bl_ux AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM bl_uni GROUP BY 1),
         |bl_nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM bl_uni),
         |bl_big AS (
         |  SELECT ts[CAST(u.i AS INTEGER)] || ' ' ||
         |    ts[CAST(u.i AS INTEGER) + 1] AS bigram
         |  FROM bl_ts, unnest(range(1, len(ts))) AS u(i)),
         |bl_bx AS (
         |  SELECT bigram, CAST(count(*) AS BIGINT) AS n_xy
         |  FROM bl_big GROUP BY 1),
         |bl_m AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM bl_big),
         |bl_scored AS (
         |  SELECT b.bigram, b.n_xy, x.n AS n_x, y.n AS n_y,
         |    ${graft.functions.Det.roundSql(
                "((CAST(b.n_xy AS DOUBLE) * t.n_tok) * t.n_tok)" +
                  " / ((CAST(m.n_big AS DOUBLE) * x.n) * y.n)", 4)} AS lift
         |  FROM bl_bx b
         |  JOIN bl_ux x ON x.tok = string_split(b.bigram, ' ')[1]
         |  JOIN bl_ux y ON y.tok = string_split(b.bigram, ' ')[2]
         |  CROSS JOIN bl_nt t CROSS JOIN bl_m m
         |  WHERE b.n_xy >= 5)
         |SELECT bigram, n_xy, n_x, n_y, lift FROM bl_scored
         |ORDER BY lift DESC, bigram LIMIT 40""".stripMargin
    }),
    QueryDef("q_stream_token_budget", streamTokenBudgetQ, Some {
      val toks = duckToks("text")
      s"""WITH tb_t AS (
         |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens,
         |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS h
         |  FROM documents),
         |tb_b1 AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM tb_t WHERE doc_id % 2 = 0),
         |tb_a1 AS (
         |  SELECT doc_id, lang, n_tokens FROM tb_b1
         |  WHERE cum - n_tokens < 5000),
         |tb_sp1 AS (
         |  SELECT lang, sum(n_tokens) AS spent FROM tb_a1 GROUP BY 1),
         |tb_b2 AS (
         |  SELECT t.doc_id, t.lang, t.n_tokens,
         |    COALESCE(s.spent, 0)
         |      + sum(t.n_tokens) OVER (PARTITION BY t.lang
         |          ORDER BY t.h, t.doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtot
         |  FROM tb_t t LEFT JOIN tb_sp1 s USING (lang)
         |  WHERE t.doc_id % 2 = 1),
         |tb_a2 AS (
         |  SELECT doc_id, lang, n_tokens FROM tb_b2
         |  WHERE cumtot - n_tokens < 5000)
         |SELECT doc_id, lang, n_tokens FROM tb_a1
         |UNION ALL
         |SELECT doc_id, lang, n_tokens FROM tb_a2""".stripMargin
    }),
    QueryDef("q_leakage_safe_split", leakageSafeSplitQ, Some(
      s"""WITH RECURSIVE ${Dedup.minhashCandDuckCtes(duckToks("text"))},
         |${Dedup.ccDuckCtes("mh_pairs")},
         |base AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN cc_comp c ON d.doc_id = c.id)
         |SELECT doc_id, split_key,
         |  CAST((((split_key % 2147483647) * 2654435761) % 2147483647) % 100
         |    AS BIGINT) AS bucket,
         |  CASE WHEN (((split_key % 2147483647) * 2654435761) % 2147483647) % 100 >= 90
         |    THEN 'valid' ELSE 'train' END AS split
         |FROM base""".stripMargin)),
    QueryDef("q_hard_negatives", hardNegativesQ, Some {
      val toks = duckToks("text")
      s"""WITH hn_tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |hn_tf_all AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM hn_tok GROUP BY 1, 2),
         |hn_df_all AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM hn_tf_all GROUP BY 1),
         |hn_n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |hn_scored AS (
         |  SELECT tf.doc_id, tf.token,
         |    floor(CAST(tf.tf * n.n_docs AS DOUBLE) / dfq.df * 10000.0 + 0.5)
         |      / 10000.0 AS kscore
         |  FROM hn_tf_all tf JOIN hn_df_all dfq USING (token) CROSS JOIN hn_n n),
         |hn_kw AS (
         |  SELECT doc_id AS query_id, token FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY kscore DESC, token) AS r
         |    FROM hn_scored) t
         |  WHERE r <= 3 AND doc_id < 10),
         |hn_lens AS (SELECT doc_id, len($toks) AS dl FROM documents),
         |hn_corpus AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS total_dl
         |  FROM hn_lens),
         |hn_tf AS (
         |  SELECT t.doc_id, t.token, t.tf FROM hn_tf_all t
         |  WHERE t.token IN (SELECT DISTINCT token FROM hn_kw)),
         |hn_dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM hn_tf GROUP BY 1),
         |hn_per AS (
         |  SELECT q.query_id, tf.doc_id,
         |    CAST(floor(
         |      CAST(c.n_docs AS DOUBLE) / dfq.df * (tf.tf * (1.2 + 1.0)) /
         |        (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl
         |          / (CAST(c.total_dl AS DOUBLE) / c.n_docs)))
         |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS score_t
         |  FROM hn_kw q JOIN hn_tf tf USING (token)
         |  JOIN hn_dfq dfq USING (token)
         |  JOIN hn_lens l ON l.doc_id = tf.doc_id
         |  CROSS JOIN hn_corpus c
         |  WHERE tf.doc_id <> q.query_id),
         |hn_scores AS (
         |  SELECT query_id, doc_id AS neg_id, CAST(sum(score_t) AS DOUBLE) AS score
         |  FROM hn_per GROUP BY 1, 2)
         |SELECT query_id, neg_id, score, rank FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neg_id) AS INTEGER) AS rank
         |  FROM hn_scores) t
         |WHERE rank <= 5""".stripMargin
    }, headline = true),
    QueryDef("q_maxsim_rerank", maxsimQ, Some(maxsimSql), headline = true),
    QueryDef("q_score_sweep", scoreSweepQ, Some(
      s"""WITH s AS (
         |  SELECT
         |    ${Classifier.linearScoreDuckSql(duckToks("coalesce(text, '')"), linWeights, 0.25)}
         |      AS score,
         |    (lang = 'en') AS pos
         |  FROM documents),
         |f AS (SELECT * FROM s WHERE score IS NOT NULL AND pos IS NOT NULL),
         |b AS (
         |  SELECT CAST(floor(score * 1000) AS BIGINT) AS bkt,
         |    CAST(count(CASE WHEN pos THEN 1 END) AS BIGINT) AS p,
         |    CAST(count(CASE WHEN NOT pos THEN 1 END) AS BIGINT) AS n
         |  FROM f GROUP BY 1),
         |t AS (
         |  SELECT CAST(sum(p) AS BIGINT) AS tpall,
         |    CAST(sum(n) AS BIGINT) AS fpall
         |  FROM b),
         |c AS (
         |  SELECT bkt,
         |    CAST(sum(p) OVER (ORDER BY bkt DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         |    CAST(sum(n) OVER (ORDER BY bkt DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
         |  FROM b)
         |SELECT c.bkt / 1000.0 AS thr, c.tp, c.fp,
         |  t.tpall - c.tp AS fn, t.fpall - c.fp AS tn
         |FROM c, t""".stripMargin)),
    QueryDef("q_heavy_hitters", heavyHitters, Some {
      val toks = duckToks("text")
      s"""WITH tok AS (SELECT unnest($toks) AS token FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1)
         |SELECT token, n FROM c
         |WHERE n * 200 > (SELECT sum(n) FROM c)""".stripMargin
    }),
    QueryDef("q_cms_tokens", cmsTokensQ,
      Some(graft.operators.Sketches.cmsTokensDuckSql(duckToks("text")))),
    QueryDef("q_dup_spans", dupSpansQ, Some(
      """WITH grams AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    md5(substr(text, CAST(i AS INTEGER) + 1, 30)) AS h
        |  FROM documents,
        |    unnest(range(0, greatest(length(text) - 30 + 1, 0))) AS u(i)),
        |marked AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      count(*) OVER (PARTITION BY h) AS c,
        |      row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        |    FROM grams) t
        |  WHERE c > 1 AND rn > 1),
        |islands AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN max(pos + 30) OVER w IS NULL OR pos > max(pos + 30) OVER w
        |         THEN 1 ELSE 0 END AS newi
        |  FROM marked
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |numbered AS (
        |  SELECT doc_id, pos,
        |    sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM islands),
        |spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + 30 AS e
        |  FROM numbered GROUP BY doc_id, isl),
        |stats AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(e - s) AS BIGINT) AS dup_chars
        |  FROM spans GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(st.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(st.dup_chars, 0) AS BIGINT) AS dup_chars
        |FROM documents d LEFT JOIN stats st ON d.doc_id = st.doc_id""".stripMargin),
      headline = true),
    QueryDef("q_weighted_sample", weightedSampleQ, Some(
      s"""WITH q AS ($qualitySql)
         |SELECT doc_id, quality FROM q
         |WHERE (((doc_id % 2147483647) * 2654435761) % 2147483647)
         |    < quality * 2147483647.0""".stripMargin)),
    QueryDef("q_bpe_tokens", bpeTokensQ, Some(
      Bpe.bpeTokensDuckSql(graft.operators.BpeVocab.merges,
        e => TextAnalysis.tokensDuckSql(e)))),
    QueryDef("q_bpe_roundtrip", bpeRoundtripQ, Some {
      val toks = duckToks("text")
      s"SELECT doc_id, COALESCE(array_to_string($toks, ' '), '') AS decoded FROM documents"
    }),
    QueryDef("q_unigram_tokens", unigramTokensQ, Some(
      graft.operators.Unigram.unigramTokensDuckSql(
        graft.operators.UnigramVocab.vocab,
        graft.operators.UnigramVocab.maxPieceLen,
        e => TextAnalysis.tokensDuckSql(e)))),
    QueryDef("q_unigram_roundtrip", unigramRoundtripQ, Some {
      val toks = duckToks("text")
      s"SELECT doc_id, COALESCE(array_to_string($toks, ''), '') AS fused FROM documents"
    }),
    QueryDef("q_temperature_sample", temperatureSampleQ, Some(
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |mn AS (SELECT min(n) AS mn FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c USING (lang) CROSS JOIN mn
        |WHERE CAST(((d.doc_id % 2147483647) * 2654435761) % 2147483647 AS HUGEINT)
        |    * CAST(((d.doc_id % 2147483647) * 2654435761) % 2147483647 AS HUGEINT)
        |    * n
        |  < CAST(mn AS HUGEINT) * 2147483647 * 2147483647""".stripMargin),
      headline = true),
    QueryDef("q_corpus_line_dedup", corpusLineDedupQ, Some(
      """WITH lined AS (
        |  SELECT doc_id,
        |    substr(text, 1, 60) || chr(10) ||
        |    'graft cookie banner: accept all cookies to continue' || chr(10) ||
        |    text AS text
        |  FROM documents),
        |src AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM lined),
        |lines AS (SELECT doc_id, CAST(u.i AS INTEGER) - 1 AS idx, ls[CAST(u.i AS INTEGER)] AS l
        |  FROM src, unnest(range(1, len(ls) + 1)) AS u(i)),
        |marked AS (SELECT doc_id, idx FROM (
        |    SELECT doc_id, idx,
        |      count(*) OVER (PARTITION BY l) AS c,
        |      row_number() OVER (PARTITION BY l ORDER BY doc_id, idx) AS rn
        |    FROM lines WHERE length(l) >= 5) t
        |  WHERE c > 1 AND rn > 1),
        |kept AS (
        |  SELECT li.doc_id, li.idx, li.l
        |  FROM lines li LEFT JOIN marked m ON li.doc_id = m.doc_id AND li.idx = m.idx
        |  WHERE m.doc_id IS NULL)
        |SELECT l2.doc_id, COALESCE(k.text, '') AS text
        |FROM lined l2 LEFT JOIN (
        |  SELECT doc_id, string_agg(l, chr(10) ORDER BY idx) AS text
        |  FROM kept GROUP BY doc_id) k
        |  USING (doc_id)""".stripMargin),
      headline = true),
    QueryDef("q_multimodal_frames", multimodalFrames, Some(
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
        |    CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS w,
        |    CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(i AS INTEGER) AS frame_idx,
        |  CAST(i * 128 AS BIGINT) AS byte_offset,
        |  CAST((w * 224) // greatest(w, h) AS BIGINT) AS r_width,
        |  CAST((h * 224) // greatest(w, h) AS BIGINT) AS r_height
        |FROM dims,
        |  unnest(range(0, (greatest(n // 32, 1) - 1) // 4 + 1)) AS u(i)""".stripMargin)))
}
