package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch pattern for distinct counting at warehouse scale.
  *
  * The 100 TB problem: "distinct users per X" dashboards re-scan the
  * full history on every refresh. The sketch answer: aggregate each
  * ingest slice ONCE into a per-(group, slice) HLL sketch — a few KB
  * regardless of slice size — persist the sketches as a table, and
  * answer queries by merging sketches (milliseconds over the tiny
  * sketch table, no history re-scan). Union of HLL sketches is exact
  * sketch algebra: merging slice sketches yields byte-wise the same
  * estimator state as sketching the whole history directly, so the
  * serving path loses nothing vs the direct aggregate.
  *
  * Built on Spark's Datasketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`) — codegen-registered
  * aggregates with mergeable partials, the same machinery that makes
  * them associative across partitions.
  */
object Sketches {

  /** One HLL sketch per (groupCols..., sliceCol) cell — the build
    * pass to run per ingest slice (or once over history, grouped by
    * slice) and persist. `lgK` trades size for accuracy (default 12 ≈
    * 2% rel. err, ~4 KB per dense sketch).
    */
  def hllPartials(
      df: DataFrame,
      groupCols: Seq[String],
      sliceCol: String,
      valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge persisted partials down to per-group estimates: the
    * serving-path query. Scans only sketches.
    */
  def hllMerge(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  // ---- Theta sketches (distinct-count SET ALGEBRA) ----
  //
  // HLL answers "how many distinct", but only for unions. Theta
  // sketches (Datasketches) additionally support INTERSECTION and
  // DIFFERENCE — "users who did A and B", "users who did A but never
  // B" — served from per-slice sketches without ever re-scanning or
  // joining the raw history. Same build/persist/merge lifecycle as
  // [[hllPartials]]; everything runs in-plan on Spark's native
  // theta_* functions (mergeable partials, no driver state).

  /** One theta sketch per (groupCols..., sliceCol) cell — the
    * persistable build pass. `lgK` 12 ≈ 3% relative error.
    */
  // ---- Portable HLL: engine-exact register state ----
  //
  // The Datasketches-backed path above is the production default, but
  // its register encoding is library-internal — nothing outside the
  // JVM can check the sketch STATE. This variant rebuilds HyperLogLog
  // from engine-portable pieces (md5 64-bit hash, bucket = top p
  // bits, rho via minimal-binary length — the floor-log2 trick), so
  // the whole register table replays bit-for-bit in SQL: the
  // mergeable state itself is oracle-checkable, which is the property
  // that matters when sketches are persisted and merged across
  // engines. Merge = element-wise MAX of registers (exact algebra,
  // order-independent), identical to building over the union.

  /** Per-group portable-HLL register table: `(groupCols..., bucket,
    * register)` with one row per NON-EMPTY bucket (empty buckets are
    * implicit zeros; `2^p` bounds rows per group). Integer end-to-end:
    * bucket = top `p` bits of the md5-64 hash
    * ([[TextAnalysis.tokenHash64]] of the stringified key), register
    * = max over values of `rho` = leading zeros of the remaining
    * `64-p` bits + 1 (via `length(bin(w))` — minimal binary in both
    * engines). Map-side-combinable max aggregate; merging slice
    * tables is the SAME aggregate over their union.
    */
  def hllPortableRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      key: Column,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"hllPortableRegisters: p=$p outside [4, 16]")
    val w = 64 - p
    val h = TextAnalysis.tokenHash64(key.cast("string"))
    val bucket = shiftrightunsigned(h, w).cast("int")
    val rest = h.bitwiseAND(lit((1L << w) - 1))
    val rho = when(rest === 0, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(rest)).cast("int"))
    df.select((groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("__rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("__rho")).cast("int").as("register"))
  }

  /** Merge portable-HLL register tables: element-wise max per
    * (group, bucket) — exact sketch algebra, so merged slices ≡ one
    * build over the union (spec-pinned). */
  def hllPortableMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("register")).cast("int").as("register"))

  /** Serve a distinct-count estimate from a register table (one group
    * per input row set): the standard HLL estimator with linear
    * counting below `2.5·m`. The ESTIMATE uses `ln` (libm — not
    * engine-portable), so the oracle surface is the register table
    * ([[hllPortableRegisters]]); accuracy is spec-pinned instead
    * (within ~3·1.04/sqrt(m) of exact on real corpora).
    */
  def hllPortableEstimate(registers: DataFrame, p: Int = 12): Double = {
    val m = 1 << p
    val rows = registers.select(col("bucket"), col("register"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val zeros = m - rows.size
    val sum = zeros.toDouble + rows.values.map(r => math.pow(2.0, -r)).sum
    // Small-m bias constants from Flajolet et al. — the asymptotic
    // alpha over-estimates for m < 128 (p <= 6).
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** The DuckDB twin of [[hllPortableRegisters]] over a keyed CTE —
    * keep in lockstep. `srcCte` must expose the group columns and a
    * string `k`; emits a SELECT producing
    * `(groupCols..., bucket, register)`. The unsigned `>>>` is
    * emulated on HUGEINTs (the CLAUDE.md wraparound discipline).
    */
  def hllPortableRegistersDuckSql(
      srcCte: String,
      groupCols: Seq[String],
      p: Int = 12): String = {
    val w = 64 - p
    val h = TextAnalysis.tokenHash64DuckSql("k")
    val hu = s"(CAST($h AS HUGEINT) + CASE WHEN $h < 0 THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END)"
    val grp = groupCols.mkString(", ")
    s"""SELECT $grp,
       |  CAST($hu // ${1L << w} AS INTEGER) AS bucket,
       |  CAST(max(CASE WHEN $hu % ${1L << w} = 0 THEN ${w + 1}
       |    ELSE ${w + 1} - length(bin(CAST($hu % ${1L << w} AS BIGINT)))
       |  END) AS INTEGER) AS register
       |FROM $srcCte
       |GROUP BY $grp, bucket""".stripMargin
  }

  def thetaPartials(
      df: DataFrame,
      groupCols: Seq[String],
      sliceCol: String,
      valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(theta_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Per-group distinct estimates from persisted partials (union
    * merge — the serving path, scans only sketches). `lgK` must
    * match the build ([[thetaPartials]]): a union at a smaller lgK
    * silently DOWNSAMPLES the partials, losing the accuracy the
    * build paid for.
    */
  def thetaMerge(partials: DataFrame, groupCols: Seq[String], lgK: Int = 12): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(theta_sketch_estimate(theta_union_agg(col("sketch"), lit(lgK)))
        .cast("long").as("approx_distinct"))

  /** Set algebra between two groups' audiences: distinct-count
    * estimates of A∩B, A\B, B\A — each group's slices union-merged,
    * then one scalar intersection/difference over the two 1-row
    * sketches (the crossJoin is 1×1). `lgK` must match the build
    * (see [[thetaMerge]]).
    */
  def thetaOverlap(
      partials: DataFrame,
      groupCol: String,
      groupA: String,
      groupB: String,
      lgK: Int = 12): DataFrame = {
    val a = partials.filter(col(groupCol) === groupA)
      .agg(theta_union_agg(col("sketch"), lit(lgK)).as("__sa"))
    val b = partials.filter(col(groupCol) === groupB)
      .agg(theta_union_agg(col("sketch"), lit(lgK)).as("__sb"))
    a.crossJoin(b).select(
      theta_sketch_estimate(theta_intersection(col("__sa"), col("__sb")))
        .cast("long").as("both"),
      theta_sketch_estimate(theta_difference(col("__sa"), col("__sb")))
        .cast("long").as("only_a"),
      theta_sketch_estimate(theta_difference(col("__sb"), col("__sa")))
        .cast("long").as("only_b"))
  }

  // ---- Count-min sketch (frequency serving) ----
  //
  // The frequency sibling: per-slice CMS blobs answer "how often did
  // item X occur" with bounded overestimate (err ≤ eps·N at the given
  // confidence, never under). Build is Spark's native
  // `count_min_sketch` aggregate per slice; serving merges the sketch
  // table on the driver — the same bounded-collect pattern as
  // [[graft.operators.BloomJoin]] — and answers point queries in
  // O(depth).
  //
  // SIZE the eps to the slice count: a blob is
  // `width·depth·8 B` long counters with `width = ceil(2/eps)` and
  // `depth = ceil(log2(1/(1-confidence)))` (Spark's CountMinSketch
  // arithmetic) — at the default (eps 1e-3, confidence .99: width
  // 2 000, depth 7) ≈ 112 KB per slice, so a thousand slices collect
  // ~112 MB on the driver. eps 1e-4 is 10× that (~1.1 MB/blob) —
  // only pair it with few slices, or merge in-plan before
  // collecting.

  /** One CMS blob per slice — the persistable build pass. Blob size
    * = `ceil(2/eps)·ceil(log2(1/(1-confidence)))·8 B` (see object
    * note); the default is ~112 KB.
    */
  def cmsPartials(
      df: DataFrame,
      sliceCol: String,
      valueCol: String,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    df.groupBy(col(sliceCol))
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("sketch"))

  /** Merge persisted CMS partials into one queryable sketch — IN
    * PLAN: the union runs as partial/final aggregation on the
    * executors ([[graft.functions.CmsUnionExpr]]; CMS union is
    * cell-wise addition, so the merge tree is associative), and only
    * the single merged blob reaches the driver — never one blob per
    * slice (a thousand slices at the default config would otherwise
    * collect ~112 MB).
    */
  def cmsMerge(partials: DataFrame): org.apache.spark.util.sketch.CountMinSketch = {
    val merged = partials
      .agg(graft.functions.CmsUnionExpr.cmsUnion(col("sketch")).as("merged"))
      .head.getAs[Array[Byte]]("merged")
    require(merged != null,
      "cmsMerge: no CMS partials to merge — nothing was sketched (empty slice table)")
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(merged))
  }

  /** DuckDB twin of the whole [[cmsPartials]]→[[cmsMerge]]→
    * `estimateCount` serving path for STRING items — what flips
    * `q_cms_tokens` from rows-only to hash-exact.
    *
    * Three facts make a SQL twin possible:
    *
    *  1. CMS union is cell-wise addition, so per-slice partials merged
    *     then queried ≡ one global sketch over all occurrences — the
    *     oracle never materializes per-slice tables, just
    *     `cell(i, b) = Σ count(token) · [bucket_i(token) = b]`.
    *  2. Spark's string bucket derivation
    *     (`CountMinSketchImpl.getHashBuckets`, verified from
    *     bytecode + a reflection probe) is seed-independent double
    *     hashing: `h1 = murmur3_x86_32(bytes, 0)`,
    *     `h2 = murmur3_x86_32(bytes, h1)`,
    *     `bucket_i = abs((h1 + i·h2) mod width)` in SIGNED 32-bit
    *     arithmetic — Java's truncating `%` is DuckDB's `%`, and the
    *     estimate is the min of the depth cells.
    *  3. The sketch library's murmur variant mixes the unaligned TAIL
    *     bytes one SIGN-EXTENDED byte at a time through the full
    *     k1/h1 mix (unlike reference murmur3's tail accumulation), so
    *     the fold is uniform: 4-byte little-endian words, then tail
    *     bytes, then `fmix(len)`.
    *
    * The 32-bit wraparound ops run on HUGEINTs in [0, 2^32) (`xor`
    * via BIGINT casts — every value fits; `rotl r` as
    * `x·2^r mod 2^32 + x ÷ 2^(32−r)`), folded per token with
    * `list_reduce`. Byte extraction uses `ord` per character, exact
    * for the pure-ASCII corpus (verified ≤ 0x79 at every SF) — a
    * non-ASCII token would need BLOB byte access instead. Verified ≡
    * `java.lang.Integer` murmur semantics against a JVM
    * `getHashBuckets` reflection probe before being frozen here.
    *
    * `depth`/`width` must match the build's eps/confidence
    * (`width = ceil(2/eps)`, `depth = ceil(log2(1/(1−confidence)))` —
    * the defaults 0.001/0.99 give 7 × 2000, probe-confirmed).
    */
  def cmsTokensDuckSql(
      toksExpr: String,
      probeLimit: Int = 20,
      depth: Int = 7,
      width: Int = 2000): String = {
    val w32 = "4294967296"
    def xor32(a: String, b: String): String =
      s"CAST(xor(CAST($a AS BIGINT), CAST($b AS BIGINT)) AS HUGEINT)"
    def rotl(x: String, r: Int): String =
      s"(($x) * ${1L << r} % $w32 + ($x) // ${1L << (32 - r)})"
    def mixK1(w: String): String =
      s"(${rotl(s"(($w) * 3432918353 % $w32)", 15)} * 461845907 % $w32)"
    def mixH1(h: String, k1: String): String =
      s"(${rotl(xor32(h, k1), 13)} * 5 % $w32 + 3864292196) % $w32"
    def murmurCtes(src: String, keep: Seq[String], seedExpr: String,
        out: String, p: String): String = {
      val k = keep.mkString(", ")
      s"""${p}g AS (
         |  SELECT $k, len, hws,
         |    list_reduce(list_prepend(CAST($seedExpr AS HUGEINT), hws),
         |      (h, w) -> ${mixH1("h", mixK1("w"))}) AS g
         |  FROM $src),
         |${p}fa AS (SELECT $k, len, hws, ${xor32("g", "len")} AS f FROM ${p}g),
         |${p}fb AS (SELECT $k, len, hws, ${xor32("f", "f // 65536")} AS f FROM ${p}fa),
         |${p}fc AS (SELECT $k, len, hws, f * 2246822507 % $w32 AS f FROM ${p}fb),
         |${p}fd AS (SELECT $k, len, hws, ${xor32("f", "f // 8192")} AS f FROM ${p}fc),
         |${p}fe AS (SELECT $k, len, hws, f * 3266489909 % $w32 AS f FROM ${p}fd),
         |${p}out AS (SELECT $k, len, hws, ${xor32("f", "f // 65536")} AS $out FROM ${p}fe)""".stripMargin
    }
    s"""WITH tok_occ AS (
       |  SELECT unnest($toksExpr) AS token FROM documents),
       |tok_cnt AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok_occ GROUP BY token),
       |tok_words AS (
       |  SELECT token, n, CAST(length(token) AS HUGEINT) AS len,
       |    list_concat(
       |      list_transform(range(0, (length(token) - length(token) % 4) // 4), j ->
       |        CAST(ord(token[CAST(4*j+1 AS INTEGER)])
       |          + ord(token[CAST(4*j+2 AS INTEGER)]) * 256
       |          + ord(token[CAST(4*j+3 AS INTEGER)]) * 65536
       |          + ord(token[CAST(4*j+4 AS INTEGER)]) * 16777216 AS HUGEINT)),
       |      list_transform(range(length(token) - length(token) % 4, length(token)), j ->
       |        CAST(CASE WHEN ord(token[CAST(j+1 AS INTEGER)]) >= 128
       |                  THEN 4294967040 + ord(token[CAST(j+1 AS INTEGER)])
       |                  ELSE ord(token[CAST(j+1 AS INTEGER)]) END AS HUGEINT))) AS hws
       |  FROM tok_cnt),
       |${murmurCtes("tok_words", Seq("token", "n"), "0", "h1", "m1")},
       |${murmurCtes("m1out", Seq("token", "n", "h1"), "h1", "h2", "m2")},
       |tok_buck AS (
       |  SELECT token, n, i,
       |    abs(CASE WHEN tv >= 2147483648 THEN tv - $w32 ELSE tv END
       |        % $width) AS bkt
       |  FROM (
       |    SELECT token, n, u.i AS i,
       |      (h1 + CAST(u.i AS HUGEINT) * h2) % $w32 AS tv
       |    FROM m2out, unnest(range(0, $depth)) AS u(i)) s),
       |cells AS (
       |  SELECT i, bkt, SUM(n) AS cnt FROM tok_buck GROUP BY i, bkt),
       |top AS (
       |  SELECT token, n FROM tok_cnt
       |  ORDER BY n DESC, token LIMIT $probeLimit)
       |SELECT t.token, t.n AS exact_n, CAST(MIN(cl.cnt) AS BIGINT) AS cms_est
       |FROM top t
       |JOIN tok_buck b ON b.token = t.token
       |JOIN cells cl ON cl.i = b.i AND cl.bkt = b.bkt
       |GROUP BY t.token, t.n""".stripMargin
  }

  //
  // The quantile sibling of the HLL pattern: per-slice bin-count
  // vectors whose merge is element-wise addition — EXACT sketch
  // algebra (unlike HLL there is no estimator state; merged partials
  // equal the direct histogram by arithmetic identity), so the whole
  // path is oracle-checkable. Quantiles read off the cumulative
  // histogram with bin-width resolution: error bounded by
  // (hi-lo)/bins, fixed a priori — the right trade when the domain is
  // known (prices, latencies, scores).

  /** Bin index in [0, bins): equi-width over [lo, hi], out-of-domain
    * values clamped into the edge bins. Pure arithmetic — both
    * engines compute identical IEEE doubles, so bin assignment is
    * engine-exact.
    */
  def histBin(v: Column, lo: Double, hi: Double, bins: Int): Column =
    least(greatest(
      floor((v - lit(lo)) / lit(hi - lo) * bins).cast("int"), lit(0)),
      lit(bins - 1))

  /** One `bins`-length count vector per (groupCols..., sliceCol) cell:
    * the persistable build pass. Single shuffle; the bin is staged
    * once and the vector is `bins` conditional counts in one
    * aggregate.
    */
  def histogramPartials(
      df: DataFrame,
      groupCols: Seq[String],
      sliceCol: String,
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int = 32): DataFrame =
    df.withColumn("__bin", histBin(col(valueCol), lo, hi, bins))
      .groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(array((0 until bins).map(i =>
        count(when(col("__bin") === i, 1))): _*).as("hist"))

  /** Element-wise sum of slice vectors per group — the serving-path
    * merge, exact by construction.
    */
  def histogramMerge(
      partials: DataFrame, groupCols: Seq[String], bins: Int = 32): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(array((0 until bins).map(i =>
        sum(element_at(col("hist"), i + 1))): _*).as("hist"))

  /** Quantile `q` from a merged histogram: the UPPER edge of the
    * first bin where the cumulative count reaches `ceil(q·total)` —
    * deterministic, resolution (hi-lo)/bins. NULL for an empty
    * histogram. O(bins²) per group row — group cardinality, not data
    * volume.
    */
  def histogramQuantile(
      hist: Column, lo: Double, hi: Double, bins: Int, q: Double): Column = {
    val total = aggregate(hist, lit(0L), (a, x) => a + x)
    val target = ceil(lit(q) * total).cast("long")
    val idx = element_at(
      filter(
        sequence(lit(0), lit(bins - 1)),
        i => aggregate(slice(hist, lit(1), i + 1), lit(0L), (a, x) => a + x)
          >= target),
      1)
    when(total === 0, lit(null).cast("double"))
      .otherwise(lit(lo) + (idx + 1).cast("double") * lit((hi - lo) / bins))
  }
}
