package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the first pass of every web-crawl
  * training pipeline: the same page arrives under scheme/host case
  * variants, tracking parameters, fragments, default ports, and
  * trailing slashes; normalize first or exact-dedup undercounts.
  *
  * Pure codegen'd `regexp_replace`/`regexp_extract` chains (no UDF):
  * normalizing 100 TB of URLs is a map-only pass, and the dedup is
  * one hash aggregation on the normalized key. Every regex is
  * mirrored verbatim in the DuckDB oracle (`TextQueries`), which is
  * what keeps the cross-engine check exact.
  */
object Urls {

  /** scheme://authority prefix (no path/query/fragment). */
  private val HeadRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Canonical form:
    *  1. fragment stripped (`#...`);
    *  2. scheme + authority lowercased; explicit default ports
    *     (`:80`, `:443`) dropped;
    *  3. tracking params removed (`utm_*`, `fbclid`, `gclid`) —
    *     anchored to a `?`/`&` separator so params that merely end
    *     in a tracking name (`myfbclid=1`) are untouched — with
    *     separator cleanup (`&&`→`&`, `?&` → `?`, dangling `?`/`&`
    *     dropped);
    *  4. trailing slashes stripped.
    * Path and non-tracking query params keep their case (per RFC 3986
    * only scheme/host are case-insensitive).
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val head   = regexp_extract(noFrag, HeadRe, 0)
    val tail   = regexp_replace(noFrag, HeadRe, "")
    val headN  = regexp_replace(lower(head), ":(80|443)$", "")
    val tailP  = regexp_replace(tail, "([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "$1")
    val tailN  = regexp_replace(
      regexp_replace(regexp_replace(tailP, "&&+", "&"), "\\?&", "?"),
      "[?&]+$", "")
    regexp_replace(concat(headN, tailN), "/+$", "")
  }

  /** Lowercased host of a URL: the authority with userinfo and port
    * stripped (per RFC 3986 the host is case-insensitive). Empty
    * string when the input has no `scheme://` head.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** SURT (Sort-friendly URI Reordering Transform) key — the index
    * key of the web-archive world (Common Crawl CDX files key every
    * capture by it): host labels REVERSED and comma-joined so one
    * domain's captures sort contiguously (`org,example,sub)/path`),
    * then `)` and the path+query. Simplified-standard
    * canonicalization: everything lowercased, `www.` folded, scheme /
    * userinfo / default port dropped, fragment dropped. Map-only
    * column arithmetic (split + reverse + join), no UDF; empty string
    * for inputs with no `scheme://` head (same contract as [[host]]).
    */
  def surt(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val tail = lower(regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1),
      "/+$", ""))
    when(h === "", lit(""))
      .otherwise(concat(
        array_join(reverse(split(h, "\\.")), ","), lit(")"), tail))
  }

  /** Host back out of a [[surt]] key: the comma-joined reversed
    * labels before `)` re-reversed and dot-joined
    * (`org,example,sub)/p` → `sub.example.org`). The canonical
    * (lowercased, `www`-folded) host by construction — what frontier
    * robots/schedule decisions key on.
    */
  def hostFromSurt(surt: Column): Column =
    array_join(reverse(split(substring_index(surt, ")", 1), ",")), ".")

  /** Path+query back out of a [[surt]] key: everything after the
    * first `)` (lowercased, trailing-slash-stripped by the surt
    * construction). The other half of the inverse, owned here with
    * [[hostFromSurt]] so SURT-format knowledge never leaks into
    * consumers.
    */
  def pathFromSurt(surt: Column): Column =
    regexp_extract(surt, "\\)(.*)$", 1)

  /** RFC 3986 §5 relative-reference resolution, as pure column
    * arithmetic (round 18 — the r17 verdict's link-discovery task:
    * fetched pages' own `href`s re-entering the frontier need
    * resolving against the page's base URI before the SURT fold).
    * Returns the ABSOLUTE http(s) URL, or `''` for references a
    * crawler never follows — the empty string is this module's
    * established "not a crawlable URL" value ([[host]]/[[surt]]):
    *
    *  - absolute `http://`/`https://` refs pass through unchanged
    *    (their own dot segments are preserved — archive indexes key
    *    the spelling the author linked);
    *  - non-http schemes (`mailto:`, `javascript:`, `data:`, `ftp:`)
    *    → `''`;
    *  - protocol-relative `//host/p` takes the base's scheme;
    *  - root-relative `/p`, query-only `?q`, and relative paths merge
    *    per §5.3, with §5.2.4 dot-segment removal ([[removeDotSegments]]);
    *  - empty refs and fragment-only refs (`#sec` — same document)
    *    → `''`; fragments on any ref are stripped first (§5.1: a
    *    fragment never names a different resource);
    *  - an unresolvable base (no `scheme://` head) → `''`.
    */
  def resolve(base: Column, ref: Column): Column = {
    val r = regexp_replace(ref, "#.*", "")
    val head = regexp_extract(base, HeadRe, 0)
    val scheme = lower(regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    // base path WITHOUT query (§5.3 merge uses the path component)
    val basePath = regexp_replace(
      regexp_replace(regexp_replace(base, "#.*", ""), HeadRe, ""),
      "\\?.*", "")
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    when(head === "" || r === "", lit(""))
      .when(r.rlike("^(?i)https?://"), r)
      .when(r.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), lit(""))
      .when(r.startsWith("//"), concat(scheme, lit(":"), r))
      .when(r.startsWith("/"), concat(head, removeDotSegments(r)))
      .when(r.startsWith("?"), concat(head,
        when(basePath === "", lit("/")).otherwise(basePath), r))
      .otherwise(concat(head, removeDotSegments(concat(
        when(baseDir === "", lit("/")).otherwise(baseDir), r))))
  }

  /** RFC 3986 §5.2.4 dot-segment removal over a rooted path (always
    * starts `/` at the [[resolve]] call sites). Column-arithmetic
    * restatement of the stack algorithm: `/./` collapses (two global
    * passes — adjacent occurrences overlap a single pass), then each
    * pass removes one non-`..` segment followed by `/../` — DEPTH
    * BOUND 8 per pass count (a 9-deep `../` chain keeps its residue;
    * real-world hrefs exhaust at 2–3), then leading `/../` runs clamp
    * at the root per the RFC.
    */
  private[graft] def removeDotSegments(p: Column): Column = {
    val d1 = regexp_replace(regexp_replace(p, "/\\./", "/"), "/\\./", "/")
    val d2 = regexp_replace(d1, "/\\.$", "/")
    val up = "/(?!\\.\\.(?:/|$))[^/]+/\\.\\.(?:/|$)"
    val folded = (1 to 8).foldLeft(d2)((c, _) => regexp_replace(c, up, "/"))
    val clamped = regexp_replace(folded, "^(?:/\\.\\.)+(?:/|$)", "/")
    when(clamped === "", lit("/")).otherwise(clamped)
  }

  /** Site key for per-domain policies: [[host]] with a leading
    * `www.` stripped. True eTLD+1 grouping needs the public-suffix
    * list (a data file, not an algorithm); the `www` fold covers the
    * dominant alias class and keeps the key a pure regex — use
    * [[Psl.withRegistrableDomain]] (or `domainQuota(usePsl = true)`)
    * when operating on real crawl data.
    */
  def registrableDomain(url: Column): Column =
    regexp_replace(host(url), "^www\\.", "")

  /** Per-domain quota — the standard web-corpus curation cut: keep
    * at most `k` documents per registrable domain, best quality
    * first (ties on the rounded score broken by id ascending, so the
    * cut is fully deterministic).
    *
    * The grouping key is [[registrableDomain]] (pure-regex `www.`
    * fold) by default; `usePsl = true` switches to the real
    * public-suffix-list resolution ([[Psl.withRegistrableDomain]]) so
    * subdomains (`news.example.com`) and two-level TLDs
    * (`example.com.au`) stop fragmenting the quota key — the correct
    * setting on real crawl data, at the cost of one extra
    * distinct-host broadcast join.
    *
    * Rides [[Relational.topKPerGroup]]'s bounded-heap aggregate: each
    * map partition ships at most k rows per domain (score-desc heap),
    * so a mega-domain (a crawl is Zipf over domains too) costs k rows
    * on the shuffle, not its full document count — the window-rank
    * formulation would sort every doc of the hottest domain in one
    * task. Returns `(domain, rank, doc_id, quality)`.
    */
  def domainQuota(
      docs: DataFrame,
      idCol: String,
      urlCol: String,
      scoreCol: String,
      k: Int,
      usePsl: Boolean = false): DataFrame = {
    val keyed =
      if (usePsl)
        Psl.withRegistrableDomain(
          docs.select(col(idCol), col(urlCol), col(scoreCol)), urlCol, "domain")
          .select(col(idCol), col("domain"), col(scoreCol))
      else
        docs.select(
          col(idCol), registrableDomain(col(urlCol)).as("domain"), col(scoreCol))
    Relational.topKPerGroup(keyed, Seq("domain"), col(scoreCol), col(idCol), k)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("score", scoreCol)
  }

  /** Exact dedup on the canonical URL: one row per normalized URL
    * with its copy count and the smallest id as the deterministic
    * canonical representative. Single hash-shuffle on the normalized
    * key (map-side partial agg collapses copies before the exchange).
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("norm_url"))
      .groupBy("norm_url")
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"))
}
