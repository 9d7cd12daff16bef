package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl frontier construction — the operator BETWEEN the crawl
  * stack's two ends: discovery hands over seed URLs (sitemap `<loc>`
  * lists, the [[Robots.sitemaps]] feed), the fetch side consumes a
  * politeness schedule ([[graft.sources.Cdx.schedule]] →
  * [[graft.sources.Warc.fetchScheduled]]); this builds the one from
  * the other. Round-16 closing of the r15 verdict's missing-operator
  * finding.
  *
  * Pipeline: canonicalize every seed to its SURT key ([[Urls.surt]] —
  * case/`www`/default-port/fragment folds, so raw URL variants of one
  * page collapse), dedup cross-listings (many sitemaps advertise the
  * same URL; one hash aggregate keyed by SURT keeps the deterministic
  * min raw URL + the listing count), anti-join the already-fetched
  * state, gate through robots ([[Robots.rulesFor]]/[[Robots
  * .isAllowed]] over the FOLDED host+path — the raw-variant URL the
  * dedup kept must not dodge its host's rules through case tricks),
  * and lay the survivors out politely ([[graft.sources.Cdx.schedule]]
  * spaced by each host's [[Robots.crawlDelay]]).
  *
  * Scale shape: the dedup is one hash aggregate with map-side
  * partials (seed streams are crawl-sized); the state anti-join
  * shuffles SURT keys only; the robots table is host-cardinality and
  * broadcasts; the schedule is one keyed window per host — the
  * natural parallelism unit of polite fetching. Nothing quadratic,
  * no global sort, no payload bytes anywhere.
  */
object Frontier {

  /** `<loc>` URLs of a sitemap XML body, in file order (empty array
    * when none) — one case-insensitive anchored extract-all, pure
    * column arithmetic like [[Robots.sitemaps]]. Handles whitespace
    * padding inside the element (the spec allows it); nested
    * sitemap-index files list `.xml` locs, which callers feed back
    * through their sitemap fetch loop.
    */
  def sitemapLocs(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<loc>\\s*(\\S+?)\\s*</loc>"), lit(1))

  /** Build the frontier from seed URLs (see object doc). Output:
    * `(surt, url, host, n_listed, slot, not_before_s)` — `url` is the
    * deterministic min raw spelling among the seed's listings, `host`
    * the SURT-folded host, `slot`/`not_before_s` the per-host polite
    * fetch layout ordered by SURT key.
    *
    *  - `seeds(urlCol)`: raw seed URLs (duplicates welcome);
    *  - `fetched(fetchedKeyCol)`: SURT keys already crawled;
    *  - `robots(hostCol, bodyCol)`: one robots.txt body per host
    *    (hosts absent ⇒ allowed, unspaced).
    */
  def build(
      seeds: DataFrame,
      urlCol: String,
      fetched: DataFrame,
      fetchedKeyCol: String,
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val keyed = seeds
      .select(Urls.surt(col(urlCol)).as("surt"), col(urlCol).as("__u"))
      .filter(col("surt") =!= "") // schemeless junk never enters
      .groupBy("surt")
      .agg(min(col("__u")).as("url"), count(lit(1)).as("n_listed"))
    val fresh = keyed.join(
      fetched.select(col(fetchedKeyCol).as("surt")).distinct(),
      Seq("surt"), "left_anti")
    // host + path from the SURT key, not the kept raw URL: the min()
    // pick may be a case/port variant, and robots decisions must bind
    // to the canonical host
    val path = Urls.pathFromSurt(col("surt"))
    val rb = robots.select(
      col(hostCol).as("__rb_host"),
      Robots.rulesFor(col(bodyCol), agent).as("__rb_rules"),
      Robots.crawlDelay(col(bodyCol), agent).as("delay_s"))
    val gated = fresh
      .withColumn("host", Urls.hostFromSurt(col("surt")))
      .join(broadcast(rb), col("host") === col("__rb_host"), "left")
      .filter(Robots.isAllowed(col("__rb_rules"), path))
      .drop("__rb_host", "__rb_rules")
    graft.sources.Cdx.schedule(gated, "host", "delay_s",
        orderCols = Seq("surt"))
      .select("surt", "url", "host", "n_listed", "slot", "not_before_s")
  }
}
