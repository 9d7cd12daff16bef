package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge

import graft.functions.RobotsAllowExpr

/** robots.txt compliance filtering — the retroactive-politeness pass
  * a training-data pipeline runs over crawl corpora: exclusion
  * directives (including the AI-crawler opt-outs sites publish for
  * agents like `GPTBot`/`CCBot`) are matched against every document's
  * URL, and disallowed pages leave the corpus even though the crawl
  * already fetched them.
  *
  * Semantics implemented (RFC 9309, including §2.2.3 patterns): per
  * host, the applicable group is the one whose `User-agent` token is
  * the LONGEST case-insensitive PREFIX of the caller's PRODUCT TOKEN
  * (the agent string up to the first `/`; the `*` group as fallback;
  * consecutive agent lines share one group); a URL path is evaluated
  * against the group's `Allow`/`Disallow` rules with full `*`
  * wildcard and trailing-`$` end-anchor support, most-octets-wins
  * specificity (raw pattern length, the googlebot convention), allow
  * winning length ties; an empty URL path evaluates as `/`; no
  * matching rule (or no robots.txt at all) means allowed.
  * `Crawl-delay`/`Sitemap` are ignored (spec-pinned).
  *
  * Scale shape: rule extraction is a native codegen'd expression
  * ([[graft.functions.RobotsRulesExpr]] — one pass over each robots
  * body, no UDF); the robots table is per-HOST (tiny next to the
  * corpus) and broadcast-joins onto documents; the allow decision is
  * a second native single-pass expression
  * ([[graft.functions.RobotsAllowExpr]] — no per-row regex compile).
  * Map-only after one broadcast join.
  */
object Robots {

  /** Applicable `(pattern, allow)` rules of a robots.txt body for
    * `agent` — `array<struct<pattern,allow>>` in file order; empty
    * array when no group applies or the body is empty; NULL body →
    * NULL (callers coalesce to allowed).
    */
  def rulesFor(body: Column, agent: String): Column =
    graft.functions.HashExprs.robotsRules(body, agent)

  /** Longest-match allow decision for a URL PATH against [[rulesFor]]
    * output ([[graft.functions.RobotsAllowExpr]]: `*`/`$` patterns,
    * most-octets specificity, ties → allow, empty path → `/`); no
    * match or NULL rules → allowed.
    */
  def isAllowed(rules: Column, path: Column): Column =
    coalesce(
      Bridge.column(RobotsAllowExpr(
        Bridge.expression(rules), Bridge.expression(path))),
      lit(true))

  /** The governing group's `Crawl-delay` for `agent`, in seconds
    * (nullable double — null when the group declares none, no group
    * applies, or the robots body is NULL). The de-facto extension
    * most crawlers honor; the politeness scheduler
    * ([[graft.sources.Cdx.schedule]]) spaces a host's planned fetches
    * by it.
    */
  def crawlDelay(body: Column, agent: String): Column =
    Bridge.column(graft.functions.RobotsCrawlDelayExpr(
      Bridge.expression(body), agent))

  /** `Sitemap:` directives of a robots body — GLOBAL per the sitemaps
    * protocol (not per-group, unlike rules/crawl-delay), so this is
    * pure column arithmetic: one case-insensitive anchored
    * regexp_extract_all, array of URLs in file order (empty when
    * none). The crawl frontier's seed list.
    */
  def sitemaps(body: Column): Column =
    regexp_extract_all(body, lit("(?im)^\\s*sitemap\\s*:\\s*(\\S+)"), lit(1))

  /** Filter `docs` to robots-allowed URLs: `robots` carries one row
    * per host (`hostCol`, `bodyCol`); documents join by
    * [[Urls.host]] of their URL (broadcast — the robots table is
    * host-cardinality), hosts with no robots row are allowed. A URL
    * with no path component (`https://example.com`) extracts as the
    * empty string and is evaluated as `/` by the matcher.
    */
  def filterAllowed(
      docs: DataFrame,
      urlCol: String,
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val rules = robots.select(
      col(hostCol).as("__rb_host"),
      rulesFor(col(bodyCol), agent).as("__rb_rules"))
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    docs.join(broadcast(rules),
        Urls.host(col(urlCol)) === col("__rb_host"), "left")
      .filter(isAllowed(col("__rb_rules"), path))
      .drop("__rb_host", "__rb_rules")
  }
}
