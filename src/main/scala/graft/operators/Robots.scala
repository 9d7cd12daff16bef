package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RobotsRulesExpr

/** robots.txt compliance filtering — the retroactive-politeness pass
  * a training-data pipeline runs over crawl corpora: exclusion
  * directives (including the AI-crawler opt-outs sites publish for
  * agents like `GPTBot`/`CCBot`) are matched against every document's
  * URL, and disallowed pages leave the corpus even though the crawl
  * already fetched them.
  *
  * Semantics implemented (the REP core, RFC 9309): per host, the
  * applicable group is the one whose `User-agent` token is the
  * LONGEST case-insensitive substring of the caller's agent (the `*`
  * group as fallback; consecutive agent lines share one group); a URL
  * path is evaluated against the group's `Allow`/`Disallow` prefix
  * rules by LONGEST-MATCH, allow winning length ties; no matching
  * rule (or no robots.txt at all) means allowed. Declared
  * simplifications, spec-pinned: no `$`-anchor / `*`-wildcard
  * patterns inside rule paths (prefix semantics only — the dominant
  * rule shape), `Crawl-delay`/`Sitemap` ignored.
  *
  * Scale shape: rule extraction is a native codegen'd expression
  * ([[graft.functions.RobotsRulesExpr]] — one pass over each robots
  * body, no UDF); the robots table is per-HOST (tiny next to the
  * corpus) and broadcast-joins onto documents; the allow decision is
  * pure array arithmetic over the matched rules. Map-only after one
  * broadcast join.
  */
object Robots {

  /** Applicable `(prefix, allow)` rules of a robots.txt body for
    * `agent` — `array<struct<prefix,allow>>` in file order; empty
    * array when no group applies or the body is empty; NULL body →
    * NULL (callers coalesce to allowed).
    */
  def rulesFor(body: Column, agent: String): Column =
    graft.functions.HashExprs.robotsRules(body, agent)

  /** Longest-match allow decision for a URL PATH against [[rulesFor]]
    * output: among rules whose prefix starts the path, the longest
    * wins (ties → allow, per the Google/RFC 9309 convention); no
    * match or NULL rules → allowed.
    */
  def isAllowed(rules: Column, path: Column): Column = {
    val matched = filter(rules, r =>
      startswith(path, r.getField("prefix")))
    // order by (prefix length, allow) so a length tie resolves to
    // allow = 1; array_max over int-pair structs is lexicographic
    val best = array_max(transform(matched, r =>
      struct(length(r.getField("prefix")).as("l"),
        r.getField("allow").cast("int").as("a"))))
    coalesce(best.getField("a") === 1, lit(true))
  }

  /** Filter `docs` to robots-allowed URLs: `robots` carries one row
    * per host (`hostCol`, `bodyCol`); documents join by
    * [[Urls.host]] of their URL (broadcast — the robots table is
    * host-cardinality), hosts with no robots row are allowed.
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
