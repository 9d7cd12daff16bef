package graft

import org.apache.spark.sql.functions._

import graft.operators.{Psl, Urls}

/** Public-suffix-list resolution ([[graft.operators.Psl]]): the
  * pure-Scala `registrable()` and the distributed
  * `withRegistrableDomain` must agree on every rule family (exact,
  * two-level, wildcard, exception, default, host-is-suffix), and the
  * `usePsl` domain-quota path must group by the PSL key where the
  * `www.`-strip heuristic fragments.
  */
class PslSpec extends SparkSpecBase {

  import spark.implicits._

  // One host per rule family, plus the shapes that differ from the
  // www-strip heuristic. Expectations hand-derived from the PSL
  // algorithm (publicsuffix.org/list/ "Algorithm" section).
  private val cases: Seq[(String, String)] = Seq(
    // default rule * : unknown TLD → last two labels
    "example.zz"            -> "example.zz",
    "a.b.example.zz"        -> "example.zz",
    // exact single-label rule
    "example.com"           -> "example.com",
    "news.example.com"      -> "example.com",
    "deep.news.example.com" -> "example.com",
    "www.example.com"       -> "example.com",
    // exact two-level rules (longest match wins over "com"/"au")
    "example.com.au"        -> "example.com.au",
    "shop.example.com.au"   -> "example.com.au",
    "example.co.uk"         -> "example.co.uk",
    "a.b.example.co.uk"     -> "example.co.uk",
    // host IS a public suffix → returned unchanged
    "com"                   -> "com",
    "com.au"                -> "com.au",
    "co.uk"                 -> "co.uk",
    // wildcard *.ck : any label under ck is a public suffix
    "example.ck"            -> "example.ck",
    "www.example.ck"        -> "www.example.ck",
    "a.www.example.ck"      -> "www.example.ck",
    // exception !www.ck : public suffix is "ck", www.ck is registrable
    "www.ck"                -> "www.ck",
    "sub.www.ck"            -> "www.ck",
    // single label, no rule beyond default
    "localhost"             -> "localhost")

  test("registrable() matches the hand-derived PSL algorithm on every rule family") {
    for ((host, want) <- cases)
      assert(Psl.registrable(host) === want, s"host=$host")
  }

  test("distributed withRegistrableDomain agrees with pure registrable() on all cases") {
    val urls = cases.map { case (h, _) => s"https://$h/p/1" }
    val got = Psl.withRegistrableDomain(
      urls.toDF("url"), "url", "domain")
      .select(Urls.host(col("url")).as("host"), col("domain"))
      .as[(String, String)].collect().toMap
    for ((host, want) <- cases)
      assert(got(host) === want, s"host=$host")
  }

  test("null / hostless urls pass through with null domain, rows preserved") {
    val df = Seq(Some("https://news.example.com/x"), Some("not a url"), None)
      .toDF("url")
    val out = Psl.withRegistrableDomain(df, "url", "domain")
    assert(out.count() === 3)
    val good = out.filter(col("url") === "https://news.example.com/x")
      .select("domain").as[String].collect()
    assert(good.toSeq === Seq("example.com"))
    // Urls.host gives "" for a schemeless string → no domain key
    assert(out.filter(col("domain").isNull).count() === 1)
    assert(out.filter(col("domain") === "").count() === 1)
  }

  test("domainQuota(usePsl = true) groups subdomain variants under one eTLD+1 key") {
    // Three aliases of one registrant + a .com.au pair the heuristic
    // would key as "example.com.au"-vs-"shop.example.com.au".
    val docs = Seq(
      (1L, "https://example.com/a", 5.0),
      (2L, "https://news.example.com/b", 4.0),
      (3L, "https://www.example.com/c", 3.0),
      (4L, "https://example.com.au/d", 2.0),
      (5L, "https://shop.example.com.au/e", 1.0))
      .toDF("doc_id", "url", "quality")
    val out = Urls.domainQuota(docs, "doc_id", "url", "quality", k = 2, usePsl = true)
      .select("domain", "rank", "doc_id")
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("example.com", 1, 1L), ("example.com", 2, 2L),
      ("example.com.au", 1, 4L), ("example.com.au", 2, 5L)))

    // Heuristic on the same input fragments the key: 4 distinct domains.
    val heur = Urls.domainQuota(docs, "doc_id", "url", "quality", k = 2)
      .select("domain").distinct().count()
    assert(heur === 4)
  }
}
