package graft

import org.apache.spark.sql.functions._

import graft.operators.{Frontier, Urls}

/** Crawl-frontier construction ([[graft.operators.Frontier]]): sitemap
  * `<loc>` extraction, SURT canonicalization + cross-listing dedup,
  * fetched-state anti-join, robots gating on the FOLDED host, and the
  * politeness layout.
  */
class FrontierSpec extends SparkSpecBase {

  import spark.implicits._

  test("sitemapLocs: file order, whitespace padding, case-insensitive tags, empty when none") {
    val xml = "<?xml version=\"1.0\"?>\n<urlset>\n" +
      "  <url><loc> https://a.test/1 </loc></url>\n" +
      "  <url><LOC>https://a.test/2</LOC></url>\n" +
      "  <url><loc>\nhttps://a.test/3\n</loc></url>\n</urlset>"
    val got = Seq(xml).toDF("x")
      .select(Frontier.sitemapLocs(col("x"))).head.getSeq[String](0)
    assert(got === Seq("https://a.test/1", "https://a.test/2", "https://a.test/3"))
    assert(Seq("<urlset/>").toDF("x")
      .select(Frontier.sitemapLocs(col("x"))).head.getSeq[String](0).isEmpty)
  }

  test("hostFromSurt inverts surt's host fold") {
    val got = Seq("https://WWW.Sub.Example.ORG:443/P/q?x=1#f")
      .toDF("u")
      .select(Urls.surt(col("u")).as("s"))
      .select(col("s"), Urls.hostFromSurt(col("s")))
      .head
    assert(got.getString(0) === "org,example,sub)/p/q?x=1")
    assert(got.getString(1) === "sub.example.org")
  }

  test("build: variant folding, cross-listing dedup, state anti-join, robots gate, schedule") {
    val seeds = Seq(
      "https://a.test/keep/1",
      "https://A.test:443/keep/1", // case+port variant: same SURT, dup
      "https://a.test/keep/2",
      "https://a.test/priv/3",     // robots-disallowed on a.test
      "https://b.test/hub",        // cross-listed twice (two sitemaps)
      "https://b.test/hub",
      "https://b.test/done",       // already fetched
      "https://B.TEST/done",       // variant of a FETCHED url: must drop too
      "not-a-url"                  // schemeless junk: never enters
    ).toDF("url")
    val fetched = Seq("test,b)/done").toDF("surt")
    val robots = Seq(
      ("a.test", "User-agent: graftbot\nDisallow: /priv/\nCrawl-delay: 2\n"))
      .toDF("host", "body")
    val out = Frontier.build(seeds, "url", fetched, "surt",
        robots, "host", "body", "graftbot/1.0")
      .orderBy("host", "slot")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(out === Seq(
      // a.test: 2 keeps, slots spaced by the robots crawl-delay; the
      // kept raw url is the min spelling (the :443 variant's 'A' < 'a')
      ("test,a)/keep/1", "https://A.test:443/keep/1", "a.test", 2L, 0L, 0.0),
      ("test,a)/keep/2", "https://a.test/keep/2", "a.test", 1L, 1L, 2.0),
      // b.test: no robots row -> allowed, unspaced; hub deduped to one
      // row with its listing count; done (and its variant) anti-joined
      ("test,b)/hub", "https://b.test/hub", "b.test", 2L, 0L, 0.0)))
  }

  test("build plan: robots join broadcasts; three hash exchanges (dedup, state anti-join, host window)") {
    val seeds = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat(lit("https://s"), (col("doc_id") % 5).cast("string"),
        lit(".graft.test/p/"), col("doc_id").cast("string")).as("url"))
    val fetched = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 6 === 0)
      .select(graft.operators.Urls.surt(
        concat(lit("https://s"), (col("doc_id") % 5).cast("string"),
          lit(".graft.test/p/"), col("doc_id").cast("string"))).as("surt"))
    val robots = Seq(("s0.graft.test",
      "User-agent: graftbot\nDisallow: /x/\nCrawl-delay: 1\n"))
      .toDF("host", "body")
    val plan = Frontier.build(seeds, "url", fetched, "surt",
        robots, "host", "body", "graftbot/1.0")
      .queryExecution.executedPlan.toString
    assert("(?i)broadcast".r.findFirstIn(plan).isDefined,
      s"the host-cardinality robots table must broadcast:\n$plan")
    val exchanges = "(?i)exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3,
      s"dedup + state anti-join + host window = at most 3 hash exchanges, got $exchanges:\n$plan")
  }
}
