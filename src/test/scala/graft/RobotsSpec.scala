package graft

import org.apache.spark.sql.functions._

import graft.functions.RobotsAllowExpr
import graft.operators.Robots

/** robots.txt parsing + allow semantics (RFC 9309): group selection
  * by longest agent-token PREFIX of the product token,
  * consecutive-agent-line group sharing, longest-match rules with
  * `*`/`$` pattern support and most-octets specificity (allow winning
  * ties), empty-path-as-`/`, comments/case/blank handling, and the
  * end-to-end corpus filter.
  */
class RobotsSpec extends SparkSpecBase {

  import spark.implicits._

  private def allowed(body: String, agent: String, path: String): Boolean =
    Seq((body, path)).toDF("body", "path")
      .select(Robots.isAllowed(
        Robots.rulesFor(col("body"), agent), col("path")))
      .head.getBoolean(0)

  private val body =
    """# site policy
      |User-agent: BadBot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: examplebot
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow: /tmp
      |
      |User-agent: *
      |Disallow: /all-blocked/
      |""".stripMargin

  test("group selection: product-token prefix match, consecutive agent lines, * fallback") {
    // graftbot's group governs graftbot/1.0 — not BadBot's, not *'s
    assert(!allowed(body, "graftbot/1.0 (+https://graft.test)", "/private/x"))
    assert(allowed(body, "graftbot/1.0", "/all-blocked/x"),
      "a governed agent ignores the * group entirely")
    // the second token of the shared group matches too
    assert(!allowed(body, "ExampleBot/2", "/private/x"))
    // unknown agents fall back to *
    assert(!allowed(body, "randombot", "/all-blocked/x"))
    assert(allowed(body, "randombot", "/private/x"))
    // the longest matching token wins over a shorter one — both are
    // PREFIXES of the product token ("graft" vs "graftbot")
    val nested = "User-agent: graft\nDisallow: /a/\n\nUser-agent: graftbot\nDisallow: /b/\n"
    assert(allowed(nested, "graftbot", "/a/x") && !allowed(nested, "graftbot", "/b/x"))
  }

  test("agent tokens match the PRODUCT TOKEN by prefix — containment never binds") {
    // 'bot' is a substring of 'graftbot' but not a prefix → * governs
    val sub = "User-agent: bot\nDisallow: /a/\n\nUser-agent: *\nDisallow: /b/\n"
    assert(allowed(sub, "graftbot/1.0", "/a/x"))
    assert(!allowed(sub, "graftbot/1.0", "/b/x"))
    // 'aftbot/1.0' is contained in the FULL agent string (and longer
    // than 'graftbot') but is not a prefix of the product token
    val trap = "User-agent: aftbot/1.0\nDisallow: /\n\nUser-agent: graftbot\nDisallow: /g/\n"
    assert(allowed(trap, "graftbot/1.0", "/x") &&
      !allowed(trap, "graftbot/1.0", "/g/x"),
      "a containment-only token must never out-rank the real group")
    // the version tail is not part of the product token
    assert(!allowed("User-agent: graftbot\nDisallow: /v/\n",
      "graftbot/1.0 (+https://graft.test)", "/v/x"))
  }

  test("group VALUES tokenize too: 'User-agent: graftbot/1.0' binds graftbot (ADVICE r15)") {
    // a site publishing a versioned group line means the product
    // token — the robots.cc convention extracts it from BOTH sides
    val versioned = "User-agent: graftbot/1.0\nDisallow: /g/\n\nUser-agent: *\nDisallow: /s/\n"
    assert(!allowed(versioned, "graftbot/1.0 (+https://graft.test)", "/g/x"),
      "the versioned group line must bind its own crawler")
    assert(!allowed(versioned, "graftbot", "/g/x"))
    assert(allowed(versioned, "graftbot/1.0", "/s/x"),
      "a bound agent ignores the * group")
    // truncation is at the first non-[a-z_-] octet, not just '/'
    assert(!allowed("User-agent: graft-bot v2\nDisallow: /v/\n",
      "graft-bot/2.0", "/v/x"))
    // a value with NO leading product-token octet yields an empty
    // token, which must match NOTHING (an empty prefix would bind
    // every agent like a second *)
    val junk = "User-agent: 1bot\nDisallow: /\n\nUser-agent: *\nDisallow: /w/\n"
    assert(allowed(junk, "graftbot", "/x") && !allowed(junk, "graftbot", "/w/x"),
      "an untokenizable group value must not become a wildcard")
    // only the EXACT '*' is the wildcard: a malformed '*bot' group
    // tokenizes to nothing and must not win the first-in-file tie
    // over the real '*' group (robots.cc extracts no token from it)
    val starish = "User-agent: *bot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert(allowed(starish, "graftbot", "/anything"),
      "'*bot' must not bind as a second wildcard ahead of the real one")
  }

  test("longest-match rules: allow overrides shorter disallow; ties go to allow; no match allows") {
    assert(!allowed(body, "graftbot", "/private/secret"))
    assert(allowed(body, "graftbot", "/private/pub/doc"),
      "the longer Allow prefix overrides")
    assert(!allowed(body, "graftbot", "/tmp-file"), "prefix semantics: /tmp matches /tmp-file")
    assert(allowed(body, "graftbot", "/open/page"))
    // exact length tie: allow wins
    val tie = "User-agent: *\nDisallow: /x/\nAllow: /x/\n"
    assert(allowed(tie, "anybot", "/x/a"))
  }

  test("RFC 9309 §2.2.3 patterns: * spans any run, trailing $ anchors, interior $ is literal") {
    val m = (path: String, pattern: String) => RobotsAllowExpr.matches(path, pattern)
    assert(m("/p2/doc/19", "/p*/doc/*9$"))
    assert(!m("/p2/doc/190", "/p*/doc/*9$"), "$ pins the end")
    assert(m("/p2/doc/190", "/p*/doc/*9*"), "unanchored wildcard matches interior")
    assert(m("/a.pdf", "/*.pdf$") && m("/x/deep/a.pdf", "/*.pdf$"))
    assert(!m("/a.pdfx", "/*.pdf$"))
    assert(m("/a.pdfx", "/*.pdf"), "no anchor → prefix-with-wildcards")
    assert(m("/shop?sessionid=7", "/*?sessionid="))
    assert(!m("/shop", "/*?sessionid="))
    // a rule without * but with $ is exact-path
    assert(m("/exact", "/exact$") && !m("/exact/x", "/exact$"))
    // interior $ is a literal octet
    assert(m("/a$b/x", "/a$b/") && !m("/ab/x", "/a$b/"))
    // * can match the empty run; consecutive literals stay ordered
    assert(m("/ab", "/a*b") && m("/a-b", "/a*b") && !m("/ba", "/a*b"))
    // trailing *$ ≡ unanchored
    assert(m("/a/bc", "/a/*$"))
    // empty segments from ** collapse
    assert(m("/a//b", "/a**b$") && m("/ab", "/a**b$"))
  }

  test("specificity is raw pattern octets: a wildcard rule out-scores a longer-MATCHING literal") {
    // literal Allow /p0/doc/1 (9 octets) vs wildcard Disallow
    // /p*/doc/*7* (11 octets): on /p0/doc/17 the literal matches a
    // longer PREFIX of the path, but the wildcard pattern has more
    // octets and wins
    val b = "User-agent: *\nDisallow: /p0/\nAllow: /p0/doc/1\nDisallow: /p*/doc/*7*\n"
    assert(!allowed(b, "anybot", "/p0/doc/17"))
    assert(allowed(b, "anybot", "/p0/doc/10"), "literal Allow still governs non-7 ids")
    assert(!allowed(b, "anybot", "/p0/doc/2"), "short Disallow governs the rest")
    // and a still-longer $-anchored Allow out-scores the wildcard
    val b2 = b + "Allow: /p*/doc/*77$\n"
    assert(allowed(b2, "anybot", "/p0/doc/77") && !allowed(b2, "anybot", "/p0/doc/78"))
  }

  test("empty URL path evaluates as '/' — Disallow: / blocks the bare host URL") {
    val b = "User-agent: *\nDisallow: /\n"
    assert(!allowed(b, "anybot", ""))
    assert(!allowed(b, "anybot", "/"))
    val open = "User-agent: *\nDisallow: /x/\n"
    assert(allowed(open, "anybot", ""))
    // end-to-end: a pathless URL against Disallow: /
    val docs = Seq((1L, "https://a.test"), (2L, "https://b.test")).toDF("doc_id", "url")
    val robots = Seq(("a.test", "User-agent: *\nDisallow: /\n")).toDF("host", "body")
    val kept = Robots.filterAllowed(docs, "url", robots, "host", "body", "graftbot/1.0")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  test("edges: comments, case-insensitive keys, empty values, rules before any group, null body") {
    val messy = "DISALLOW: /orphan/\nUser-Agent: *  # everyone\nDisAllow: /a/ # note\nDisallow:\nallow: /a/b\n"
    assert(allowed(messy, "bot", "/orphan/x"), "rules before any User-agent are ignored")
    assert(!allowed(messy, "bot", "/a/x"), "comment stripped, keys case-insensitive")
    assert(allowed(messy, "bot", "/a/b-long"), "empty Disallow is a no-op; allow matches")
    // NULL body (no robots.txt) → allowed
    assert(spark.sql("SELECT CAST(NULL AS STRING) AS body, '/x' AS path")
      .select(Robots.isAllowed(Robots.rulesFor(col("body"), "bot"), col("path")))
      .head.getBoolean(0))
  }

  test("filterAllowed: corpus filter via broadcast host join; robots-less hosts pass") {
    val docs = Seq(
      (1L, "https://a.test/private/x"),
      (2L, "https://a.test/open/x"),
      (3L, "https://b.test/private/x"), // no robots row for b.test
      (4L, "https://a.test/files/doc.pdf") // wildcard rule
    ).toDF("doc_id", "url")
    val robots = Seq(
      ("a.test", "User-agent: graftbot\nDisallow: /private/\nDisallow: /*.pdf$\n")
    ).toDF("host", "body")
    val kept = Robots.filterAllowed(docs, "url", robots, "host", "body",
        agent = "graftbot/1.0")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 3L))
  }

  test("crawlDelay: governing group's value, first declaration wins, unparseable ignored, null-safe") {
    def delay(body: String, agent: String): Option[Double] = {
      val r = Seq(body).toDF("body")
        .select(Robots.crawlDelay(col("body"), agent)).head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val b = "User-agent: graftbot\nCrawl-delay: 1.5\nCrawl-delay: 7\n\n" +
      "User-agent: *\nCrawl-delay: 9\n"
    assert(delay(b, "graftbot/1.0") === Some(1.5),
      "governing group's FIRST declaration wins; the * decoy must not bind")
    assert(delay(b, "otherbot") === Some(9.0))
    assert(delay("User-agent: *\nDisallow: /\n", "bot") === None,
      "no declaration → null, not 0")
    assert(delay("User-agent: *\nCrawl-delay: soon\nCrawl-delay: 4\n", "bot")
      === Some(4.0), "unparseable value ignored like any unknown line")
    assert(Seq("x").toDF("b")
      .select(Robots.crawlDelay(lit(null).cast("string"), "bot")).head.isNullAt(0))
    // ADVICE r15: Double.valueOf-isms are NOT delays — a hostile
    // NaN/Infinity would poison the scheduler's slot × delay product;
    // Java-only float spellings and negatives are unparseable too
    Seq("NaN", "Infinity", "-Infinity", "1.5d", "0x1p2", "-1", "-0.5",
        "1e3", ".5", "5.").foreach { v =>
      assert(delay(s"User-agent: *\nCrawl-delay: $v\nCrawl-delay: 2\n", "bot")
        === Some(2.0), s"'$v' must be ignored (first VALID declaration wins)")
    }
    assert(delay("User-agent: *\nCrawl-delay: 0\n", "bot") === Some(0.0),
      "zero is a valid declared delay")
  }

  test("sitemaps: global extraction, mixed key case, file order, empty when none") {
    val b = "User-agent: *\nDisallow: /\nSitemap: https://a.test/s1.xml\n" +
      "# c\nsitemap: https://a.test/s2.xml\nSiteMap:https://a.test/s3.xml\n"
    val got = Seq(b).toDF("body")
      .select(Robots.sitemaps(col("body"))).head.getSeq[String](0)
    assert(got === Seq("https://a.test/s1.xml", "https://a.test/s2.xml",
      "https://a.test/s3.xml"))
    assert(Seq("User-agent: *\nDisallow: /\n").toDF("body")
      .select(Robots.sitemaps(col("body"))).head.getSeq[String](0).isEmpty)
  }

  test("robotsTable: only the ROOT /robots.txt governs — deep-path captures never displace it") {
    val http = (body: String) =>
      s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" + body
    val recs = Seq(
      // decoy sorts BEFORE the real record id — min_by would pick it
      // if the suffix ever matched
      ("<urn:uuid:aaa-decoy>", "https://a.test/mirror/robots.txt",
        http("User-agent: *\nDisallow: /\n")),
      ("<urn:uuid:zzz-real>", "https://a.test/robots.txt",
        http("User-agent: *\nDisallow: /priv/\n")),
      // a host whose ONLY robots-ish capture is deep-path → no row
      ("<urn:uuid:b-deep>", "https://b.test/x/robots.txt",
        http("User-agent: *\nDisallow: /\n")))
      .toDF("record_id", "target_uri", "payload")
      .withColumn("warc_type", lit("response"))
      .withColumn("content_type", lit("application/http; msgtype=response"))
    val rows = graft.sources.Warc.robotsTable(recs)
      .orderBy("host").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a.test"))
    assert(rows.head.getString(1).contains("/priv/"),
      "the ROOT body wins, not the lexicographically-smaller decoy")
  }
}
