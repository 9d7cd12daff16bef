package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots

/** robots.txt parsing + allow semantics (RFC 9309 core): group
  * selection by longest agent-token substring, consecutive-agent-line
  * group sharing, longest-match rules with allow winning ties,
  * comments/case/blank handling, and the end-to-end corpus filter.
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

  test("group selection: agent substring match, consecutive agent lines, * fallback") {
    // graftbot's group governs graftbot/1.0 — not BadBot's, not *'s
    assert(!allowed(body, "graftbot/1.0 (+https://graft.test)", "/private/x"))
    assert(allowed(body, "graftbot/1.0", "/all-blocked/x"),
      "a governed agent ignores the * group entirely")
    // the second token of the shared group matches too
    assert(!allowed(body, "ExampleBot/2", "/private/x"))
    // unknown agents fall back to *
    assert(!allowed(body, "randombot", "/all-blocked/x"))
    assert(allowed(body, "randombot", "/private/x"))
    // the longest matching token wins over a shorter one
    val nested = "User-agent: bot\nDisallow: /a/\n\nUser-agent: graftbot\nDisallow: /b/\n"
    assert(allowed(nested, "graftbot", "/a/x") && !allowed(nested, "graftbot", "/b/x"))
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
      (3L, "https://b.test/private/x") // no robots row for b.test
    ).toDF("doc_id", "url")
    val robots = Seq(
      ("a.test", "User-agent: graftbot\nDisallow: /private/\n")
    ).toDF("host", "body")
    val kept = Robots.filterAllowed(docs, "url", robots, "host", "body",
        agent = "graftbot/1.0")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 3L))
  }
}
