package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{NormalizeExpr, RobotsRulesExpr}
import graft.operators.TextAnalysis

/** Fuzz pins for the round-14 expressions that consume UNTRUSTED
  * text (robots bodies, HTTP payload bytes, arbitrary HTML): the
  * parsers must never throw and their outputs must satisfy their
  * structural contracts on adversarial random inputs, not just the
  * fixture shapes.
  */
class Round14FuzzSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(1407)

  private def randLine(): String = {
    val toks = Seq("User-agent", "user-AGENT", "Disallow", "allow", "Allow",
      "Sitemap", "Crawl-delay", "#", ":", "::", "*", "/a/b", "\t", "bot",
      "graftbot", "é", "", "  ", "%2F", "{", "/p?q=1")
    (0 until rnd.nextInt(6)).map(_ => toks(rnd.nextInt(toks.size)))
      .mkString(rnd.nextInt(3) match { case 0 => ""; case 1 => " "; case _ => ":" })
  }

  test("robots parser: never throws on 500 adversarial bodies; every emitted prefix is verbatim from the body") {
    (0 until 500).foreach { _ =>
      val body = (0 until rnd.nextInt(20)).map(_ => randLine())
        .mkString(if (rnd.nextBoolean()) "\n" else "\r\n")
      val rules = RobotsRulesExpr.compute(
        UTF8String.fromString(body), "graftbot/1.0")
      (0 until rules.numElements()).foreach { i =>
        val row = rules.getStruct(i, 2)
        val prefix = row.getUTF8String(0).toString
        assert(prefix.nonEmpty && body.contains(prefix),
          s"rule prefix '$prefix' must be verbatim body text")
      }
    }
  }

  test("normalize: idempotent per form and NFC∘NFD ≡ NFC, on 500 random unicode strings") {
    val pool = "aAé́̈ﬁＡ中 \n.!?" + "😀" // incl. an astral pair
    (0 until 500).foreach { _ =>
      val s = (0 until rnd.nextInt(24))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString
      // surrogate halves may pair up randomly — skip broken strings
      // (Spark strings are well-formed UTF-8 by construction)
      if (!s.exists(c => Character.isSurrogate(c)) || s.codePoints().count() >= 0) {
        Seq("NFC", "NFD", "NFKC", "NFKD").foreach { f =>
          val once = NormalizeExpr.compute(UTF8String.fromString(s), f).toString
          val twice = NormalizeExpr.compute(UTF8String.fromString(once), f).toString
          assert(once === twice, s"$f not idempotent on ${s.toList}")
        }
        val nfd = NormalizeExpr.compute(UTF8String.fromString(s), "NFD").toString
        assert(
          NormalizeExpr.compute(UTF8String.fromString(nfd), "NFC").toString ===
          NormalizeExpr.compute(UTF8String.fromString(s), "NFC").toString)
      }
    }
  }

  test("decodePayload: never throws on 500 random byte payloads x content types") {
    val cts = Seq(null, "text/plain", "application/http; msgtype=response",
      "application/http")
    (0 until 500).foreach { _ =>
      val n = rnd.nextInt(200)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      // plant plausible HTTP fragments sometimes
      val payload =
        if (rnd.nextBoolean()) bytes
        else ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=" +
          Seq("utf-8", "iso-8859-1", "bogus-charset", "")(rnd.nextInt(4)) +
          "\r\n\r\n").getBytes("ISO-8859-1") ++ bytes
      val out = graft.sources.Warc.decodePayload(payload, cts(rnd.nextInt(cts.size)))
      assert(out != null)
    }
  }

  test("mainContent: every surviving block has >= 80 cleaned chars (one batched evaluation over 200 random pages)") {
    import spark.implicits._
    val frags = Seq("<p>", "</p>", "<div>", "</div>", "<a href=\"/x\">",
      "</a>", "<script>var x=1;</script>", "<!--c-->", "&amp;", "word ",
      "a sentence with several reasonable words in it ", "<br>", "\"q\"")
    val pages = (0 until 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => frags(rnd.nextInt(frags.size))).mkString
    }.toDF("text")
    val out = pages
      .select(TextAnalysis.mainContent(col("text")).as("c"))
      .filter(length(col("c")) > 0)
      .select(explode(split(col("c"), "\n")).as("block"))
      .filter(length(col("block")) < 80)
      .count()
    assert(out === 0L, "no surviving block may be under the length floor")
  }
}
