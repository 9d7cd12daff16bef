package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Tokenization edge cases, language-ID markers, quality score
  * determinism.
  */
class TextAnalysisSpec extends SparkSpecBase {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokens: empty, blank, and multi-space inputs") {
    assert(one[Int](TextAnalysis.tokenCount(col("text")), "") === 0)
    assert(one[Int](TextAnalysis.tokenCount(col("text")), "   ") === 0)
    assert(one[Int](TextAnalysis.tokenCount(col("text")), " a  b\t c ") === 3)
  }

  test("bpe-ish token count: splits alpha runs, digit runs, single symbols") {
    assert(one[Int](TextAnalysis.bpeTokenCount(col("text")), "hello world42!") === 4)
    // hello | world | 42 | !
  }

  test("punct ratio and avg token length") {
    assert(one[Double](TextAnalysis.punctRatio(col("text")), "ab!?") === 0.5)
    assert(one[Double](TextAnalysis.avgTokenLen(col("text")), "ab abcd") === 3.0)
  }

  test("langId: marker-based detection picks the dominant language") {
    assert(one[String](TextAnalysis.langId(col("text")), "the cat is in the house") === "en")
    assert(one[String](TextAnalysis.langId(col("text")), "der hund ist nicht da und") === "de")
    assert(one[String](TextAnalysis.langId(col("text")), "el perro es la casa y que") === "es")
    assert(one[String](TextAnalysis.langId(col("text")), "le chien est dans les rues") === "fr")
    assert(one[String](TextAnalysis.langId(col("text")), "你好世界") === "zh")
    assert(one[String](TextAnalysis.langId(col("text")), "xyzzy plugh") === "und")
  }

  test("quality score is in [0,1] and rewards longer well-formed text") {
    val short = one[Double](TextAnalysis.qualityScore(col("text")), "hi")
    val long = one[Double](TextAnalysis.qualityScore(col("text")),
      Seq.fill(120)("reasonable").mkString(" "))
    assert(short >= 0.0 && short <= 1.0)
    assert(long >= 0.0 && long <= 1.0)
    assert(long > short)
  }

  test("stopword ratio") {
    assert(one[Double](TextAnalysis.stopwordRatio(col("text")), "the cat and the dog") === 0.6)
  }

  test("chunks: exact windows, overlap, shorter tail, tiny input") {
    def chunksOf(text: String, size: Int, overlap: Int): Seq[String] =
      one[scala.collection.Seq[String]](TextAnalysis.chunks(col("text"), size, overlap), text).toSeq
    // 5 tokens, size 3, overlap 1 → starts 0,2,4
    assert(chunksOf("a b c d e", 3, 1) === Seq("a b c", "c d e", "e"))
    // input shorter than one window → single chunk
    assert(chunksOf("a b", 5, 2) === Seq("a b"))
    // single token
    assert(chunksOf("a", 3, 1) === Seq("a"))
  }

  test("normalizeUnicode: NFC composes, NFD decomposes, NFKC folds ligatures/fullwidth; invalid form rejected") {
    // decomposed e + U+0301 composes to U+00E9 under NFC
    assert(one[String](TextAnalysis.normalizeUnicode(col("text")),
      "café") === "café")
    // already-NFC text passes through unchanged (the fast path)
    assert(one[String](TextAnalysis.normalizeUnicode(col("text")),
      "café") === "café")
    // NFD: the inverse
    assert(one[String](TextAnalysis.normalizeUnicode(col("text"), "NFD"),
      "café") === "café")
    // NFKC compatibility folds: fi ligature U+FB01 and fullwidth A
    // U+FF21 — what LLM-corpus cleanup wants before tokenization
    assert(one[String](TextAnalysis.normalizeUnicode(col("text"), "NFKC"),
      "ﬁle Ａ") === "file A")
    // NFC leaves compatibility characters ALONE (canonical only)
    assert(one[String](TextAnalysis.normalizeUnicode(col("text")),
      "ﬁle") === "ﬁle")
    // null-safe
    assert(spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(TextAnalysis.normalizeUnicode(col("text"))).head.isNullAt(0))
    intercept[IllegalArgumentException] {
      TextAnalysis.normalizeUnicode(col("text"), "NFX")
    }
  }

  test("mainContent: keeps long low-link blocks, drops nav/footer/link-dense/short boilerplate") {
    val prose = "The quick brown fox jumps over the lazy dog while the " +
      "engine scans partitions and the optimizer prunes every column it can."
    val page = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<div>Short promo!</div>" +
      s"<p>$prose</p>" +
      "<div>Related: <a href=\"/r\">a very long anchor text that dominates this block entirely</a></div>" +
      s"<blockquote>$prose again with enough characters to clear the bar easily, surely.</blockquote>" +
      "<footer><a href=\"/p\">Privacy</a> (c) graft</footer></body></html>"
    val got = one[String](TextAnalysis.mainContent(col("text")), page)
    assert(got === prose + "\n" + prose +
      " again with enough characters to clear the bar easily, surely.")
    // all-boilerplate page -> empty
    assert(one[String](TextAnalysis.mainContent(col("text")),
      "<html><body><nav><a href=\"/\">Home</a></nav></body></html>") === "")
  }

  test("c4 filters: line rules (terminal punct, >=5 words, javascript) and doc rules (>=3 lines, lorem ipsum, brace)") {
    import graft.operators.TextAnalysis.{c4CleanLines, c4DocPass}
    val doc = "This sentence is long enough and ends properly.\n" +
      "Please enable JavaScript to view comments.\n" +
      "Too short here.\n" +
      "this line never terminates and goes on\n" +
      "A second good sentence clears every single bar!\n" +
      "Is a third good sentence also surviving the cut?"
    val clean = one[String](c4CleanLines(col("text")), doc)
    assert(clean ===
      "This sentence is long enough and ends properly.\n" +
        "A second good sentence clears every single bar!\n" +
        "Is a third good sentence also surviving the cut?")
    assert(one[Int](c4DocPass(c4CleanLines(col("text"))), doc) === 1)
    // two surviving lines -> below the 3-sentence floor
    assert(one[Int](c4DocPass(c4CleanLines(col("text"))),
      "One good long sentence that certainly ends here.\n" +
        "Another good long sentence that certainly ends here.") === 0)
    // lorem ipsum / brace doom an otherwise-passing page
    assert(one[Int](c4DocPass(c4CleanLines(col("text"))),
      doc + "\nLorem ipsum dolor sit amet consectetur.") === 0)
    assert(one[Int](c4DocPass(c4CleanLines(col("text"))),
      doc + "\nvar config = { some: code, here: now };.") === 0)
    // quote terminal counts; all-filtered page yields '' and fails
    assert(one[String](c4CleanLines(col("text")),
      "He said it was \"entirely fine to quote this.\"") ===
      "He said it was \"entirely fine to quote this.\"")
    assert(one[Int](c4DocPass(c4CleanLines(col("text"))), "nope\nnah") === 0)
  }

  test("redactDigits masks every digit run") {
    assert(one[String](TextAnalysis.redactDigits(col("text")),
      "call 555 at 10am room42") === "call # at #am room#")
  }

  test("splitBucket: deterministic, in range, ~90/10 at corpus scale") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextAnalysis.splitBucket(col("doc_id")).as("b"))
    val buckets = docs.agg(min("b"), max("b")).collect().head
    assert(buckets.getLong(0) >= 0 && buckets.getLong(1) < 100)
    val trainFrac = docs.filter(col("b") < 90).count().toDouble / docs.count()
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"trainFrac=$trainFrac")
    // determinism: recompute equals itself
    val again = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextAnalysis.splitBucket(col("doc_id")).as("b2"))
    assert(docs.join(again, "doc_id").filter(col("b") =!= col("b2")).count() === 0)
  }

  test("stripHtml: blocks, tags, entities, whitespace — in the load-bearing order") {
    import spark.implicits._
    val got = Seq(
      // script content (with a lone <) drops wholesale, not tag-by-tag
      "<p>a</p><script>if (1 < 2) x();</script><p>b</p>",
      // style + comment blocks drop; tags become word breaks
      "<style>p{}</style>x<!-- hidden -->y</p><p>z",
      // &amp; decodes LAST: &amp;lt; must yield literal "&lt;", not "<"
      "a &amp;lt; b &lt;i&gt; &quot;q&quot;&nbsp;&#39;s&#39;",
      "  spaced\t\nout  ")
      .toDF("h").select(TextAnalysis.stripHtml(col("h"))).as[String].collect()
    assert(got(0) === "a b")
    assert(got(1) === "x y z")
    assert(got(2) === "a &lt; b <i> \"q\" 's'")
    assert(got(3) === "spaced out")
  }

  test("sentences: terminator stays with its sentence; no split without whitespace") {
    import spark.implicits._
    val got = Seq(
      "One two. Three four! Five?  Six",
      "versions 1.2.3 do not split",   // no whitespace after the dots
      "trailing terminator stays.")
      .toDF("t").select(TextAnalysis.sentences(col("t")))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("One two.", "Three four!", "Five?", "Six"))
    assert(got(1) === Seq("versions 1.2.3 do not split"))
    assert(got(2) === Seq("trailing terminator stays."))
  }

  test("sentenceChunks: greedy whole-sentence packing within the token budget") {
    import spark.implicits._
    // sentences of 3/3/4/2 tokens, budget 6:
    // [s1 s2] (6), [s3] (4+2=6? no: 4 then s4 fits 4+2=6) -> [s3 s4]
    val text = "a b one. c d two. e f g three. h four."
    val got = Seq(text).toDF("t")
      .select(TextAnalysis.sentenceChunks(col("t"), maxTokens = 6))
      .as[Seq[String]].collect().head
    assert(got === Seq("a b one. c d two.", "e f g three. h four."))
    // concatenating chunks reproduces the sentence stream (lossless)
    assert(got.mkString(" ") === text)
    // an oversized sentence becomes its own over-budget chunk
    val big = Seq("one two three four five six seven eight. tail.").toDF("t")
      .select(TextAnalysis.sentenceChunks(col("t"), maxTokens = 3))
      .as[Seq[String]].collect().head
    assert(big === Seq("one two three four five six seven eight.", "tail."))
  }

  test("extractLinks: href values in document order, case-insensitive attr") {
    import spark.implicits._
    val got = Seq("""<a href="http://a">x</a><a HREF = "http://b">y</a><a href='no'>""")
      .toDF("h").select(TextAnalysis.extractLinks(col("h")))
      .as[Seq[String]].collect().head
    assert(got === Seq("http://a", "http://b"))
  }

  test("pseudonymize: stable across tables under one salt, distinct across salts, null-safe") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("uid", "pa")
    val b = Seq((1L, "z"), (3L, "w")).toDF("uid", "pb")
    def tok(df: org.apache.spark.sql.DataFrame, salt: String) =
      df.withColumn("t", TextAnalysis.pseudonymize(col("uid"), salt))
    // the surrogate is a join key: same salt, same token per id
    val joined = tok(a, "s1").select("t", "pa")
      .join(tok(b, "s1").select("t", "pb"), "t")
    assert(joined.count() === 1L) // uid 1 only
    // a different salt yields a disjoint token space
    val t1 = tok(a, "s1").select("t").as[String].collect().toSet
    val t2 = tok(a, "s2").select("t").as[String].collect().toSet
    assert((t1 & t2).isEmpty)
    // tokens are md5 hex, no raw id leakage by shape; null id stays null
    assert(t1.forall(_.matches("[0-9a-f]{32}")), t1.mkString(","))
    val n = Seq((Option.empty[Long], "p")).toDF("uid", "pa")
    assert(tok(n, "s1").select("t").collect().head.isNullAt(0))
  }

  test("vocabCoverage: frequency-cut vocab, instance counting, empty/null docs") {
    val docs = Seq(
      (1L, "a a b"),             // all instances in the top-2 vocab
      (2L, "b c"),               // c is OOV at vocabSize 2
      (3L, ""),                  // zero tokens
      (4L, null.asInstanceOf[String])) // null text ≡ empty
      .toDF("doc_id", "text")
    // counts: a=2, b=2, c=1 -> vocab {a, b} (tie a/b irrelevant, both in)
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 3L, 0L)))
    assert(got(2L) === ((2L, 1L, 500000L)))       // 1 of 2 OOV
    assert(got(3L) === ((0L, 0L, -1L)))           // NULL oov_ppm
    assert(got(4L) === ((0L, 0L, -1L)))
    // tie at the cut breaks token-ascending: vocabSize 1 keeps 'a' (a=2, b=2)
    val one = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one(1L) === 2L && one(2L) === 0L)      // only 'a' instances covered
  }
}
