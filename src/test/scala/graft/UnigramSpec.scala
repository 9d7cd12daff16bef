package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM tokenizer ([[graft.operators.Unigram]]): trainer
  * determinism and coverage, Viterbi optimality of the integer dpkey
  * objective against exhaustive segmentation, the UNK path, and the
  * count-from-dpkey extraction the DuckDB oracle shares.
  */
class UnigramSpec extends SparkSpecBase {

  import spark.implicits._

  private val dict = Seq(
    ("the", 50L), ("quick", 20L), ("brown", 20L), ("fox", 30L),
    ("jumps", 10L), ("lazy", 15L), ("dog", 25L), ("thequick", 3L))

  test("trainOnDict: deterministic, single-char coverage kept, scores are negative scaled log-probs") {
    val v1 = Unigram.trainOnDict(dict, vocabSize = 30, maxPieceLen = 4,
      emIters = 2, seedSize = 60)
    val v2 = Unigram.trainOnDict(dict, vocabSize = 30, maxPieceLen = 4,
      emIters = 2, seedSize = 60)
    assert(v1 === v2, "training twice on one dict must be identical")
    val chars = dict.flatMap(_._1.toSeq).map(_.toString).toSet
    val pieces = v1.map(_._1).toSet
    assert(chars.subsetOf(pieces), "every seen char stays in the vocab")
    assert(v1.forall(_._2 < 0L), "ln p < 0 for p < 1")
    assert(v1.map(_._1) === v1.map(_._1).sorted, "vocab sorted by piece")
  }

  /** Exhaustive-segmentation dpkey for a word under a score map —
    * the brute-force mirror of the Viterbi objective.
    */
  private def bruteBest(w: String, scores: Map[String, Long], maxLen: Int): Long = {
    def go(pos: Int): Seq[Long] =
      if (pos == w.length) Seq(0L)
      else (1 to math.min(maxLen, w.length - pos)).flatMap { k =>
        val piece = w.substring(pos, pos + k)
        val s = scores.get(piece)
          .orElse(if (k == 1) Some(Unigram.UnkScore) else None)
        s.toSeq.flatMap(sc => go(pos + k).map(_ + 1024L * sc - 1L))
      }
    go(0).max
  }

  test("encode: Viterbi matches exhaustive segmentation; count = floorMod(-dpkey, 1024); fuse lossless") {
    val vocab = Seq(
      ("a", -3000000L), ("b", -3500000L), ("c", -4000000L),
      ("ab", -2000000L), ("bc", -2500000L), ("abc", -5000000L),
      ("abca", -1500000L))
    val scores = vocab.toMap
    val words = Seq("abc", "abcabc", "aabbcc", "abcabca", "cab",
      "a", "bca", "abcbcab")
    val df = words.toDF("w")
      .select(col("w"), Unigram.encode(col("w"), vocab, 4).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      val toks = df(w)
      assert(toks.mkString("") === w, s"fuse lossless for '$w'")
      val best = bruteBest(w, scores, 4)
      val got = toks.map(t =>
        1024L * scores.getOrElse(t, Unigram.UnkScore) - 1L).sum
      assert(got === best, s"Viterbi optimal for '$w'")
      assert(toks.length === java.lang.Math.floorMod(-best, 1024L).toInt,
        s"count extracts from dpkey for '$w'")
    }
  }

  test("UNK path: absent single chars emit themselves at the fixed penalty; whitespace split matches tokens()") {
    val vocab = Seq(("a", -1000000L), ("ab", -1500000L))
    val got = Seq("ab zq  a").toDF("t")
      .select(Unigram.encode(col("t"), vocab, 4))
      .head.getSeq[String](0)
    assert(got === Seq("ab", "z", "q", "a"))
  }

  test("word split matches tokens() on control-char edges (only 0x20 is trimmed, r18 advice)") {
    // Java String.trim strips ALL chars <= 0x20; the repo convention
    // (tokens() = split(trim(text), "\\s+") with Spark trim = 0x20
    // only) keeps control chars attached to their word. The fused
    // encode must see the same word list, or token counts and the
    // roundtrip diverge from the oracle on such docs.
    val vocab = Seq(("f", -1000000L), ("o", -1100000L), ("x", -1200000L))
    val ctl = 1.toChar.toString // U+0001: not regex whitespace, but <= 0x20
    val texts = Seq(ctl + "fox the" + 2.toChar, "\tfox", " fox ", ctl, "",
      s"  ${ctl}fox the$ctl  ")
    val rows = texts.toDF("t")
      .select(col("t"),
        graft.operators.Unigram.encode(col("t"), vocab, 4).as("toks"),
        graft.operators.TextAnalysis.tokens(col("t")).as("words"))
      .collect()
    rows.foreach { r =>
      val fused = r.getSeq[String](1).mkString("")
      val expected = r.getSeq[String](2).mkString("")
      assert(fused === expected,
        s"fused encode over '${r.getString(0)}' must concat to tokens()'s words")
    }
  }

  test("equal-dpkey paths cannot disagree on count (1024-quantum argument holds at the boundary)") {
    // two pieces scoring s and a composition scoring 2s + (1 extra
    // token) can never share a dpkey: 1024·ΔS = Δn forces ΔS = Δn = 0
    // for |Δn| < 1024 — pin with a vocab built to collide on raw
    // score sums
    val vocab = Seq(("x", -1000000L), ("xx", -2000000L))
    val got = Seq("xx").toDF("t")
      .select(Unigram.encode(col("t"), vocab, 4))
      .head.getSeq[String](0)
    // raw score sums tie (2·(-1e6) vs -2e6); the −1-per-token term
    // must break it toward the single piece
    assert(got === Seq("xx"))
  }

  test("driver-workload guard: an over-cap dict refuses loudly; the override admits it (r18 verdict task 4)") {
    // cells = Σ len·min(len, maxPieceLen); this dict is 5·25 = 125
    val bigDict = Seq(("abcde", 10L), ("fghij", 9L), ("klmno", 8L),
      ("pqrst", 7L), ("uvwxy", 6L))
    val e = intercept[IllegalArgumentException] {
      Unigram.trainOnDict(bigDict, vocabSize = 30, maxPieceLen = 8,
        emIters = 1, seedSize = 60, maxDriverCells = 100L)
    }
    assert(e.getMessage.contains("unigram trainer"),
      "the guard must say WHAT refused, not just 'requirement failed'")
    assert(e.getMessage.contains("maxDriverCells"))
    // same dict passes with the cap raised — and under the default cap
    val v = Unigram.trainOnDict(bigDict, vocabSize = 30, maxPieceLen = 8,
      emIters = 1, seedSize = 60, maxDriverCells = 200L)
    assert(v.nonEmpty)
    assert(Unigram.trainOnDict(bigDict, 30, 8, 1, 60).nonEmpty)
  }

  test("trainVocab end-to-end over a frame + committed-vocab sanity") {
    val docs = Seq((1L, "spark spark stream stream streaming"),
      (2L, "spark streams")).toDF("doc_id", "text")
    val v = Unigram.trainVocab(docs, "text", vocabSize = 20,
      maxPieceLen = 4, emIters = 2)
    assert(v.nonEmpty && v.forall(_._2 <= 0L))
    // the committed fixture must not still be the placeholder
    assert(graft.operators.UnigramVocab.vocab.size > 1,
      "UnigramVocab must hold the trained table")
    val n = docs.select(Unigram.tokenCount(col("text"), v, 4))
      .as[Int].collect()
    assert(n.forall(_ > 0))
  }
}
