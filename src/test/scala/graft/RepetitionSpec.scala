package graft

import graft.operators.TextAnalysis

/** Gopher repetition-filter suite: hand-computed fractions, empty/
  * degenerate docs, and the aggregate+join (no in-array O(n²)
  * counting) plan shape.
  */
class RepetitionSpec extends SparkSpecBase {

  import spark.implicits._

  private def run(rows: (Long, String)*) =
    TextAnalysis.repetitionSignals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getInt(6))).toMap

  test("hand-computed: duplicated banner lines and a dominant bigram (repeats-only char convention)") {
    // doc 1: lines = [dup, alpha beta gamma delta, dup] → 3 lines,
    // duplicated LINES are n − n_distinct = 3 − 2 = 1 → 1/3;
    // dup chars use the SAME repeats-only convention (DataTrove/NeMo
    // reading of Rae et al. Table A1, pinned round 14): (c−1)·len =
    // (2−1)·3 = 3 of 3 + 22 + 3 = 28 total line chars. Tokens =
    // [dup, alpha, beta, gamma, delta, dup] → nt 6; bigrams all
    // distinct (c2 1) → top2 = 2/6; trigrams distinct (c3 1) →
    // top3 = 3/6.
    val got = run(1L -> "dup\nalpha beta gamma delta\ndup")
    val (nl, dupLine, dupChar, top2, top3, pass) = got(1L)
    assert(nl === 3L)
    assert(dupLine === 1000000L / 3)
    assert(dupChar === 3L * 1000000L / 28)
    assert(top2 === 2L * 1000000L / 6)
    assert(top3 === 3L * 1000000L / 6)
    assert(pass === 0) // dup_line 33% > 30%, top2 33% > 20%
  }

  test("convention parity: dup_line_char_ppm equals dup_line_ppm on uniform-length lines") {
    // With every line the same length, the repeats-only char fraction
    // must EQUAL the repeats-only line fraction — the property that
    // fails if the two metrics ever diverge in convention again
    // (the all-occurrences reading gives 2/4 chars vs 1/4 lines).
    val got = run(1L -> "aaaa\nbbbb\ncccc\naaaa")
    val (_, dupLine, dupChar, _, _, _) = got(1L)
    assert(dupLine === 1000000L / 4)
    assert(dupChar === dupLine,
      "char and line dup metrics must share the repeats-only convention")
  }

  test("clean doc passes; empty doc yields zeros and passes") {
    // a clean doc must be LONG enough that all-distinct n-grams sit
    // under the thresholds (top3 = 3/nt ≤ 18% needs nt ≥ 17 — the
    // Gopher rules are calibrated for real documents, and the
    // quality gate's length rule already rejects sub-10-token docs)
    val got = run(
      1L -> ("one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
      2L -> "",
      3L -> "x x x x x x x x") // one token repeated: top2 = max c2=7 → 14/8
    assert(got(1L)._6 === 1, got(1L))
    assert(got(2L) === ((0L, 0L, 0L, 0L, 0L, 1)))
    val (_, _, _, top2, top3, pass) = got(3L)
    assert(top2 === 7L * 2000000L / 8)
    assert(top3 === 6L * 3000000L / 8)
    assert(pass === 0)
  }

  test("plan: MAP-ONLY — no explode, no exchange (the round-18 fused scan)") {
    val df = TextAnalysis.repetitionSignals(
      Seq((1L, "a b c\nd e f")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    // every signal is per-document; the fused RepetitionCountsExpr
    // makes the whole suite one projection — a reappearing explode or
    // exchange means someone reverted to the shuffle formulation
    assert(!plan.contains("Generate explode"), "fused scan: no explode")
    assert(!plan.contains("Exchange"), "fused scan: map-only, no shuffle")
    // the O(n²) shape would nest ArrayFilter inside ArrayTransform
    assert(!plan.contains("array_filter(array_transform"),
      "no quadratic in-array counting")
  }

  test("fused counts ≡ independent brute force on a whitespace/unicode zoo") {
    // plain-Scala reimplementation — collections only, no shared code
    def brute(text: String): (Long, Long, Long, Long, Long, Long, Long) = {
      val rawLines = text.split("\n", -1)
      val lines = rawLines.filter(_.exists(_ != ' '))
      val nl = lines.length.toLong
      val chars = lines.map(l => l.codePointCount(0, l.length).toLong).sum
      val byLine = lines.groupBy(identity).view.mapValues(_.length)
      val dupl = byLine.values.map(c => (c - 1).toLong).sum
      val dupchars = byLine.collect { case (l, c) if c > 1 =>
        (c - 1).toLong * l.codePointCount(0, l.length) }.sum
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val nt = toks.length.toLong
      def maxc(n: Int): Long =
        if (toks.length < n) 0L
        else toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.length.toLong).max
      (nl, nt, dupl, dupchars, chars, maxc(2), maxc(3))
    }
    val zoo = Seq(
      "dup\nalpha beta gamma delta\ndup",
      "", " ", "\n\n\n", "\t\n\t",           // tab-only lines are KEPT
      "a b a b a b a b",
      "x", "x y", "x y z",
      "line one\nline one\nline one\nuniq",
      "café 中文\ncafé 中文",                  // non-ASCII code points
      "emoji 😀 x\nemoji 😀 x",                // supplementary
      "a  b   c\n  a  b   c  ",               // multi-space (distinct lines)
      "t1 t2 t3 t1 t2 t3 t1 t2")
    val got = TextAnalysis.repetitionSignals(
        zoo.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    zoo.zipWithIndex.foreach { case (t, i) =>
      val (nl, nt, dupl, dupchars, chars, c2, c3) = brute(t)
      val r = got(i.toLong)
      def ppm(a: Long, b: Long, scale: Long) =
        a * scale / math.max(b, 1L)
      assert(r.getLong(1) === nl, s"n_lines doc $i")
      assert(r.getLong(2) === ppm(dupl, nl, 1000000L), s"dup_line_ppm doc $i")
      assert(r.getLong(3) === ppm(dupchars, chars, 1000000L), s"dup_char doc $i")
      assert(r.getLong(4) === ppm(c2, nt, 2000000L), s"top2 doc $i")
      assert(r.getLong(5) === ppm(c3, nt, 3000000L), s"top3 doc $i")
    }
  }
}
