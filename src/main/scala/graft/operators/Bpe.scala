package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: a REAL learned subword tokenizer (Sennrich et
  * al. 2016, arXiv:1508.07909) — the exact-token-budget upgrade over
  * [[TextAnalysis.bpeishTokenCount]]'s regex proxy, for the packing /
  * sampling paths that need true token counts under a trained vocab.
  *
  * Scale split, 100 TB-honest:
  *  - TRAINING reduces the corpus to a weighted word dictionary with
  *    one distributed aggregate, keeps the top `maxWords` by
  *    frequency (a bounded TakeOrdered — classic BPE trainers cap
  *    the dict the same way), and learns `numMerges` merges on the
  *    driver over that bounded dict. Driver cost is
  *    O(maxWords·numMerges) symbol scans — seconds for the usual
  *    50k-word / few-k-merge regime — and NEVER touches raw text
  *    again.
  *  - ENCODING is map-only: the merge table broadcasts inside a
  *    native expression ([[graft.functions.BpeEncodeExpr]], codegen'd
  *    like the minhash family) that greedily applies merges by rank
  *    per word. No shuffle, no UDF.
  *
  * Determinism: word-dict tiebreak is (freq desc, word asc); merge
  * tiebreak is (pair count desc, pair lexicographic asc) — training
  * twice on the same corpus yields the identical merge list, and
  * encoding is a pure function of (text, merges).
  */
object Bpe {

  /** One learned merge: adjacent symbols `a`+`b` fuse to `ab`. */
  type Merge = (String, String)

  /** Learn `numMerges` merges from the corpus's word-frequency
    * dictionary (whitespace words, matching
    * [[TextAnalysis.tokens]]), capped at the `maxWords` most
    * frequent words.
    */
  def trainMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 50000,
      endOfWord: String = ""): Seq[Merge] = {
    val dict = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")) // deterministic dict cut
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnDict(dict.toSeq, numMerges, endOfWord)
  }

  /** The driver-side learner over a bounded weighted dict (exposed
    * for specs and for callers with a precomputed vocabulary).
    */
  def trainOnDict(dict: Seq[(String, Long)], numMerges: Int,
      endOfWord: String = ""): Seq[Merge] = {
    // words as mutable symbol sequences; merges rewrite them in place.
    // endOfWord (Sennrich's </w>) rides on the last symbol so learned
    // merges distinguish word-final contexts and decode can restore
    // word boundaries.
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, n) =>
        val syms = w.map(_.toString).toArray
        if (endOfWord.nonEmpty && syms.nonEmpty)
          syms(syms.length - 1) = syms.last + endOfWord
        (syms, n)
      }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    while (i < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[Merge, Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j + 1 < syms.length) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      if (counts.isEmpty) return merges.toSeq
      // max count, then lexicographic pair — a total order, so the
      // learned sequence is reproducible
      val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
      merges += best
      words = words.map { case (syms, n) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == best._1 && syms(j + 1) == best._2) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        (out.toArray, n)
      }
      i += 1
    }
    merges.toSeq
  }

  /** Subword tokens of `text` under the learned merges:
    * `array<string>`, map-only, codegen'd.
    */
  def encode(text: Column, merges: Seq[Merge], endOfWord: String = ""): Column =
    graft.functions.BpeEncodeExpr.encode(text, merges, endOfWord)

  /** Inverse of [[encode]] under an end-of-word marker: fuse the
    * subword stream back into text (single-space word joins — BPE is
    * lossless up to whitespace normalization). Pure builtins,
    * map-only. Requires the marker the encoder used; without one,
    * word boundaries do not survive the flat token stream.
    */
  def decode(tokens: Column, endOfWord: String): Column = {
    require(endOfWord.nonEmpty, "decode needs the end-of-word marker the encoder used")
    trim(replace(array_join(tokens, ""), lit(endOfWord), lit(" ")))
  }

  /** True token count under the learned vocab — the packing-budget
    * column.
    */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    size(encode(text, merges))

  /** DuckDB replay of [[tokenCount]] under a FIXED merge table
    * (round 12 — the `q_bpe_tokens` oracle): per-doc token counts
    * computed by actually running the BPE encode in SQL.
    *
    * Replay strategy: the greedy lowest-rank-first loop
    * ([[graft.functions.BpeEncodeExpr]]) is equivalent to ONE
    * exhaustive pass per merge IN RANK ORDER, because trained ranks
    * are topologically ordered — a pair's composite symbols can only
    * come from strictly earlier merges, and fusing a pair never
    * re-creates that same pair nor any lower-ranked one (fusions
    * replace two symbols with one; the new adjacencies always involve
    * the composite). So the recursive CTE steps `it = rank`, joining
    * ONE merge row per iteration — no aggregates in the recursive
    * term, bounded depth = merge count.
    *
    * Symbol-sequence state is ONE VARCHAR (the CLAUDE.md fold-state
    * discipline): symbols joined by TWO spaces with single-space
    * padding, so the rank-`r` exhaustive fuse is a plain `replace` of
    * `' a  b '` with `' ab '` — boundary-anchored (symbols never
    * contain spaces) and correct on consecutive occurrences because
    * each match consumes only one space of each double gap.
    * Encoding runs once per DISTINCT corpus word (materialized CTE),
    * then joins back to per-doc token instances.
    */
  def bpeTokensDuckSql(
      merges: Seq[Merge],
      toksOf: String => String,
      table: String = "documents",
      idCol: String = "doc_id",
      textCol: String = "text"): String = {
    require(merges.nonEmpty, "bpeTokensDuckSql: empty merge table")
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val values = merges.zipWithIndex
      .map { case ((a, b), r) => s"($r, ${q(a)}, ${q(b)})" }
      .mkString(", ")
    s"""WITH RECURSIVE
       |bpe_m AS MATERIALIZED (
       |  SELECT * FROM (VALUES $values) t(r, a, b)),
       |bpe_w AS MATERIALIZED (
       |  SELECT DISTINCT u.w
       |  FROM $table, unnest(${toksOf(textCol)}) AS u(w)),
       |bpe_it AS (
       |  SELECT w,
       |    ' ' || array_to_string([w[i] for i in range(1, len(w) + 1)], '  ')
       |      || ' ' AS s,
       |    0 AS it
       |  FROM bpe_w
       |  UNION ALL
       |  SELECT b.w,
       |    replace(b.s, ' ' || m.a || '  ' || m.b || ' ',
       |                 ' ' || m.a || m.b || ' '),
       |    b.it + 1
       |  FROM bpe_it b JOIN bpe_m m ON m.r = b.it),
       |bpe_n AS (
       |  SELECT w, len(string_split(trim(s), '  ')) AS n
       |  FROM bpe_it WHERE it = ${merges.length}),
       |bpe_doc AS (
       |  SELECT d.$idCol, u.w
       |  FROM $table d, unnest(${toksOf(s"d.$textCol")}) AS u(w)),
       |bpe_agg AS (
       |  SELECT t.$idCol, sum(f.n) AS n
       |  FROM bpe_doc t JOIN bpe_n f ON f.w = t.w
       |  GROUP BY 1)
       |SELECT d.$idCol, CAST(coalesce(a.n, 0) AS INTEGER) AS n_bpe_tokens
       |FROM $table d LEFT JOIN bpe_agg a USING ($idCol)""".stripMargin
  }
}
