package graft

import org.apache.spark.sql.functions._

import graft.operators.Keywords

/** Inverted index + conjunctive retrieval: build correctness, the
  * blocked/unblocked equivalence (block concatenation in block order
  * IS the sorted posting list), and index-vs-corpus search parity.
  */
class SearchSpec extends SparkSpecBase {

  import spark.implicits._

  private val docs = Seq(
    (10L, "a b c a"),
    (20L, "b c"),
    (30L, "a d"),
    (40L, "b a d d"))
    .toDF("id", "text")

  test("invertedIndex: sorted distinct postings + df per token") {
    val got = Keywords.invertedIndex(docs, "id", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getSeq[Long](3))))
      .toMap // token -> (df, postings)
    assert(got("a") === ((3L, Seq(10L, 30L, 40L))))
    assert(got("b") === ((3L, Seq(10L, 20L, 40L))))
    assert(got("c") === ((2L, Seq(10L, 20L))))
    assert(got("d") === ((2L, Seq(30L, 40L))))
  }

  test("blocked index: concatenating a token's blocks in order equals the unblocked list") {
    val whole = Keywords.invertedIndex(docs, "id", "text")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](3)).toMap
    val blocked = Keywords.invertedIndex(docs, "id", "text", docsPerBlock = 25L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](3)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.sortBy(_._2).flatMap(_._3).toSeq
      }
    assert(blocked === whole)
    // and the split actually happened: 'a' spans doc ranges [0,25) and [25,50)
    val aBlocks = Keywords.invertedIndex(docs, "id", "text", docsPerBlock = 25L)
      .filter(col("token") === "a").collect().map(_.getLong(1)).sorted
    assert(aBlocks.toSeq === Seq(0L, 1L))
  }

  test("blocked index: block ids are integer-exact past the double mantissa") {
    // 2^53+1 and 2^53+2 are indistinguishable as doubles; integer `div`
    // must still separate adjacent blocks up there.
    val big = (1L << 53) + 1L
    val wide = Seq((big, "x"), (big + 1L, "x")).toDF("id", "text")
    val blocks = Keywords.invertedIndex(wide, "id", "text", docsPerBlock = 1L)
      .collect().map(_.getLong(1)).sorted
    assert(blocks.toSeq === Seq(big, big + 1L))
  }

  test("searchAll: every term required; hits counts all occurrences") {
    val got = Keywords.searchAll(docs, "id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 10: a×2 b×1 = 3 hits; doc 40: a×1 b×1 = 2; docs 20/30 lack a term
    assert(got === Set((10L, 3L), (40L, 2L)))
  }

  test("searchAll: duplicate query terms don't change the required count") {
    val got = Keywords.searchAll(docs, "id", "text", Seq("a", "a", "d"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(30L, 40L))
  }

  test("bm25: hand-computed score on a two-doc corpus") {
    // doc 1: "a a b" (dl 3), doc 2: "b c" (dl 2); query = a
    // N=2, avgdl=2.5, df(a)=1, tf=2
    // score = (2/1) * (2*2.2) / (2 + 1.2*(0.25 + 0.75*3/2.5))
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "t")
    val got = Keywords.bm25(df, "id", "t", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = 2.0 / 1 * (2 * (1.2 + 1.0)) /
      (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert(got.keySet === Set(1L))
    assert(math.abs(got(1L) - expected) < 1e-6, s"${got(1L)} vs $expected")
  }

  test("bm25: tf saturates below idf·(k1+1); same tf in a shorter doc scores higher") {
    val df = Seq(
      (1L, "a " * 50 + "x " * 50),  // tf 50, dl 100 — deep saturation
      (2L, "a " * 5 + "x " * 5),    // tf 5,  dl 10
      (3L, "a " * 5 + "x " * 45),   // tf 5,  dl 50 — same tf, longer
      (4L, "x " * 30))              // padding for avgdl
      .toDF("id", "t")
    val got = Keywords.bm25(df, "id", "t", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // saturation ceiling: score < idf·(k1+1) = (4/3)·2.2
    val ceiling = 4.0 / 3 * 2.2
    assert(got.values.forall(_ < ceiling), got)
    // 10× the tf buys well under 2× the score
    assert(got(1L) < got(2L) * 2)
    // length normalization: same tf, shorter doc wins
    assert(got(2L) > got(3L))
  }

  test("searchIndex over a blocked index matches searchAll over the corpus") {
    val idx = Keywords.invertedIndex(docs, "id", "text", docsPerBlock = 25L)
    val viaIndex = Keywords.searchIndex(idx, Seq("a", "b"))
      .collect().map(_.getLong(0)).toSet
    val viaCorpus = Keywords.searchAll(docs, "id", "text", Seq("a", "b"))
      .collect().map(_.getLong(0)).toSet
    assert(viaIndex === viaCorpus)
  }
}
