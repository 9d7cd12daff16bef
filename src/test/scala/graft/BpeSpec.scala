package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Learned BPE tokenizer ([[graft.operators.Bpe]]): the Sennrich
  * toy-corpus merge sequence, greedy rank-ordered encoding of unseen
  * words, training determinism, and the distributed train → map-only
  * encode path end to end.
  */
class BpeSpec extends SparkSpecBase {

  import spark.implicits._

  // the classic worked example (Sennrich et al. 2016, fig. 1 shape)
  private val toyDict = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainOnDict learns the classic merge sequence with deterministic ties") {
    val merges = Bpe.trainOnDict(toyDict, numMerges = 4)
    // es(9) ties st(9) → lexicographic; then est(9); lo(7) ties ow(7)
    // → lexicographic; then low(7)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encode segments an UNSEEN word into learned subwords") {
    val merges = Bpe.trainOnDict(toyDict, numMerges = 4)
    val got = Seq("lowest newest").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .collect().head.getSeq[String](0)
    // "lowest" never appears in the dict but factors into low + est
    assert(got === Seq("low", "est", "n", "e", "w", "est"))
  }

  test("training is deterministic and encode is stable under repartitioning") {
    val docs = toyDict.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val m1 = Bpe.trainMerges(docs, "text", numMerges = 6)
    val m2 = Bpe.trainMerges(docs.repartition(5), "text", numMerges = 6)
    assert(m1 === m2)
    assert(m1.take(4) === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val counts = docs.select(Bpe.tokenCount(col("text"), m1).as("n"))
      .as[Int].collect()
    assert(counts.forall(_ > 0))
  }

  test("corpus roundtrip: concatenating a word's encoded symbols restores the word") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 60, maxWords = 2000)
    assert(merges.size === 60)
    val rows = corpus.limit(20)
      .select(col("text"), Bpe.encode(col("text"), merges).as("toks"))
      .collect()
    rows.foreach { r =>
      val joinedToks = r.getSeq[String](1).mkString
      val joinedWords = r.getString(0).trim.split("\\s+").filter(_.nonEmpty).mkString
      // lossless segmentation: merges never drop or alter characters
      assert(joinedToks === joinedWords)
    }
  }

  test("end-of-word marker: merges learn word-final context, decode inverts encode") {
    val dict = Seq(("low", 5L), ("lowest", 2L), ("slow", 3L))
    val merges = Bpe.trainOnDict(dict, 8, endOfWord = "</w>")
    // word-final 'w' ("low</w>", "slow</w>") and word-internal 'w'
    // ("lowest") are now distinct symbols
    assert(merges.exists { case (a, b) => (a + b).endsWith("</w>") })

    val docs = Seq("low lowest slow", "  slow   low ", "").toDF("text")
    val got = docs.select(
      Bpe.decode(Bpe.encode(col("text"), merges, "</w>"), "</w>").as("d"))
      .as[String].collect()
    assert(got.toSeq === Seq("low lowest slow", "slow low", ""))
  }

  test("marked roundtrip on real corpus restores whitespace-normalized text") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMerges(corpus, "text",
      numMerges = 60, maxWords = 2000, endOfWord = "</w>")
    val bad = corpus.select(
      Bpe.decode(Bpe.encode(col("text"), merges, "</w>"), "</w>").as("d"),
      regexp_replace(trim(col("text")), "\\s+", " ").as("norm"))
      .filter(col("d") =!= col("norm")).count()
    assert(bad === 0L)
  }

  test("decode without a marker is rejected") {
    intercept[IllegalArgumentException] {
      Bpe.decode(col("toks"), "")
    }
  }
}
