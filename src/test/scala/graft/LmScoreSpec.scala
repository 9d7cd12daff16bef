package graft

import org.apache.spark.sql.functions._

import graft.operators.LmScore

/** Unigram-LM quality scoring: hand-computed bits/OOV on a tiny
  * corpus, gate behavior, and the freq-bits identity.
  */
class LmScoreSpec extends SparkSpecBase {

  import spark.implicits._

  private val train = Seq(
    "the cat sat on the mat",      // the:2 cat:1 sat:1 on:1 mat:1
    "the dog sat on the rug",      // the:2 dog:1 sat:1 on:1 rug:1
    "the cat and the dog")         // the:2 cat:1 and:1 dog:1
    .toDF("text")
  // counts: the:6 cat:2 sat:2 on:2 dog:2 mat:1 rug:1 and:1
  // vocab (minCount=2): the(6) cat(2) sat(2) on(2) dog(2)

  test("freqBits = floor(log2(c))") {
    val got = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("c")
      .select(LmScore.freqBits(col("c")).as("b")).as[Long].collect()
    assert(got.toSeq === Seq(0L, 1L, 1L, 2L, 2L, 3L, 9L, 10L))
  }

  test("score: hand-computed OOV rate and mean bits") {
    val vocab = LmScore.unigramCounts(train, "text", minCount = 2)
    assert(vocab.count() === 5)

    val docs = Seq(
      (1L, "the cat sat"),         // in-vocab: the(6→2) cat(2→1) sat(2→1); bits 4/3
      (2L, "zebra quark the"),     // oov 2/3; in-vocab the → mean_bits 2.0
      (3L, "zebra quark"))         // all OOV
      .toDF("doc_id", "text")
    val got = LmScore.score(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()

    val r1 = got(0)
    assert(r1.getAs[Long]("n_tokens") === 3L)
    assert(r1.getAs[Long]("n_oov") === 0L)
    assert(r1.getAs[Double]("oov_rate") === 0.0)
    assert(r1.getAs[Double]("mean_bits") === 1.3333) // (2+1+1)/3

    val r2 = got(1)
    assert(r2.getAs[Long]("n_oov") === 2L)
    assert(r2.getAs[Double]("oov_rate") === 0.6667)
    assert(r2.getAs[Double]("mean_bits") === 2.0)

    val r3 = got(2)
    assert(r3.getAs[Long]("n_oov") === 2L)
    assert(r3.getAs[Double]("oov_rate") === 1.0)
    assert(r3.getAs[Double]("mean_bits") === 0.0) // no in-vocab instances
  }

  test("gate: two-sided cut keeps natural text, drops noise and all-rare docs") {
    val vocab = LmScore.unigramCounts(train, "text", minCount = 2)
    val docs = Seq(
      (1L, "the cat sat on the mat"), // low OOV, high bits → keep
      (2L, "zxq wvu zebra quark"),    // all OOV → drop
      (3L, ""))                       // no tokens → drop
      .toDF("doc_id", "text")
    val kept = LmScore.gate(docs, "doc_id", "text", vocab,
      maxOovRate = 0.5, minMeanBits = 1.0)
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(kept.columns.toSeq === docs.columns.toSeq) // schema unchanged
  }

  test("plan: TF join side carries one row per (doc, distinct token), not per instance") {
    // The skew absorber: scoring joins the per-doc TF aggregate, so a
    // token repeated k times in one doc hits the vocab join once.
    val vocab = LmScore.unigramCounts(train, "text")
    val doc = Seq((1L, ("the " * 1000).trim)).toDF("doc_id", "text")
    val got = LmScore.score(doc, "doc_id", "text", vocab).collect().head
    assert(got.getAs[Long]("n_tokens") === 1000L)
    assert(got.getAs[Double]("mean_bits") === 2.0) // the:6 → floor(log2 6)=2
  }
}
