package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, MinHashSigExpr, ShingleHashModExpr}
import graft.operators.TextAnalysis

/** Round-17 map-pass arithmetic: the fused/fast forms must be
  * BIT-IDENTICAL to the composed forms they replace — the whole
  * minhash/simhash oracle surface rides on these values.
  */
class TokenHashesParitySpec extends SparkSpecBase {

  import spark.implicits._

  // whitespace zoo: every Java-regex \s byte, runs, NBSP (NOT \s —
  // must stay inside a token), CJK, combining marks, emoji, empties
  private val edges = Seq(
    "plain words here",
    "  leading and trailing  ",
    "tab\tsep\nnewline\rcrvtff",
    "nbsp stays one-token",
    "héllo wörld 你好 😀 é",
    "", " ", "\t\n", "one",
    "a  b   c\t\t d")

  private def corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("text")).as[String].collect().toSeq ++ edges

  test("tokenHashesP ≡ transform(tokens, tokenHashP) — bit-exact, incl. null") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("i", "text")
    val mismatches = df.select(
        HashExprs.tokenHashesP(col("text")).as("fused"),
        transform(TextAnalysis.tokens(col("text")),
          t => TextAnalysis.tokenHashP(t)).as("composed"))
      .filter(not(col("fused") === col("composed")))
      .count()
    assert(mismatches === 0L)
    val nulls = Seq(Tuple1(null: String)).toDF("text")
      .select(HashExprs.tokenHashesP(col("text"))).head
    assert(nulls.isNullAt(0), "null text stays null, like the composed form")
  }

  test("tokenHashes64 ≡ transform(tokens, tokenHash64) — bit-exact") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("i", "text")
    val mismatches = df.select(
        HashExprs.tokenHashes64(col("text")).as("fused"),
        transform(TextAnalysis.tokens(col("text")),
          t => TextAnalysis.tokenHash64(t)).as("composed"))
      .filter(not(col("fused") === col("composed")))
      .count()
    assert(mismatches === 0L)
  }

  test("tokenHashesXx ≡ transform(tokens, xxhash64) — bit-exact vs the BUILTIN") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("i", "text")
    val mismatches = df.select(
        HashExprs.tokenHashesXx(col("text")).as("fused"),
        transform(TextAnalysis.tokens(col("text")),
          t => xxhash64(t)).as("composed"))
      .filter(not(col("fused") === col("composed")))
      .count()
    assert(mismatches === 0L)
  }

  test("tokenFeatureIds ≡ transform(tokens, featureId) — bit-exact") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("i", "text")
    for (dim <- Seq(1, 7, 64, 4096)) {
      val mismatches = df.select(
          HashExprs.tokenFeatureIds(coalesce(col("text"), lit("")), dim)
            .as("fused"),
          transform(TextAnalysis.tokens(coalesce(col("text"), lit(""))),
            t => graft.operators.Classifier.featureId(t, dim)).as("composed"))
        .filter(not(col("fused") === col("composed")))
        .count()
      assert(mismatches === 0L, s"dim=$dim")
    }
  }

  test("Mersenne modP ≡ floorMod at every boundary shape") {
    val p = MinHashSigExpr.P
    val probes = Seq(0L, 1L, p - 1, p, p + 1, 2 * p, 2 * p + 1,
      (1L << 31), (1L << 32) - 1, (1L << 32), (1L << 62) - 1,
      (p - 1) * (p - 1) + (p - 1), // the lane loop's max operand
      123456789012345L, Long.MaxValue / 2)
    probes.foreach { x =>
      assert(MinHashSigExpr.modP(x) === java.lang.Math.floorMod(x, p),
        s"x=$x")
    }
  }

  test("native lshBands ≡ composed sequence/slice/concat_ws/xxhash64 chain") {
    def composed(sig: org.apache.spark.sql.Column, bands: Int, rows: Int) =
      transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(
          b.as("band"),
          xxhash64(concat_ws(",",
            transform(slice(sig, b * lit(rows) + 1, lit(rows)),
              c => c.cast("string")))).as("bucket")))
    // real signatures plus crafted shapes: short final band, empty
    // band, negative lanes, single-lane bands
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.operators.Dedup.minhashSignature(col("text"), 3, 64)
        .as("sig"))
    val crafted = Seq(
      Seq(1L, 2L, 3L, 4L, 5L),          // short final band at rows=2
      Seq(-9L, Long.MinValue, 7L, 0L),  // negative / extreme lanes
      Seq(42L),                          // most bands empty
      Seq.empty[Long]).toDF("sig")
    for ((df, bands, rows) <- Seq((real, 16, 4), (crafted, 3, 2),
        (crafted, 4, 1))) {
      val mismatches = df.select(
          graft.operators.Dedup.lshBands(col("sig"), bands, rows).as("n"),
          composed(col("sig"), bands, rows).as("c"))
        .filter(not(col("n") === col("c")))
        .count()
      assert(mismatches === 0L, s"bands=$bands rows=$rows")
    }
  }

  test("rolling shingle hashes ≡ direct window refolds") {
    val p = ShingleHashModExpr.P
    val b = ShingleHashModExpr.B
    def direct(toks: Seq[Long], k: Int): Seq[Long] =
      if (toks.size < k)
        Seq(toks.foldLeft(0L)((h, t) => (h * b + t) % p))
      else toks.sliding(k)
        .map(_.foldLeft(0L)((h, t) => (h * b + t) % p)).toSeq
    val rnd = new scala.util.Random(17)
    val cases = Seq(
      Seq.empty[Long], Seq(5L), (1L to 4L).toSeq,
      Seq(p - 1, p - 1, p - 1, p - 1, p - 1, p - 1),
      Seq.fill(200)(rnd.nextLong(p)),
      Seq.fill(5)(0L))
    for (toks <- cases; k <- Seq(1, 3, 5)) {
      val got = ShingleHashModExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(toks.toArray), k)
        .toLongArray().toSeq
      assert(got === direct(toks, k), s"k=$k toks=${toks.take(8)}…")
    }
  }

  test("minhash signature end-to-end unchanged on real docs (pinned lane values)") {
    // the composed-vs-fused parity above implies this, but pin one
    // real end-to-end signature so any future re-plumbing of
    // minhashSignature itself also trips a spec
    val sig = Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(1)
      .select(graft.operators.Dedup.minhashSignature(col("text"), 3, 64))
      .head.getSeq[Long](0)
    assert(sig.length === 64)
    assert(sig.forall(v => v >= 0 && v < MinHashSigExpr.P))
    // cross-check lanes against the fully-composed reference chain
    val ref = Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(1)
      .select(HashExprs.minhashSig(HashExprs.shingleHashesModP(
        transform(TextAnalysis.tokens(col("text")),
          t => TextAnalysis.tokenHashP(t)), 3), 64))
      .head.getSeq[Long](0)
    assert(sig === ref)
  }
}
