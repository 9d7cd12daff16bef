package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Det

/** Unigram language-model quality scoring — the integer-exact
  * restatement of CCNet-style perplexity filtering (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data"): documents whose tokens are mostly rare or
  * out-of-vocabulary relative to a trusted reference corpus are
  * disproportionately boilerplate, encoding noise, or keyword
  * stuffing, and get filtered before training.
  *
  * Instead of a floating log-probability (libm `ln` differs at the
  * last ulp across engines — the CLAUDE.md determinism invariant),
  * the score is stated in exact integer arithmetic: every
  * in-vocabulary token instance contributes `floor(log2(count))`
  * "frequency bits", computed as `length(bin(count)) - 1` (both
  * Spark and DuckDB print minimal binary), and the document score is
  * the instance-weighted mean. This is monotone in the geometric
  * mean of token frequency — the same ranking signal as negative
  * unigram perplexity — but bit-for-bit reproducible in any engine
  * with integer binary formatting. The companion signal is the OOV
  * rate: the fraction of token instances absent from (or below the
  * count floor of) the reference vocabulary.
  *
  * Distributed shape (nothing corpus-sized on the driver or
  * broadcast):
  *   1. explode tokens → map-side partial count → one shuffle on
  *      (doc, token): per-doc term frequency. This pre-aggregation
  *      is also the Zipf-skew absorber — "the" appears once per doc
  *      on the join side, not once per occurrence;
  *   2. vocabulary = token-keyed aggregate of the training slice
  *      (vocabulary-sized, NOT broadcast — it grows with the corpus);
  *   3. left equi-join TF × vocab on token (AQE handles the residual
  *      head-token skew);
  *   4. doc-keyed aggregate back to one score row per document.
  */
object LmScore {

  /** `floor(log2(c))` for `c >= 1`, as exact integer arithmetic:
    * the bit length of the minimal binary representation, minus 1.
    */
  def freqBits(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /** Unigram vocabulary of a reference corpus: one row per token
    * with its total occurrence count, tokens below `minCount`
    * dropped (hapaxes carry no frequency signal and double the
    * vocabulary size in a Zipf corpus).
    */
  def unigramCounts(train: DataFrame, textCol: String, minCount: Long = 2): DataFrame =
    train
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)

  /** Score `docs` against a `(token, c)` vocabulary (shape of
    * [[unigramCounts]]). Returns one row per document that has at
    * least one token: `(id, n_tokens, n_oov, oov_rate, mean_bits)`
    * where `oov_rate` is the OOV instance fraction and `mean_bits`
    * the mean `floor(log2(count))` over in-vocabulary instances
    * (0.0 when every token is OOV), both Det-rounded to 4 dp.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("k"))
    scoreTf(tf, idCol, vocab)
  }

  /** [[score]] over an already-built `(id, token, k)` term-frequency
    * frame — the entry point when TF is shared with other passes
    * (TF-IDF, heavy hitters) and materialized once.
    */
  def scoreTf(tf: DataFrame, idCol: String, vocab: DataFrame): DataFrame = {
    val inV = col("c").isNotNull
    tf.join(vocab, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_tokens"),
        sum(when(inV, lit(0L)).otherwise(col("k"))).as("n_oov"),
        sum(when(inV, col("k") * freqBits(col("c"))).otherwise(lit(0L))).as("__bits"),
        sum(when(inV, col("k")).otherwise(lit(0L))).as("__n_in"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_oov"),
        Det.round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_rate"),
        Det.round(col("__bits").cast("double") / greatest(col("__n_in"), lit(1L)), 4)
          .as("mean_bits"))
  }

  /** Quality gate: keep documents whose OOV rate is at most
    * `maxOovRate` AND whose mean frequency bits reach `minMeanBits`
    * — the two-sided CCNet cut (too many unknown tokens = noise;
    * all-rare vocabulary = unnatural text). Documents with zero
    * tokens score as fully OOV and are dropped. Schema of `docs`
    * unchanged; one doc-keyed semi-join beyond [[score]].
    */
  def gate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      maxOovRate: Double = 0.5,
      minMeanBits: Double = 1.0): DataFrame = {
    val keep = score(docs, idCol, textCol, vocab)
      .filter(col("oov_rate") <= maxOovRate && col("mean_bits") >= minMeanBits)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
