package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det

/** TF-IDF keyword extraction over a document corpus — the classic
  * "what is this document about" signal used for topic tagging and
  * quality triage in training-data pipelines.
  *
  * Distributed shape (all shuffles key-partitioned, no driver
  * collection, no broadcast of anything corpus-sized):
  *   1. explode tokens → map-side partial count → shuffle on
  *      (doc, token) = per-doc TF;
  *   2. shuffle on token = document frequency (vocabulary-sized,
  *      NOT broadcast — vocab grows with the corpus);
  *   3. equi-join TF × DF on token (AQE picks the strategy);
  *   4. per-doc window for the top-k cut (shuffle on doc).
  * The corpus size joins in as a broadcast of exactly ONE row.
  */
object Keywords {

  /** Rational IDF score: `tf * n_docs / df`, computed as an exact
    * integer product with one double division, Det-rounded — every
    * engine produces the same cell. Monotone in the same direction
    * as log-IDF for fixed tf ([[logTfIdf]] is the conventional
    * variant; its `ln` is libm-dependent, so the ORACLE-checked
    * surface uses this exact-rational form).
    */
  private def rationalScore(tf: Column, nDocs: Column, df: Column): Column =
    Det.round((tf * nDocs).cast("double") / df, 4)

  /** Conventional `tf * ln(n_docs / df)` — for ranking use; not
    * cross-engine-exact (ln differs by ULPs between libms).
    */
  def logTfIdf(tf: Column, nDocs: Column, df: Column): Column =
    tf.cast("double") * log(nDocs.cast("double") / df.cast("double"))

  /** Top-`k` keywords per document by rational TF-IDF; ties broken
    * by token asc (fully deterministic output).
    *
    * Returns (id, token, tf, df, score, rank).
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tok = docs.select(
      col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // Materialized once: TF feeds both the document-frequency
    // aggregate and the score join — two instantiations of the
    // explode + count pass otherwise (val sharing does not dedupe
    // plans). One compact row per (doc, distinct token).
    val tf = Materialize(tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf")))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs")) // 1 row — broadcast
    val scored = tf.join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", rationalScore(col("tf"), col("n_docs"), col("df")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
}
