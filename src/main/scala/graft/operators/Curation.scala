package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline — the composition every
  * training-data build actually runs, expressed entirely from the
  * library's own operators so the whole flow stays ONE Catalyst plan
  * chain (each stage's filters and projections keep flowing into the
  * next; nothing materializes between stages unless a stage's own
  * scale discipline says so):
  *
  *   1. quality gate   — [[TextAnalysis.qualityGate]] (Gopher rules;
  *                       map-only pass over the corpus);
  *   2. near-dup dedup — [[Dedup.dropNearDuplicates]] (MinHash bands,
  *                       CC min-id keeper; banded equi-joins only);
  *   3. token budget   — [[Sampling.tokenBudgetPerGroup]] per
  *                       language (mixture provisioning in tokens,
  *                       one grouped window);
  *   4. split          — [[TextAnalysis.splitBucket]] id-hash
  *                       train/valid assignment. Plain id hashing is
  *                       leakage-safe HERE because stage 2 already
  *                       removed every near-duplicate: the pair that
  *                       would straddle the split no longer exists
  *                       (the pre-dedup form needs
  *                       [[Dedup.leakageSafeSplit]]'s component keys).
  *
  * Deterministic end to end (gate rules are Det-rounded ratios,
  * dedup is integer signature arithmetic, budget order is the id
  * hash, split is integer mod), so the WHOLE pipeline is one
  * hash-exact oracle — the composed SQL reuses each stage's existing
  * DuckDB twin verbatim (`q_curate`).
  */
object Curation {

  /** Run the full pipeline. Output: one row per surviving document —
    * `(idCol, langCol, n_tokens, split)`.
    *
    * @param budgetPerLang token budget each language may keep
    * @param validPct      percent of the 100 hash buckets assigned to
    *                      the validation split
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      budgetPerLang: Long,
      validPct: Int = 10): DataFrame = {
    require(validPct >= 1 && validPct <= 99, "curate: validPct must be in [1, 99]")
    // map-only gate filter (round 19): the verdict is per-row, so no
    // join-back — the 5M probe priced the old semi-join at 22 s of
    // full-text shuffle for a 2.8 s scan
    val gated = TextAnalysis.qualityKeep(docs, textCol)
    val kept = Dedup.dropNearDuplicates(gated, idCol, textCol)
    val withTokens = kept.select(col(idCol), col(langCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    Sampling.tokenBudgetPerGroup(withTokens, langCol, idCol, "n_tokens",
        budgetPerLang)
      .withColumn("split",
        when(TextAnalysis.splitBucket(col(idCol)) < lit(100 - validPct),
          lit("train")).otherwise(lit("valid")))
  }
}
