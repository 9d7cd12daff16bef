package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materialize}

/** The shared micro-batch acceptance core behind the streaming
  * near-dup gates — [[NearDupGate]] (MinHash signatures, text) and
  * [[Hamming64Gate]] (64-bit perceptual/SimHash signatures: text,
  * image, audio). Both gates share the exact same state discipline
  * (documented in [[NearDupGate]]'s scaladoc): table-backed
  * band/bucket-blocked state, first-wins chain collapse, keeper
  * tagging in exact mode, idempotent batch-id-partitioned writes —
  * only the signature representation and the two join predicates
  * differ, so those arrive as parameters.
  */
private[graft] object SigGate {

  /** Shared with the batch keeper-dedup entry points — see
    * [[Dedup.defaultAutoStarPairsCap]] for the calibration.
    */
  val defaultAutoStarPairsCap: Long = Dedup.defaultAutoStarPairsCap

  /** [[Dedup.estIntraPairs]] — the EXACT occupancy aggregate, kept as
    * the streaming-facing name for specs and as
    * [[Dedup.materializeSigsProbed]]'s fallback. The gates themselves
    * no longer call it per batch: since round 14 the estimate rides
    * the signature materialization as F2 observe metrics
    * ([[Dedup.sigsWithStarDecision]] — zero extra jobs).
    */
  private[graft] def estIntraPairs(sigs: DataFrame): Long =
    Dedup.estIntraPairs(sigs)

  // The auto-star decision contract ([[Dedup.useStar]] /
  // [[Dedup.sigsWithStarDecision]] — every gate routes its banded
  // sigs through it): forced by the caller knob, or tripped by the
  // bucket-occupancy probe riding the signature materialization.
  // Deterministic for given batch contents. `cap = Long.MaxValue`
  // pins all-pairs semantics unconditionally (no estimate computed,
  // no probe node attached). The DRIVER-CHECKED replay queries
  // deliberately run the DEFAULT cap instead: their oracles stay
  // valid because the calibration (Dedup.defaultAutoStarPairsCap)
  // puts the oracle corpora orders of magnitude below the trip
  // point, and running defaults is the point — the hard gate
  // exercises exactly the configuration a production caller gets. A
  // trip is LOGGED (warn) so a data-dependent semantics switch is
  // observable, and the star semantics carry their own hash-exact
  // oracle rows (q_dedup_docs_star, q_stream_neardup_star, …).

  /** One micro-batch acceptance step over pre-banded signatures.
    *
    * @param bandedSigs this batch's `(doc_id, sig, band, bucket)`
    *                   rows, MATERIALIZED by the caller (joined twice
    *                   below)
    * @param state      prior-batch state rows `(doc_id, sig, band,
    *                   bucket, keeper, …)`, already filtered to
    *                   batches strictly before `batchId`
    * @param matchCond  the cross-history match predicate over aliases
    *                   `a` (batch) and `s` (state)
    * @param intraPairs intra-batch candidate pairs `(id_a, id_b, …)`
    * @return the accepted subset of `batch`; commits this batch's
    *         signature rows (accepted-only, or all keeper-tagged when
    *         `exact`) under `stateDir/batch_id=batchId`
    */
  def acceptBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      bandedSigs: DataFrame,
      state: DataFrame,
      matchCond: Column,
      intraPairs: DataFrame,
      stateDir: String,
      exact: Boolean): DataFrame = {
    // Stream-history matches resolved to the matched doc's KEEPER
    // (for accepted state rows keeper = the doc itself; in exact mode
    // a rejected row hands over its accepted keeper, so chains
    // resolve transitively without walking them). min() makes the
    // multi-match case deterministic.
    val extKeeper = bandedSigs.as("a").join(state.as("s"), matchCond)
      .select(col("a.doc_id").as("id"), col("s.keeper").as("k"))
      .groupBy("id").agg(min(col("k")).as("ext_keeper"))
    // Intra-batch duplicate components (same CC as the batch ops);
    // docs in no candidate pair are their own singleton component.
    val comp = Dedup.connectedComponents(intraPairs)
    val compFull = bandedSigs.select(col("doc_id").as("id")).distinct()
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    // A component keeper: the earliest state keeper any member
    // touches (the component joins an existing chain — batch CC would
    // have merged them, so ALL members reject), else the component's
    // min id (its root, the only accepted member).
    val compKeeper = compFull.join(extKeeper, Seq("id"), "left")
      .groupBy("component").agg(min(col("ext_keeper")).as("ek"))
      .select(col("component"), coalesce(col("ek"), col("component")).as("keeper"))
    // Materialized: `resolved` anchors BOTH the accepted output and
    // the state write — un-cut, each would re-run the state join
    // (the gate's most expensive stage).
    val resolved = Materialize(compFull.join(compKeeper, "component")
      .select(col("id"), col("keeper")))
    val rejected = resolved.filter(col("id") =!= col("keeper"))
    val accepted = batch.join(rejected, batch(idCol) === rejected("id"), "left_anti")
    // State is written COMPACT — one (doc_id, sig, keeper) row per
    // doc; band/bucket rows are derivable from the signature and the
    // reader re-expands them (NearDupGate.bandState / the gates'
    // banding passes). Persisting the banded form multiplied state
    // bytes ×bands: the signature is the bulk of each row, and
    // exact-mode state is corpus-sized at stream scale.
    val compact = bandedSigs.select(col("doc_id"), col("sig"))
      .dropDuplicates("doc_id")
    val stateOut =
      if (exact)
        compact.join(resolved, compact("doc_id") === resolved("id"))
          .select(compact("doc_id"), col("sig"), col("keeper"))
      else
        compact.join(rejected, compact("doc_id") === rejected("id"), "left_anti")
          .withColumn("keeper", col("doc_id"))
    stateOut
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(stateDir)
    accepted
  }
}
