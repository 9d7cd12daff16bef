package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming MinHash near-dup gate: first-wins dedup of a document
  * stream, with state held in a TABLE rather than the executor state
  * store.
  *
  * Why table-backed state: the accepted-signature set for a 100 TB
  * corpus is billions of rows — far past what per-key stream state
  * wants to hold, and the candidate check is a JOIN against all
  * previously accepted signatures sharing an LSH bucket, which is not
  * a per-key lookup (`mapGroupsWithState` keys one group at a time;
  * a doc probes 16 band buckets and compares full signatures). So
  * each micro-batch runs the same bucketed equi-join discipline as
  * batch [[Dedup.minhashCandidates]] against a parquet state table,
  * partitioned by batch id.
  *
  * Semantics (batch [[Dedup.dropNearDuplicates]] replayed in batch
  * order): a doc is rejected iff it near-matches a doc already in
  * state (its keeper becomes that doc's keeper), or it belongs to an
  * intra-batch duplicate component and either is not the component's
  * min-id keeper or its component touches state (chains collapse to
  * the FIRST keeper, exactly like connected components in the batch
  * op). Doc ids must be unique across the stream.
  *
  * Two state modes:
  *
  *  - Default (`exact = false`): only ACCEPTED docs' signatures are
  *    written to state, so transitive chains truncate at batch
  *    boundaries — a later doc that near-matches only a REJECTED doc
  *    (not that doc's accepted keeper) is accepted, where
  *    whole-corpus batch CC would have merged all three into one
  *    component and rejected it. This is the standard streaming-dedup
  *    trade: state stays proportional to the KEPT corpus, not the raw
  *    stream.
  *
  *  - `exact = true`: EVERY doc's signatures persist, rejected ones
  *    tagged with their resolved keeper id, so a later doc matching
  *    only a rejected doc still resolves (transitively) to the
  *    earliest accepted keeper and is rejected — streaming acceptance
  *    equals batch CC over the accumulated corpus. State grows with
  *    the raw stream. One divergence is inherent to streaming, not to
  *    this mode: a late doc BRIDGING two components whose keepers were
  *    both already emitted is itself rejected (keeper = the smaller),
  *    but the earlier acceptances cannot be retracted; batch CC over
  *    the same corpus would have kept only one of the two keepers.
  *
  * Exactly-once: state and output are written with dynamic partition
  * overwrite keyed by `batch_id`, so a replayed micro-batch (failure
  * recovery re-runs the last batch) overwrites its own partition
  * instead of appending twice — the writes are idempotent, which is
  * the foreachBatch sink contract.
  */
object NearDupGate {

  private def stateSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("keeper", LongType),
    StructField("batch_id", LongType)))

  /** Accepted-signature state, COMPACT since round 13: ONE row per
    * doc `(doc_id, sig, keeper, batch_id)`. Band/bucket rows are
    * DERIVABLE from the signature, so persisting them (the round-8
    * layout) multiplied state bytes ×bands for nothing — the 64-lane
    * signature array is the bulk of every row, and the exact-mode
    * state of a 100 TB stream is corpus-sized: at 16 bands the old
    * layout wrote and re-scanned ~16× the bytes every micro-batch
    * (the 300×-dupes exact-mode probe was state-write dominated).
    * Callers re-band on read ([[bandState]] — a codegen explode,
    * no shuffle). Legacy layouts read back compatibly: banded rows
    * collapse to their distinct doc rows; pre-keeper rows read as
    * `keeper = doc_id`.
    */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    try {
      // Schema DECLARED, not inferred (round 19): inference samples a
      // parquet footer per read — one extra driver round-trip every
      // micro-batch — and on a mixed legacy/compact stateDir the
      // sampled footer decided which columns existed (the round-13
      // trap the dropDuplicates below guards). Declared, a pre-keeper
      // legacy file simply null-fills `keeper` and the coalesce
      // restores the old `keeper = doc_id` default uniformly; legacy
      // banded layouts' extra band/bucket columns are projected away
      // by the declared schema, and their per-band row copies
      // collapse in the UNCONDITIONAL (doc_id, batch_id) dedupe (a
      // no-op for compact state).
      spark.read
        .schema(StructType(Seq(
          StructField("doc_id", LongType),
          StructField("sig", ArrayType(LongType)),
          StructField("keeper", LongType),
          StructField("batch_id", LongType))))
        .parquet(stateDir)
        .select(col("doc_id"), col("sig"),
          coalesce(col("keeper"), col("doc_id")).as("keeper"),
          col("batch_id").cast("long"))
        .dropDuplicates("doc_id", "batch_id")
    } catch {
      case _: org.apache.spark.sql.AnalysisException => // no state yet
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }

  /** Re-derive the banded `(doc_id, sig, band, bucket, keeper,
    * batch_id)` rows from compact state — the join shape
    * [[SigGate.acceptBatch]]'s match condition wants.
    */
  private[streaming] def bandState(
      compact: DataFrame, bands: Int, rows: Int): DataFrame =
    compact
      .withColumn("__b", explode(Dedup.lshBands(col("sig"), bands, rows)))
      .select(col("doc_id"), col("sig"), col("__b.band").as("band"),
        col("__b.bucket").as("bucket"), col("keeper"), col("batch_id"))

  /** One micro-batch step: returns the accepted subset of `batch` and
    * commits signatures to `stateDir/batch_id=<id>` (accepted only,
    * or every doc keeper-tagged when `exact`). Deterministic given
    * batch contents + prior state; idempotent under replay of the
    * same `batchId`. `idCol` must be LONG (the state schema is fixed
    * so batches are union-compatible).
    */
  def acceptBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      stateDir: String,
      k: Int = 3,
      n: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      exact: Boolean = false,
      starIntra: Boolean = false,
      autoStarPairsCap: Long = SigGate.defaultAutoStarPairsCap): DataFrame = {
    val spark = batch.sparkSession
    // The star decision rides the signature materialization itself
    // (F2 occupancy probe as observe metrics — zero extra jobs per
    // micro-batch; Dedup.materializeSigsProbed) unless it's already
    // pinned by starIntra / a MaxValue cap.
    val (cut, starNow, probe) = Dedup.sigsWithStarDecisionCutEst(
      Dedup.compactSigsPlan(batch, idCol, textCol, k, n), bands, n / bands,
      starIntra, autoStarPairsCap)
    val sigs = Dedup.bandExplode(cut, bands, n / bands)
    // A replayed batch must not match its own previously-committed
    // signatures: state is everything from strictly EARLIER batches.
    val state = bandState(
      readState(spark, stateDir).filter(col("batch_id") < batchId),
      bands, n / bands)
    SigGate.acceptBatch(
      batch, batchId, idCol,
      bandedSigs = sigs,
      state = state,
      // batch docs sharing a bucket with a state doc at est-Jaccard
      // ≥ threshold
      matchCond =
        col("a.band") === col("s.band") &&
        col("a.bucket") === col("s.bucket") &&
        Dedup.estJaccard(col("a.sig"), col("s.sig"), n) >= threshold,
      // Hub-star candidates (O(k) verified pairs per k-member bucket
      // instead of k²/2; exact for true-duplicate cliques,
      // recall-bounded for borderline pairs — see
      // starCandidatesFromBandedSigs): forced by `starIntra`, or
      // AUTO-tripped when the bucket-occupancy probe estimates the
      // all-pairs verification load past `autoStarPairsCap` (round 13
      // — the 19× dup-heavy mitigation is now default behavior, not a
      // caller knob). The state match above is unchanged either way.
      intraPairs =
        if (starNow)
          Dedup.starCandidatesFromCompact(cut, bands, n / bands, n, threshold)
        else Dedup.candidatesFromCompact(cut, bands, n / bands, n, threshold),
      stateDir = stateDir,
      exact = exact,
      probe = probe,
      compact = Some(cut),
      driverVerify = Some(Dedup.estJaccardPassDriver(n, threshold)),
      starPairs = starNow,
      // per-doc banding for the driver fast path's collect: the SAME
      // lshBands expression bandExplode exploded, so buckets match
      // bit-for-bit while each 64-lane sig ships once, not ×bands
      compactBanded = Some(cut.select(col("doc_id"), col("sig"),
        Dedup.lshBands(col("sig"), bands, n / bands).as("__bb"))))
  }

  /** The streaming gate: accepted docs land in
    * `acceptedDir/batch_id=<id>` (same idempotent-overwrite contract
    * as the state), signatures accumulate under `stateDir`.
    */
  def gate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      acceptedDir: String,
      checkpointDir: String,
      k: Int = 3,
      n: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      exact: Boolean = false): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // batch-scoped cuts (the per-batch signature + keeper-
        // resolution materializations) hard-release once the landing
        // write consumed them — bounded storage on an endless stream
        graft.operators.Materialize.batchScope(
          acceptBatch(b, id, idCol, textCol, stateDir, k, n, bands,
            threshold, exact)) { accepted =>
          accepted.withColumn("batch_id", lit(id))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(acceptedDir)
        }
        ()
      }
      .start()
}
