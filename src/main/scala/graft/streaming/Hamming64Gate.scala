package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming near-dup gate over 64-BIT signatures — the
  * [[NearDupGate]] discipline (same [[SigGate]] core: table-backed
  * state, first-wins chain collapse, optional exact keeper tagging,
  * idempotent batch-id overwrite) applied to the banded-Hamming
  * family instead of MinHash: text SimHash
  * ([[Dedup.simhash64]]), image perceptual hashes
  * ([[graft.operators.Multimodal.dHash64]]/`pHash64`) and audio
  * fingerprints ([[graft.operators.Multimodal.aHash64]]) all produce
  * a single long, so ONE gate serves every modality — the caller
  * attaches the signature column (`withImageHash` / `withAudioHash` /
  * `simhash64`) and streams `(id, sig)` through.
  *
  * Blocking is [[Dedup.banded64]]'s `maxHamming + 1` bands: the
  * micro-batch joins state on exact `(band, bucket)` equality
  * (lossless by pigeonhole), then verifies with one `bit_count` —
  * never an all-pairs comparison against history. State carries the
  * `maxHamming + 1` band rows per doc, ~40 bytes each.
  */
object Hamming64Gate {

  private def stateSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", LongType),
    StructField("keeper", LongType),
    StructField("batch_id", LongType)))

  /** COMPACT state since round 13 (one row per doc — see
    * [[NearDupGate.readState]]'s rationale; here the saving is the
    * `maxHamming + 1` band-row multiplier). Legacy banded layouts
    * collapse to their distinct doc rows on read; callers re-band
    * via [[Dedup.band64Cols]].
    */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    try {
      // Schema declared, not inferred — see [[NearDupGate.readState]]
      // (round 19: drops the per-micro-batch footer-sampling
      // round-trip; a missing keeper column null-fills and coalesces
      // to doc_id). Unconditional (doc_id, batch_id) dedupe — no-op
      // for compact state, required for legacy/mixed banded layouts.
      spark.read
        .schema(StructType(Seq(
          StructField("doc_id", LongType),
          StructField("sig", LongType),
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

  /** One micro-batch step: returns the accepted subset of `batch`
    * and commits this batch's banded signatures to
    * `stateDir/batch_id=<id>`. `sigCol` must already hold the 64-bit
    * signature (long); `idCol` must be LONG. Semantics, exact-mode
    * trade-off, and idempotence contract are [[NearDupGate]]'s,
    * verbatim — see its scaladoc.
    */
  def acceptBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      sigCol: String,
      stateDir: String,
      maxHamming: Int = 3,
      exact: Boolean = false,
      starIntra: Boolean = false,
      autoStarPairsCap: Long = SigGate.defaultAutoStarPairsCap): DataFrame = {
    val spark = batch.sparkSession
    // star decision via the zero-extra-job F2 probe riding the
    // banded-signature materialization (Dedup.sigsWithStarDecision)
    val (sigs, starNow, probe) = Dedup.sigsWithStarDecisionEst(
      Dedup.band64Cols(
        batch.select(col(idCol).cast("long").as("doc_id"),
          col(sigCol).cast("long").as("sig")),
        maxHamming),
      starIntra, autoStarPairsCap)
    val state = Dedup.band64Cols(
      readState(spark, stateDir).filter(col("batch_id") < batchId),
      maxHamming)
    SigGate.acceptBatch(
      batch, batchId, idCol,
      bandedSigs = sigs,
      state = state,
      matchCond =
        col("a.band") === col("s.band") &&
        col("a.bucket") === col("s.bucket") &&
        Dedup.hamming64(col("a.sig"), col("s.sig")) <= maxHamming,
      // starIntra: hub-only bucket verification for dup-heavy
      // corpora (O(k) bit_count checks per bucket; exact for
      // identical-signature cliques) — see starHamming64PairsFromBanded.
      intraPairs =
        if (starNow) Dedup.starHamming64PairsFromBanded(sigs, maxHamming)
        else Dedup.hamming64PairsFromBanded(sigs, maxHamming),
      stateDir = stateDir,
      exact = exact,
      probe = probe,
      driverVerify = Some(Dedup.hamming64PassDriver(maxHamming)),
      starPairs = starNow)
  }

  /** The streaming gate: accepted rows land in
    * `acceptedDir/batch_id=<id>` (idempotent overwrite), banded
    * signatures accumulate under `stateDir`. The input stream must
    * already carry the signature column — hash attachment
    * (`withImageHash`/`withAudioHash`/`simhash64`) happens inside
    * `foreachBatch` upstream of this call site or in the stream's
    * select list.
    */
  def gate(
      rows: DataFrame,
      idCol: String,
      sigCol: String,
      stateDir: String,
      acceptedDir: String,
      checkpointDir: String,
      maxHamming: Int = 3,
      exact: Boolean = false): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // batch-scoped cut release — see NearDupGate.gate
        graft.operators.Materialize.batchScope(
          acceptBatch(b, id, idCol, sigCol, stateDir, maxHamming,
            exact)) { accepted =>
          accepted.withColumn("batch_id", lit(id))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(acceptedDir)
        }
        ()
      }
      .start()
}
