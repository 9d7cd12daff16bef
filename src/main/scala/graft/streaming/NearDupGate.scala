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
  * order, with one declared approximation): a doc is rejected iff it
  * near-matches an accepted doc from an earlier batch, or it belongs
  * to an intra-batch duplicate component and either is not the
  * component's min-id keeper or its component touches an earlier
  * accepted doc (chains collapse to the FIRST keeper, exactly like
  * connected components in the batch op).
  *
  * Accepted-only state approximation: rejected docs' signatures are
  * NOT written to state, so transitive chains truncate at batch
  * boundaries — a later doc that near-matches only a REJECTED doc
  * (not that doc's accepted keeper) is accepted, where whole-corpus
  * batch CC would have merged all three into one component and
  * rejected it. This is the standard streaming-dedup trade (state
  * stays proportional to the KEPT corpus, not the raw stream); for
  * chain-exact semantics run the batch op over the accumulated
  * corpus, or persist rejected signatures tagged with their keeper
  * id at ~raw-stream state cost.
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
    StructField("band", IntegerType),
    StructField("bucket", LongType),
    StructField("batch_id", LongType)))

  /** Accepted-signature state: all batch partitions under `stateDir`
    * (with their `batch_id`), or an empty frame before the first
    * batch commits.
    */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    try spark.read.parquet(stateDir)
      .select(col("doc_id"), col("sig"), col("band"), col("bucket"),
        col("batch_id").cast("long"))
    catch {
      case _: org.apache.spark.sql.AnalysisException => // no state yet
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }

  /** One micro-batch step: returns the accepted subset of `batch` and
    * commits the accepted signatures to `stateDir/batch_id=<id>`.
    * Deterministic given batch contents + prior state; idempotent
    * under replay of the same `batchId`. `idCol` must be LONG (the
    * state schema is fixed so batches are union-compatible).
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
      threshold: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    val sigs = Dedup.bandedSignatures(batch, idCol, textCol, k, n, bands)
    // A replayed batch must not match its own previously-committed
    // signatures: state is everything from strictly EARLIER batches.
    val state = readState(spark, stateDir).filter(col("batch_id") < batchId)
    // Stream-history matches: batch docs sharing a bucket with an
    // accepted doc at est-Jaccard ≥ threshold.
    val crossDup = sigs.as("a").join(state.as("s"),
        col("a.band") === col("s.band") &&
        col("a.bucket") === col("s.bucket") &&
        Dedup.estJaccard(col("a.sig"), col("s.sig"), n) >= threshold)
      .select(col("a.doc_id").as("id")).distinct()
    // Intra-batch duplicate components (same CC as the batch op).
    val comp = Dedup.connectedComponents(
      Dedup.candidatesFromBandedSigs(sigs, n, threshold))
    // A component with a stream-history match rejects ALL members —
    // its first keeper already exists in an earlier batch (chain
    // semantics: batch CC would have merged them into one component).
    val taintedComps = comp.join(crossDup, "id").select("component").distinct()
    val chainRejected = comp.join(taintedComps, "component").select(col("id"))
    val intraLosers = comp.filter(col("id") =!= col("component")).select(col("id"))
    // Materialized: `rejected` anchors BOTH the accepted output and
    // the state write — un-cut, each would re-run the crossDup join
    // against the full state table (the gate's most expensive join).
    val rejected = graft.operators.Materialize(
      crossDup.union(intraLosers).union(chainRejected).distinct())
    val accepted = batch.join(rejected, batch(idCol) === rejected("id"), "left_anti")
    sigs.join(rejected, sigs("doc_id") === rejected("id"), "left_anti")
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(stateDir)
    accepted
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
      threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        acceptBatch(b, id, idCol, textCol, stateDir, k, n, bands, threshold)
          .withColumn("batch_id", lit(id))
          .write.partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(acceptedDir)
      }
      .start()
}
