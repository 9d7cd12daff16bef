package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming per-group TOKEN-budget gate — the streaming form of
  * [[graft.operators.Sampling.tokenBudgetPerGroup]]: as documents
  * arrive, each group (language, source, domain …) keeps accepting
  * rows until its cumulative token budget is spent, then rejects
  * everything after — mixture provisioning in the unit that sets
  * training mass, applied at INGEST time so over-budget mass never
  * lands in the corpus at all (the batch op prunes after the fact;
  * the gate prevents the write).
  *
  * Semantics (shared with the batch op): a row is accepted iff its
  * group's tokens spent BEFORE it are `< budget` — every group
  * accepts its first row, overshoot is bounded by ONE row per group
  * over the whole stream (once the boundary row crosses, spent ≥
  * budget rejects everything after, in this batch or any later one).
  * WITHIN a micro-batch rows are ordered by the same deterministic
  * `(idHash(id), id)` order the batch op uses (micro-batch contents
  * carry no arrival order); ACROSS batches, arrival order rules —
  * that asymmetry is the definition of an ingest-time gate, and the
  * replay oracle states it (per-batch window sums chained through
  * the spent state).
  *
  * State discipline ([[NearDupGate]]'s, adapted): the state table
  * holds one `(group, spent_delta)` row per group PER BATCH —
  * batch-id-partitioned parquet, idempotent dynamic overwrite, so a
  * replayed batch rewrites its own partition rather than
  * double-counting. Prior spent = one bounded aggregate over
  * `batch_id < current` (groups × batches rows — KBs, not corpus
  * scale). The per-batch work is one grouped window over the batch
  * plus a broadcast-sized state join: no corpus-wide anything.
  */
object BudgetGate {

  private def stateSchema: StructType = StructType(Seq(
    StructField("grp", StringType),
    StructField("spent_delta", LongType),
    StructField("batch_id", LongType)))

  def readState(spark: SparkSession, stateDir: String): DataFrame =
    // schema declared, not inferred — drops the per-micro-batch
    // footer-sampling round-trip (round 19; the NearDupGate.readState
    // rationale)
    try spark.read
      .schema(StructType(Seq(
        StructField("grp", StringType),
        StructField("spent_delta", LongType),
        StructField("batch_id", LongType))))
      .parquet(stateDir)
      .select(col("grp"), col("spent_delta"), col("batch_id").cast("long"))
    catch {
      case _: org.apache.spark.sql.AnalysisException => // no state yet
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }

  /** One micro-batch step: returns the accepted subset of `batch`
    * (original columns) and commits this batch's per-group spent
    * deltas to `stateDir/batch_id=<id>`. `tokensCol` must be castable
    * to long (nulls count as 0 tokens, accepted for free — the batch
    * op's coalesce rule).
    */
  def acceptBatch(
      batch: DataFrame,
      batchId: Long,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      stateDir: String,
      budget: Long): DataFrame = {
    require(budget > 0, "BudgetGate: budget must be positive")
    // batch_id is staged too: gate() stamps it onto the accepted output
    // (and it is the parquet partition column) — an input batch_id would
    // be silently overwritten.
    Seq("__bg_grp", "__prior", "__cum", "__before", "batch_id").foreach(c =>
      require(!batch.columns.contains(c),
        s"BudgetGate: input must not carry the staging column '$c'"))
    val spark = batch.sparkSession
    val prior = readState(spark, stateDir)
      .filter(col("batch_id") < batchId)
      .groupBy("grp").agg(sum(col("spent_delta")).as("__prior"))
      .withColumnRenamed("grp", "__bg_grp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(graft.operators.Sampling.idHash(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val toks = coalesce(col(tokensCol).cast("long"), lit(0L))
    // Materialized: `marked` anchors both the accepted output and the
    // state write — un-cut, each side would re-run the window + join.
    val marked = graft.operators.Materialize(
      batch
        .withColumn("__cum", sum(toks).over(w))
        .join(broadcast(prior), batch(groupCol) === prior("__bg_grp"), "left")
        .withColumn("__before",
          coalesce(col("__prior"), lit(0L)) + col("__cum") - toks)
        .drop("__bg_grp", "__prior"))
    val accepted = marked.filter(col("__before") < budget)
    accepted
      .groupBy(col(groupCol).as("grp"))
      .agg(sum(coalesce(col(tokensCol).cast("long"), lit(0L)))
        .as("spent_delta"))
      // One aggregate row per group per batch — single-file commits
      // keep the state table at one file per batch instead of one
      // near-empty shard per shuffle partition (readState merges
      // every batch's files forever, so shard count compounds).
      .coalesce(1)
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(stateDir)
    accepted.drop("__cum", "__before")
  }

  /** The streaming gate: accepted rows land in
    * `acceptedDir/batch_id=<id>` (idempotent overwrite), per-group
    * spent deltas accumulate under `stateDir`.
    */
  def gate(
      rows: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      stateDir: String,
      acceptedDir: String,
      checkpointDir: String,
      budget: Long): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // batch-scoped cut release (the `marked` window+join cut) —
        // see NearDupGate.gate
        graft.operators.Materialize.batchScope(
          acceptBatch(b, id, groupCol, idCol, tokensCol, stateDir,
            budget)) { accepted =>
          accepted.withColumn("batch_id", lit(id))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(acceptedDir)
        }
        ()
      }
      .start()
}
