package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign each document
  * to a fixed-token-budget training sequence using the standard
  * concat-then-chunk rule — documents are laid out in id order and a
  * document belongs to the sequence containing its start offset
  * (`seq_id = floor(start_offset / budget)`).
  *
  * The start offset is a global prefix sum in id order. A naive
  * `Window.orderBy(id)` computes it on ONE partition — a non-starter
  * at 100 TB — so this runs the classic two-pass distributed scan:
  *
  *   1. bucket rows into ordered ranges by a deterministic function
  *      of the id (no sampling, so the two passes agree without
  *      persisting anything);
  *   2. one tiny job aggregates per-bucket token totals (≤ one row
  *      per bucket) which a broadcast join turns into per-bucket
  *      base offsets;
  *   3. a per-bucket window adds the local running sum.
  *
  * Every pass is a map-side scan plus one bounded shuffle; no stage
  * sees more than `1/buckets` of the data in a single task.
  */
object Packing {

  /** Pack `df` rows into sequences of `budget` tokens.
    *
    * @param df      input with a unique numeric id column
    * @param id      id column name (layout order; roughly uniform ids
    *                give balanced buckets — for arbitrary key domains
    *                substitute a range partitioner over a persisted
    *                scan)
    * @param ntok    per-row token count expression
    * @param budget  tokens per training sequence
    * @param buckets ordered range count (defaults to shuffle
    *                parallelism)
    * @return input plus `n_tokens`, `seq_id`
    */
  def concatChunkPack(
      df: DataFrame,
      id: String,
      ntok: Column,
      budget: Int,
      buckets: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(!df.columns.contains("n_tokens") && !df.columns.contains("seq_id"),
      "input must not already contain the output columns n_tokens/seq_id")
    val spark = df.sparkSession
    val nb =
      if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions

    // Null token counts pack as 0; a null id has no position in the
    // layout order — fail loudly instead of NPE-ing on the driver or
    // silently dropping the row in the bucket join.
    // The guard must live inside a column the plan actually uses —
    // an unreferenced assert_true column is pruned by Catalyst before
    // it evaluates (verified: the optimized plan drops it entirely).
    val base = df
      .withColumn("n_tokens",
        when(col(id).isNotNull, coalesce(ntok.cast("long"), lit(0L)))
          .otherwise(raise_error(lit(s"concatChunkPack: null $id")).cast("long")))

    // Deterministic ordered bucketing: bucket i holds ids in
    // [min + i*span, min + (i+1)*span). Pure arithmetic on the id, so
    // recomputing the scan in pass 2 lands every row in the same
    // bucket — no persist needed for correctness.
    val Array(lo, hi) = base
      .agg(min(col(id)).cast("long"), max(col(id)).cast("long"))
      .collect()(0) match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r                  => Array(r.getLong(0), r.getLong(1))
    }
    val span = math.max((hi - lo + 1 + nb - 1) / nb, 1L)
    val bucket = floor((col(id).cast("long") - lit(lo)) / lit(span)).cast("int")

    val bucketed = base.withColumn("__bkt", bucket)

    // Pass 1: per-bucket token totals -> exclusive base offsets.
    // ≤ nb rows: driver-side scan is O(buckets), not O(rows).
    val totals = bucketed
      .groupBy("__bkt")
      .agg(sum(col("n_tokens").cast("long")).as("__tot"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals
      .scanLeft((0, 0L)) { case ((_, acc), (b, tot)) => (b, acc + tot) }
      .init // scanLeft emits the seed plus one entry per bucket
      .zip(totals)
      .map { case ((_, off), (b, _)) => (b, off) }
      .toMap
    // __-prefixed like every other internal column, so a user frame
    // that already has bkt/off columns can't collide or be clobbered.
    val offsetDf = spark.createDataFrame(
        offsets.toSeq.map { case (b, off) => BucketOffset(b, off) })
      .select(col("bkt").as("__obkt"), col("off").as("__ooff"))

    // Pass 2: local running sum per bucket + broadcast base offset.
    val w = Window
      .partitionBy("__bkt")
      .orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsetDf), col("__bkt") === col("__obkt"))
      .withColumn(
        "__start",
        col("__ooff") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("__start") / lit(budget.toLong)))
      .drop("__bkt", "__obkt", "__ooff", "__start")
  }
}

/** Per-bucket exclusive prefix offset for [[Packing.concatChunkPack]]. */
final case class BucketOffset(bkt: Int, off: Long)
