package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example builders: turn raw interaction logs into
  * (context, label) supervision pairs — the last mile between a
  * warehouse table and a sequence-model training set.
  *
  * Scale shape: every builder works inside per-key bounded windows
  * (partitioned by the entity, framed to the context length) — no
  * global sort, no cross-key state, so a 100 TB event log shuffles
  * once by key and streams through window frames of at most `k` rows.
  */
object Examples {

  /** Next-event prediction pairs: for every event with at least `k`
    * predecessors in its key's timeline, emit the space-joined
    * `context` of the `k` previous labels and the event's own label
    * as the target. Rows earlier than position `k+1` produce no
    * example (partial contexts train badly; pad upstream if wanted).
    *
    * `order` must be a TOTAL order within a key (tie-break with a
    * unique id) — the context string is only deterministic if the
    * frame order is.
    */
  def nextEvent(
      df: DataFrame,
      keyCol: String,
      order: Seq[Column],
      labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "context length k must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-k, -1)
    df.withColumn("__ctx", collect_list(col(labelCol)).over(w))
      .filter(size(col("__ctx")) === k)
      .withColumn("context", array_join(col("__ctx"), " "))
      .withColumn("label", col(labelCol))
      .drop("__ctx")
  }

  /** First-order (Markov) transition matrix over per-key ordered
    * label sequences: for every adjacent pair in a key's timeline,
    * `(from_label, to_label, n, p_ppm)` where `p_ppm` is the
    * row-normalized transition probability in ppm (integer floor
    * div — engine-exact). The journey-structure summary behind
    * funnel design, synthetic-session generation, and
    * next-event-model sanity checks (the model's learned transition
    * row should dominate this empirical one).
    *
    * Scale shape: ONE keyed window (`lead` over the per-key order —
    * the [[nextEvent]] discipline, never a global sort) into two
    * hash aggregates with map-side partials; output is bounded by
    * |labels|², not the corpus. `order` must totally order each
    * key's rows or the adjacent pairs are nondeterministic.
    */
  def transitionMatrix(
      df: DataFrame,
      keyCol: String,
      order: Seq[Column],
      labelCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val counts = df
      .withColumn("__next", lead(col(labelCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(labelCol).as("from_label"), col("__next").as("to_label"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_label").agg(sum(col("n")).as("__tot"))
    counts.join(totals, "from_label")
      .withColumn("p_ppm", expr("(n * 1000000) div __tot"))
      .drop("__tot")
  }
}
