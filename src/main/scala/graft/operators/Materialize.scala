package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Plan-materialization boundary used by the multi-reference operators
  * (MinHash/SimHash banding, n-gram blocking, TF-IDF, heavy hitters,
  * connected components). Referencing one `val df` from N places does
  * NOT dedupe the plan — Catalyst re-inlines the subtree N times and
  * `ReuseExchange` rarely rescues it once column pruning differentiates
  * the exchanges — so these operators cut the plan here and compute the
  * shared subtree exactly once.
  *
  * The strategy is configurable via `spark.graft.materialize` because
  * the right trade-off differs by deployment:
  *
  *  - `local` (default): `localCheckpoint()` — fastest on a single node
  *    and on clusters without a checkpoint dir, but the materialized
  *    blocks live ONLY on executors with no lineage to rebuild them: an
  *    executor loss (or dynamic-allocation decommission) mid-job fails
  *    the query. Fine for local[] and static short-lived clusters.
  *  - `persist`: `persist(MEMORY_AND_DISK)` + eager count, returned
  *    through an RDD-scan wrapper — the LOGICAL plan is cut (no
  *    per-iteration plan nesting in loops) while the RDD keeps its
  *    lineage, so lost blocks are recomputed instead of failing the
  *    job. The right mode for long multi-stage jobs at the 100 TB
  *    design point with dynamic allocation. Iterative callers should
  *    [[release]] superseded frames or the pinned blocks accumulate
  *    for the session.
  *  - `reliable`: `checkpoint()` to the SparkContext checkpoint dir
  *    (caller must `setCheckpointDir` to HDFS/object storage) —
  *    survives executor loss without recompute; pay the write.
  *
  * All three are EAGER — building one of these operator plans runs the
  * shared-subtree job as a side effect. That is deliberate: the cut is
  * what guarantees single execution of an expensive pass.
  */
object Materialize {
  val ConfKey = "spark.graft.materialize"

  private def mode(df: DataFrame): String =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("local")

  // wrapper frame -> the persisted frame whose blocks back it; weak
  // keys so abandoned frames don't pin the map entries.
  private val backing = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, DataFrame]())

  def apply(df: DataFrame): DataFrame =
    track(mode(df) match {
      case "persist" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        p.count() // eager: the cut must run once, now, not per reference
        // LogicalRDD wrapper: downstream plans see a leaf scan (flat
        // plans in loops) but reads serve from the cached blocks and a
        // lost block recomputes through the RDD's own lineage.
        val wrapped = df.sparkSession.createDataFrame(p.rdd, p.schema)
        backing.put(wrapped, p)
        wrapped
      case "reliable" => df.checkpoint()
      case _          => df.localCheckpoint()
    })

  /** Drop the cached blocks behind a frame this loop iteration has
    * superseded. Only acts on `persist`-mode frames (a
    * localCheckpoint's blocks are its ONLY copy — unpersisting them
    * would kill later reads — and `reliable` checkpoints live on
    * stable storage); safe to call on any Materialize output.
    */
  def release(df: DataFrame): Unit =
    Option(backing.remove(df)).foreach(_.unpersist(false))

  /** Drop the cached blocks behind a frame in EVERY mode — including
    * a `local`-mode localCheckpoint, whose blocks are its only copy.
    * The caller contract is therefore stronger than [[release]]'s:
    * the frame (and anything derived from it) must NEVER be read
    * again — a later action would find neither blocks nor lineage and
    * fail. For batch-scoped cuts inside a continuously-cycling loop
    * (the streaming foreachBatch bodies) this is the difference
    * between bounded per-batch storage and accruing one dead frame's
    * blocks per micro-batch for the JVM lifetime (r17 advice on
    * [[graft.streaming.FrontierStream]]).
    *
    * Mechanics: persist-mode backing unpersists as in [[release]];
    * any `LogicalRDD` leaf's RDD is unpersisted too — that is the
    * localCheckpoint's block holder (`unpersist` on a never-persisted
    * RDD, e.g. a reliable checkpoint's, is a no-op, so calling this
    * on any Materialize output is mechanically safe).
    */
  def releaseHard(df: DataFrame): Unit = {
    release(df)
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  // cuts created on this thread inside a batchScope (foreachBatch
  // bodies are single-threaded driver code, so thread-locality is the
  // right capture boundary)
  private val scopeCuts = new ThreadLocal[
    scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** BATCH-SCOPED materialization (round 18 — the general form of the
    * r17 cycling-loop finding): run `build`, recording every cut it
    * creates on this thread; after `use` consumes the result, HARD-
    * release them all. This is how a continuously-cycling
    * `foreachBatch` body keeps per-batch storage bounded when the
    * cuts are created INSIDE operators it calls (the gate family
    * materializes a signature cut and a keeper-resolution cut per
    * micro-batch, both invisible to the caller) — without threading
    * release handles through every operator signature.
    *
    * Contract: everything `build` materializes is batch-scoped — dead
    * once `use` returns (the [[releaseHard]] contract). An operator
    * whose cut must OUTLIVE the batch must not be called inside a
    * scope. Cuts created by `use` itself are NOT tracked. A `build`
    * that THROWS (fetch error, state-dir hiccup) still releases every
    * cut it had materialized before failing — a retried micro-batch
    * must not inherit stranded storage. Scopes nest: the outer
    * scope's tracking buffer is saved and restored, so an inner scope
    * never clobbers (or releases) the outer scope's cuts.
    */
  def batchScope[A](build: => A)(use: A => Unit): A = {
    val outer = scopeCuts.get()
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    scopeCuts.set(buf)
    val a =
      try build
      catch { case t: Throwable => buf.foreach(releaseHard); throw t }
      finally {
        if (outer == null) scopeCuts.remove() else scopeCuts.set(outer)
      }
    try { use(a); a } finally buf.foreach(releaseHard)
  }

  private def track(df: DataFrame): DataFrame = {
    Option(scopeCuts.get()).foreach(_ += df)
    df
  }
}
