package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Profile

/** Write-audit-publish (WAP): the ingest discipline where data
  * becomes visible to readers ONLY after its quality gate passes.
  *
  *   1. '''Write''' the batch to a staging sibling of the target
  *      (`<dir>.stage`) — never the live path.
  *   2. '''Audit''' with [[Profile.observeExpectations]]: the rule
  *      counters accumulate inside the staging write's own tasks, so
  *      the audit adds ZERO extra passes over the data.
  *   3. '''Publish''' by marker + rename, only if every rule is
  *      within budget: a `_AUDITED` marker lands in the staging dir
  *      (underscore-prefixed — invisible to parquet readers), then
  *      the stage is swapped in atomically. A failed audit leaves the
  *      live table untouched and the staged files in place for
  *      inspection.
  *
  * Crash safety mirrors [[ManifestedSink.readManifest]]'s
  * finish-the-publish rule, with the marker deciding intent: a staged
  * directory WITHOUT `_AUDITED` is a write that never passed its
  * audit (or never finished) and must not be promoted; one WITH the
  * marker passed the gate and [[readPublished]] completes the swap.
  */
object Wap {

  final case class WapResult(
      published: Boolean,
      nRows: Long,
      violations: Map[String, Long])

  private val Marker = "_AUDITED"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Stage, audit, and (if clean) publish `df` as the new content of
    * `dir`. `maxViolations` is the per-rule budget (default: any
    * violation blocks). Returns what happened plus every rule's
    * violation count — callers route the rejected staging dir to
    * their dead-letter process, exactly like the CSV/XML rejects.
    */
  def write(
      df: DataFrame,
      dir: String,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      maxViolations: Long = 0L): WapResult = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val stage = new Path(dir + ".stage")
    if (fs.exists(stage)) fs.delete(stage, true) // stale failed attempt

    val (instrumented, obs) = Profile.observeExpectations(df, rules)
    instrumented.write.mode("overwrite").parquet(stage.toString) // the ONE pass
    val m = obs.get
    val nRows = m("n_rows").asInstanceOf[Long]
    val counts = rules.map { case (name, _) =>
      name -> m(name).asInstanceOf[Long]
    }.toMap
    val over = counts.filter { case (_, c) => c > maxViolations }

    if (over.nonEmpty) {
      WapResult(published = false, nRows, counts)
    } else {
      fs.create(new Path(stage, Marker), true).close()
      val live = new Path(dir)
      if (fs.exists(live)) fs.delete(live, true)
      fs.rename(stage, live)
      WapResult(published = true, nRows, counts)
    }
  }

  /** Read the published table, first completing a publish that
    * crashed between marker and rename (marker present = the audit
    * passed; the staged copy is the intended truth). An UNMARKED
    * stage is never promoted — it failed or never finished its audit.
    */
  def readPublished(spark: SparkSession, dir: String): DataFrame = {
    val fs = fsOf(spark, dir)
    val live = new Path(dir)
    val stage = new Path(dir + ".stage")
    if (fs.exists(new Path(stage, Marker))) {
      if (fs.exists(live)) fs.delete(live, true)
      fs.rename(stage, live)
    }
    spark.read.parquet(dir)
  }
}
