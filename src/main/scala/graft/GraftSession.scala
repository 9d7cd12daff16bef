package graft

import org.apache.spark.sql.SparkSession

/** Canonical session config for every entry point (Verify, Bench,
  * tests). Keeps the contract in one place:
  *
  *  - UTC session time zone — the corpus timestamps are naive
  *    (parquet isAdjustedToUTC=false), and the reference's day-first
  *    `dd/MM/yyyy` format is TZ-hostile (SURVEY §1.2).
  *  - `legacy.parquet.nanosAsLong` — `events.ts` is INT64
  *    TIMESTAMP(NANOS); Spark has no nanosecond timestamp type, so it
  *    is read as a long and truncated to microseconds in
  *    [[Tables.events]].
  *  - shuffle partitions sized to the local core count (not 200) and
  *    AQE on, so local plans mirror what a sized cluster would run.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // Streaming checkpoint metadata through the FileSystem-based
      // manager instead of the FileContext default: both are
      // rename-atomic on a LOCAL filesystem (this session is
      // local-only by construction), and the FileContext path pays
      // ~25-30 ms of per-op setup that the FileSystem path doesn't —
      // measured 33→8 ms walCommit / 38→8 ms commitOffsets /
      // 34→12 ms source latestOffset per micro-batch (round 13), i.e.
      // ~0.1 s per trigger cycle of pure harness. A deployment whose
      // checkpoints live on an object store or HDFS should NOT
      // inherit this: rename-overwrite semantics differ there, which
      // is exactly why Spark defaults to FileContext.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")

  // Default to the REAL core count: the old fallback of 4 silently
  // undersized any run that forgot SPARK_GRAFT_CPUS — the exact trap
  // BASELINE.md documents (local[4] manufactured a fake +1.29
  // exponent in round 10, and again inflated round-11's first 100×
  // probes 3-5× before being caught). The driver exports
  // SPARK_GRAFT_CPUS=32 explicitly; now an env-less local run matches
  // it instead of quietly starving.
  def get(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
