package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-source replay harness for the driver-gate streaming queries.
  *
  * Replaces the earlier MemoryStream fixtures, which collected a whole
  * corpus table to the driver to feed the stream — fine at verify
  * scale, heap-bound at the 100× probes. Here each micro-batch is a
  * normal distributed parquet write into a temp source directory, and
  * the query reads it back through Spark's file stream source: no row
  * ever materializes on the driver, and the data path (scan →
  * operator → sink) is the production shape end to end.
  *
  * Batch-boundary contract: the file source takes ALL files it has
  * not yet processed into the next micro-batch (no
  * `maxFilesPerTrigger` is set), so
  *
  *   `add(b0); val q = start(); q.processAllAvailable()`  → batch 0 = b0
  *   `add(b1); q.processAllAvailable()`                   → batch 1 = b1
  *
  * reproduces the MemoryStream two-batch semantics exactly.
  *
  * ATOMICITY: the running query keeps triggering BETWEEN
  * `processAllAvailable` calls (default trigger busy-polls), and a
  * multi-file parquet commit renames task files into the directory
  * one by one — a trigger landing inside that window would take HALF
  * a staged batch and split it across two micro-batches, silently
  * changing batch-scoped semantics (the gates' intra-batch CC, the
  * two-batch oracles). So `add` publishes each batch as ONE ATOMIC
  * DIRECTORY RENAME: the batch writes (fully parallel) to a staging
  * dir on the same filesystem, which then moves into the source dir
  * as a single entry — either every file of the batch is listable or
  * none is. The source reads with `recursiveFileLookup` so the batch
  * subdirectories are plain containers, not partition columns.
  * (A single-FILE variant was tried first: atomic, but file-source
  * splitting is per-file byte ranges under `maxPartitionBytes`, so a
  * corpus-sized single-file batch scanned single-threaded — the
  * 100×-dupes probe measured 2.5× on exactly that.)
  */
final class FileReplay(spark: SparkSession, schema: StructType) {
  // Exit-swept ([[Scratch.register]]): the staged batches are
  // corpus-sized and used to outlive the process (round-13 ADVICE).
  // On tmpfs since round 20 ([[Scratch.replayDir]] — staging writes,
  // publish renames and busy-poll listings are harness latency, not
  // engine cost; `spark.graft.replay.onDisk=true` opts out).
  val dir: String = Scratch.replayDir(spark)

  /** The streaming frame to build the query on. Nullability is
    * relaxed on every field: parquet round-trips drop nullability
    * guarantees, and the source enforces nothing at runtime anyway —
    * declaring the relaxed truth keeps downstream encoders honest.
    */
  def stream: DataFrame =
    spark.readStream
      .schema(StructType(schema.map(_.copy(nullable = true))))
      .option("recursiveFileLookup", "true")
      .parquet(dir)

  private val batchN = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stage the next micro-batch: one atomically-published batch
    * directory (see ATOMICITY note). Call `processAllAvailable()` on
    * the running query after each add.
    */
  def add(df: DataFrame): Unit = { addIfNonEmpty(df, always = true); () }

  /** [[add]] that publishes ONLY when the staged batch has rows —
    * the termination condition of self-feeding loops (round 18:
    * [[FrontierStream]]'s link-discovery feedback adds each batch's
    * discovered URLs back into its own source; an unconditional add
    * of an empty frame would trigger an empty batch which adds an
    * empty frame, forever). The emptiness check reads the STAGED
    * parquet (row-count from footers — no second execution of the
    * input plan); an unpublished stage is deleted. Returns whether
    * the batch was published.
    */
  def addIfNonEmpty(df: DataFrame, always: Boolean = false): Boolean = {
    // Staged NEXT TO the source dir: Files.move with ATOMIC_MOVE
    // requires same-filesystem, and /tmp vs the source dir's mount
    // must not be assumed.
    val staging = Scratch.register(java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(dir).getParent, "graft_replay_stage"))
    df.write.mode("overwrite").parquet(staging.toString)
    val any = always || stagedRowCount(staging) > 0L
    if (any)
      java.nio.file.Files.move(staging,
        java.nio.file.Paths.get(dir).resolve(s"batch-${batchN.getAndIncrement()}"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.delete)
    }
    any
  }

  // Footer-only row count of a staged batch directory: sums each
  // parquet file's block row counts from its footer — pure driver
  // IO, no Spark job, no second execution of the input plan (the
  // self-feeding loop pays this once per tick).
  private def stagedRowCount(staging: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val files = java.nio.file.Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    files.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }
}
