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
  * reproduces the MemoryStream two-batch semantics exactly — batch
  * composition is governed by what has been written when the trigger
  * fires, never by file count or size. Hidden files (`_SUCCESS`,
  * in-flight `_temporary`) are ignored by the source, and `add`
  * returns only after the write commits, so a trigger can never see a
  * half-written batch.
  */
final class FileReplay(spark: SparkSession, schema: StructType) {
  val dir: String =
    java.nio.file.Files.createTempDirectory("graft_replay_src").toString

  /** The streaming frame to build the query on. Nullability is
    * relaxed on every field: parquet round-trips drop nullability
    * guarantees, and the source enforces nothing at runtime anyway —
    * declaring the relaxed truth keeps downstream encoders honest.
    */
  def stream: DataFrame =
    spark.readStream.schema(StructType(schema.map(_.copy(nullable = true)))).parquet(dir)

  /** Stage the next micro-batch: a committed distributed write into
    * the source dir. Call `processAllAvailable()` on the running
    * query after each add.
    */
  def add(df: DataFrame): Unit =
    df.write.mode("append").parquet(dir)
}
