package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map manifest over a parquet directory: one row per file with
  * per-column min/max — the table-format trick (Iceberg/Delta file
  * stats) expressed as plain Spark, for directories that aren't in a
  * table format.
  *
  * Why it matters at 100 TB: Spark prunes parquet ROW GROUPS via
  * footer min/max only AFTER scheduling a task per file split — for a
  * million-file directory that is a million task launches (and a
  * million footer reads) even when the predicate matches three files.
  * A manifest is the file-level short-circuit: one small table,
  * consulted BEFORE planning, so the scan's file list — and the task
  * count — shrinks to the files that can match. Pays off exactly when
  * the layout clusters the filtered columns
  * ([[graft.operators.Layout.zorderBy]]) so per-file ranges are tight.
  *
  * The manifest is itself a DataFrame — build it once per layout write
  * (a single distributed pass grouped by `input_file_name`), persist
  * it next to the data, refresh on rewrite.
  */
object Manifest {

  /** One distributed pass: per-file row count and min/max for each of
    * `cols`. Column names in the manifest: `min_<c>` / `max_<c>`.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one column")
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
  }

  /** Write the manifest (one compact parquet) for later
    * [[prunedRead]]s — rebuild after any rewrite of `dir`.
    */
  def write(spark: SparkSession, dir: String, cols: Seq[String],
      manifestDir: String): Unit =
    build(spark, dir, cols).coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)

  /** Files whose zone CAN intersect `[lo, hi]` on `c` — the file-level
    * analogue of row-group pruning. All-null files (null min/max)
    * cannot match a range predicate and are pruned too.
    */
  private def mayMatch(c: String, lo: Column, hi: Column): Column =
    col(s"min_$c") <= hi && col(s"max_$c") >= lo

  /** Scheme-independent path form for file-set comparison
    * (`input_file_name()` emits `file:///x`, FS listings `file:/x`).
    */
  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The data files currently under the cataloged directory
    * (non-hidden leaves — the same set a parquet scan would read).
    */
  private def currentFiles(spark: SparkSession, dir: org.apache.hadoop.fs.Path): Set[String] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => normalize(s.getPath.toString)).toSet
  }

  /** Read only the files the manifest admits for a conjunction of
    * range predicates `col -> (lo, hi)`. The manifest consult is a
    * driver-side collect of file NAMES + admission flags (bounded by
    * file count); the data read then schedules tasks for the admitted
    * files alone. The residual predicate still applies — zone maps
    * admit, they don't verify.
    *
    * Staleness guard: the manifest's file set must EQUAL the
    * directory's current data files — a rewrite ([[Compact.compact]],
    * a re-layout) invalidates it in both directions (cataloged files
    * gone → FileNotFoundException mid-job; new files uncataloged →
    * silently missing rows). On mismatch: `onStale = "error"`
    * (default) throws with the rebuild instruction before any task is
    * scheduled; `onStale = "rebuild"` re-catalogs the directory in
    * place (columns recovered from the manifest schema) and proceeds
    * — the caller still owns persisting the fresh manifest via
    * [[write]].
    */
  def prunedRead(
      spark: SparkSession,
      manifest: DataFrame,
      ranges: Map[String, (Column, Column)],
      onStale: String = "error"): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    require(Set("error", "rebuild")(onStale), s"onStale must be error|rebuild, got $onStale")
    val entries = manifest
      .select(col("file"),
        ranges.map { case (c, (lo, hi)) => mayMatch(c, lo, hi) }
          .reduce(_ && _).as("__adm"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    require(entries.nonEmpty, "manifest is empty — nothing was cataloged")
    val dir = new org.apache.hadoop.fs.Path(entries.head._1).getParent
    if (entries.map(e => normalize(e._1)).toSet != currentFiles(spark, dir)) {
      if (onStale == "rebuild") {
        val cols = manifest.columns.toSeq.collect {
          case c if c.startsWith("min_") => c.stripPrefix("min_")
        }
        return prunedRead(spark, build(spark, dir.toString, cols), ranges)
      }
      throw new IllegalStateException(
        s"manifest is STALE for $dir — the directory was rewritten since it " +
          "was built (compaction or re-layout). Rebuild with Manifest.write, " +
          "or pass onStale=\"rebuild\", before pruned reads.")
    }
    val admitted = entries.filter(_._2).map(_._1)
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (admitted.isEmpty) {
      // No file can match: an empty frame with the data schema (one
      // footer read off any cataloged file), zero data tasks.
      spark.read.parquet(entries.head._1).limit(0).filter(residual)
    } else spark.read.parquet(admitted.toSeq: _*).filter(residual)
  }
}
