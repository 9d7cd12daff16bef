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

  /** Read only the files the manifest admits for a conjunction of
    * range predicates `col -> (lo, hi)`. The manifest consult is a
    * driver-side collect of matching file NAMES (bounded by file
    * count, and typically a few survivors); the data read then
    * schedules tasks for those files alone. The residual predicate
    * still applies — zone maps admit, they don't verify.
    */
  def prunedRead(
      spark: SparkSession,
      manifest: DataFrame,
      ranges: Map[String, (Column, Column)]): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    val admitted = manifest
      .filter(ranges.map { case (c, (lo, hi)) => mayMatch(c, lo, hi) }
        .reduce(_ && _))
      .select("file").collect().map(_.getString(0))
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (admitted.isEmpty) {
      // No file can match: an empty frame with the data schema (one
      // footer read off any cataloged file), zero data tasks.
      val any = manifest.select("file").limit(1).collect()
      require(any.nonEmpty, "manifest is empty — nothing was cataloged")
      spark.read.parquet(any.head.getString(0)).limit(0).filter(residual)
    } else spark.read.parquet(admitted: _*).filter(residual)
  }
}
