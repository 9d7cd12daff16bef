package graft.sources

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.util.sketch.BloomFilter

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
    *
    * Zero-row files (a writer task with an empty partition still
    * emits a parquet shell) never reach the stats aggregate — they
    * are cataloged explicitly with `n_rows = 0` and null stats, so
    * the staleness file-set equality holds and admission treats them
    * as cannot-match.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one column")
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
    withEmptyFiles(spark, stats, listedFiles(spark, dir))
  }

  /** Data files under `dir`, in the scheme-full form the stats pass
    * and the staleness check both normalize.
    */
  private def listedFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
  }

  /** Union `stats` with catalog rows for files the stats pass never
    * saw (zero-row shells): `n_rows = 0`, every stat column null.
    */
  private def withEmptyFiles(
      spark: SparkSession, stats: DataFrame, allFiles: Seq[String]): DataFrame = {
    import spark.implicits._
    val covered = stats.select("file").collect()
      .map(r => normalize(r.getString(0))).toSet
    val missing = allFiles.filterNot(f => covered(normalize(f)))
    if (missing.isEmpty) stats
    else {
      val shell = missing.toDF("file").withColumn("n_rows", lit(0L))
      val padded = stats.schema.fields.drop(2).foldLeft(shell)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
      stats.unionByName(padded)
    }
  }

  /** [[build]] plus a per-file bloom filter over each of `bloomCols`
    * — the point-predicate complement to zone maps. Zone min/max
    * prune RANGE predicates and only bite when the layout clusters
    * the column; a per-file bloom prunes EQUALITY predicates on any
    * layout (including hash-partitioned writes, where every file's
    * min/max spans the whole domain and zone maps admit everything).
    * This is Parquet's column-index/bloom story lifted to file level,
    * consulted before task scheduling like the rest of the manifest.
    *
    * Sizing: each blob is `-n·ln(p)/ln2² / 8` bytes ≈ 120 KB at the
    * defaults (100k expected distinct keys per file, 1% fpp) — set
    * `expectedPerFile` to the real per-file distinct count of the
    * column. [[prunedReadEq]] collects the queried blobs on the
    * driver, so budget `files × blob` driver heap; at a million files
    * prune by zone first or shard the manifest consult.
    *
    * NULL keys never enter a filter (the aggregate input is nulled
    * out, and [[BloomFilterAggregate]] skips null rows) — an all-null
    * file gets a NULL blob, which [[prunedReadEq]] treats as
    * cannot-match, mirroring equality semantics.
    */
  def buildWithBlooms(
      spark: SparkSession,
      dir: String,
      cols: Seq[String],
      bloomCols: Seq[String],
      expectedPerFile: Long = 100000L,
      fpp: Double = 0.01,
      files: Option[Seq[String]] = None): DataFrame = {
    require(bloomCols.nonEmpty, "buildWithBlooms needs at least one bloom column")
    val numBits = graft.operators.BloomJoin.optimalNumBits(expectedPerFile, fpp)
    def fileBloom(c: String): Column = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(when(col(c).isNotNull, xxhash64(col(c)))),
      Literal(expectedPerFile), Literal(numBits)).toAggregateExpression())
    // `files`: catalog only an explicit file list — the incremental
    // path ([[ManifestedSink]] stats just the batch's new files)
    val stats = files.map(fs => spark.read.parquet(fs: _*))
      .getOrElse(spark.read.parquet(dir))
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        (cols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
          bloomCols.map(c => fileBloom(c).as(s"bloom_$c"))): _*)
    withEmptyFiles(spark, stats, files.getOrElse(listedFiles(spark, dir)))
  }

  /** [[buildWithBlooms]] for an EXPLICIT file list, returned as
    * COLLECTED rows `(schema, rows)` instead of a DataFrame — the
    * [[ManifestedSink]] per-batch stats pass (round 20). The
    * DataFrame form executes the stats aggregate TWICE per batch:
    * once inside [[withEmptyFiles]]'s covered-file collect and again
    * when the manifest rewrite plan runs; here the aggregate runs
    * exactly once and the zero-row-shell padding happens on the
    * already-collected rows (file-count-sized, the same bound every
    * manifest consult carries).
    */
  private[sources] def buildWithBloomsRows(
      spark: SparkSession,
      cols: Seq[String],
      bloomCols: Seq[String],
      expectedPerFile: Long,
      fpp: Double,
      files: Seq[String]): (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row]) = {
    require(bloomCols.nonEmpty, "buildWithBlooms needs at least one bloom column")
    val numBits = graft.operators.BloomJoin.optimalNumBits(expectedPerFile, fpp)
    def fileBloom(c: String): Column = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(when(col(c).isNotNull, xxhash64(col(c)))),
      Literal(expectedPerFile), Literal(numBits)).toAggregateExpression())
    val stats = spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        (cols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
          bloomCols.map(c => fileBloom(c).as(s"bloom_$c"))): _*)
    val rows = stats.collect().toSeq
    val covered = rows.map(r => normalize(r.getString(0))).toSet
    val shells = files.filterNot(f => covered(normalize(f))).map { f =>
      org.apache.spark.sql.Row.fromSeq(
        f +: 0L +: Seq.fill(stats.schema.length - 2)(null))
    }
    (stats.schema, rows ++ shells)
  }

  /** Read only the files that can contain `col = value` for every
    * entry of `eqs`: zone admission (when `min_/max_` columns exist
    * in the manifest) AND bloom admission (when a `bloom_` column
    * exists — no false negatives, so pruning is exact up to fpp
    * extra files). The residual equality predicate still applies.
    *
    * `eqs` values must carry the column's exact data type (the probe
    * hashes the value with the same `xxhash64` the build used — a
    * Long column probed with an Int hashes differently and would
    * falsely prune).
    *
    * Same staleness contract as [[prunedRead]]; `onStale = "rebuild"`
    * re-catalogs with the default bloom sizing.
    */
  def prunedReadEq(
      spark: SparkSession,
      manifest: DataFrame,
      eqs: Map[String, Any],
      onStale: String = "error"): DataFrame = {
    require(eqs.nonEmpty, "prunedReadEq needs at least one equality")
    require(Set("error", "rebuild")(onStale), s"onStale must be error|rebuild, got $onStale")
    val mCols = manifest.columns.toSet
    val zoneAdm = eqs.map { case (c, v) =>
      if (mCols(s"min_$c")) col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v)
      else lit(true)
    }.reduce(_ && _)
    val bloomed = eqs.keys.toSeq.filter(c => mCols(s"bloom_$c"))
    // blobs ship to the driver only for zone-admitted files — on a
    // zoned layout the range cut pays before the heavy columns move
    val rows = manifest.select(
      col("file") +: coalesce(zoneAdm, lit(false)).as("__adm") +:
        bloomed.map(c => when(coalesce(zoneAdm, lit(false)), col(s"bloom_$c"))): _*)
      .collect()
    require(rows.nonEmpty, "manifest is empty — nothing was cataloged")
    val dir = new org.apache.hadoop.fs.Path(rows.head.getString(0)).getParent
    if (rows.map(r => normalize(r.getString(0))).toSet != currentFiles(spark, dir)) {
      if (onStale == "rebuild") {
        val zCols = manifest.columns.toSeq.collect {
          case c if c.startsWith("min_") => c.stripPrefix("min_")
        }
        val bCols = manifest.columns.toSeq.collect {
          case c if c.startsWith("bloom_") => c.stripPrefix("bloom_")
        }
        return prunedReadEq(spark,
          buildWithBlooms(spark, dir.toString, zCols, bCols), eqs)
      }
      throw new IllegalStateException(
        s"manifest is STALE for $dir — the directory was rewritten since it " +
          "was built (compaction or re-layout). Rebuild with buildWithBlooms, " +
          "or pass onStale=\"rebuild\", before pruned reads.")
    }
    // probe hashes: the same xxhash64 the build applied to the column
    val probeHash: Map[String, Long] = bloomed.map { c =>
      // seed 42 = the default of the `xxhash64` SQL function
      c -> XxHash64(Seq(Literal(eqs(c))), 42L).eval(InternalRow.empty).asInstanceOf[Long]
    }.toMap
    val admitted = rows.filter { r =>
      r.getBoolean(1) && bloomed.zipWithIndex.forall { case (c, i) =>
        val blob = r.getAs[Array[Byte]](2 + i)
        blob != null &&
          BloomFilter.readFrom(new ByteArrayInputStream(blob)).mightContainLong(probeHash(c))
      }
    }.map(_.getString(0))
    val residual = eqs.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
    if (admitted.isEmpty)
      spark.read.parquet(rows.head.getString(0)).limit(0).filter(residual)
    else spark.read.parquet(admitted.toSeq: _*).filter(residual)
  }

  /** IN-set file pruning: read only the files that can contain ANY of
    * `values` in `column` — the multi-tenant / multi-key point-read
    * shape (`WHERE user_id IN (...)`), where per-value [[prunedReadEq]]
    * calls would re-collect the manifest and re-scan shared files
    * once per value. A file is admitted when SOME value passes its
    * zone check and SOME value passes its bloom probe (a mild
    * superset of the exact per-value conjunction — still zero false
    * negatives, the property that matters); each admitted file is
    * read ONCE, the residual `isin` applies on top.
    *
    * `values` must carry the column's exact data type (same
    * [[prunedReadEq]] probe-hash contract). Same staleness contract;
    * `onStale = "rebuild"` re-catalogs and retries.
    */
  def prunedReadIn(
      spark: SparkSession,
      manifest: DataFrame,
      column: String,
      values: Seq[Any],
      onStale: String = "error"): DataFrame = {
    require(values.nonEmpty, "prunedReadIn needs at least one value")
    require(Set("error", "rebuild")(onStale), s"onStale must be error|rebuild, got $onStale")
    val mCols = manifest.columns.toSet
    val zoneAdm =
      if (mCols(s"min_$column"))
        values.map(v => col(s"min_$column") <= lit(v) && col(s"max_$column") >= lit(v))
          .reduce(_ || _)
      else lit(true)
    val hasBloom = mCols(s"bloom_$column")
    val rows = manifest.select(
      col("file") +: coalesce(zoneAdm, lit(false)).as("__adm") +:
        (if (hasBloom) Seq(when(coalesce(zoneAdm, lit(false)), col(s"bloom_$column")))
         else Nil): _*)
      .collect()
    require(rows.nonEmpty, "manifest is empty — nothing was cataloged")
    val dir = new org.apache.hadoop.fs.Path(rows.head.getString(0)).getParent
    if (rows.map(r => normalize(r.getString(0))).toSet != currentFiles(spark, dir)) {
      if (onStale == "rebuild") {
        val zCols = manifest.columns.toSeq.collect {
          case c if c.startsWith("min_") => c.stripPrefix("min_")
        }
        val bCols = manifest.columns.toSeq.collect {
          case c if c.startsWith("bloom_") => c.stripPrefix("bloom_")
        }
        return prunedReadIn(spark,
          buildWithBlooms(spark, dir.toString, zCols, bCols), column, values)
      }
      throw new IllegalStateException(
        s"manifest is STALE for $dir — the directory was rewritten since it " +
          "was built (compaction or re-layout). Rebuild with buildWithBlooms, " +
          "or pass onStale=\"rebuild\", before pruned reads.")
    }
    val probeHashes: Seq[Long] = values.map(v =>
      XxHash64(Seq(Literal(v)), 42L).eval(InternalRow.empty).asInstanceOf[Long])
    val admitted = rows.filter { r =>
      r.getBoolean(1) && (!hasBloom || {
        val blob = r.getAs[Array[Byte]](2)
        blob != null && {
          val bloom = BloomFilter.readFrom(new ByteArrayInputStream(blob))
          probeHashes.exists(bloom.mightContainLong)
        }
      })
    }.map(_.getString(0))
    val residual = col(column).isin(values: _*)
    if (admitted.isEmpty)
      spark.read.parquet(rows.head.getString(0)).limit(0).filter(residual)
    else spark.read.parquet(admitted.toSeq: _*).filter(residual)
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
        coalesce(ranges.map { case (c, (lo, hi)) => mayMatch(c, lo, hi) }
          .reduce(_ && _), lit(false)).as("__adm"))
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
