package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Manifest

/** Zone-map manifest: stats correctness, file-level pruning (with and
  * without a clustered layout), the no-match fast path, and result
  * equivalence vs a full scan.
  */
class ManifestSpec extends SparkSpecBase {

  import spark.implicits._

  private def grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
    .toDF("a", "b")

  private def writeZ(dir: String): Unit =
    Layout.zorderBy(grid, Seq("a", "b"), numPartitions = 16, bits = 6)
      .write.mode("overwrite").parquet(dir)

  test("manifest rows cover every file with exact min/max and counts") {
    val dir = java.nio.file.Files.createTempDirectory("mani_data").toString
    writeZ(dir)
    val m = Manifest.build(spark, dir, Seq("a", "b"))
    assert(m.count() === 16L)
    assert(m.agg(sum("n_rows")).head.getLong(0) === 64L * 64L)
    // global extrema must survive the per-file stats
    assert(m.agg(min("min_a"), max("max_a")).head ===
      org.apache.spark.sql.Row(0L, 63L))
  }

  test("pruned read admits few files on z-layout and returns exact rows") {
    val dir = java.nio.file.Files.createTempDirectory("mani_data").toString
    writeZ(dir)
    val m = Manifest.build(spark, dir, Seq("a", "b"))
    val ranges = Map(
      "a" -> (lit(8L), lit(15L)),
      "b" -> (lit(16L), lit(23L)))
    val pruned = Manifest.prunedRead(spark, m, ranges)
    // exactness: same rows as the unpruned filter
    val full = spark.read.parquet(dir)
      .filter(col("a").between(8, 15) && col("b").between(16, 23))
    assert(pruned.count() === 64L)
    assert(pruned.as[(Long, Long)].collect().toSet ===
      full.as[(Long, Long)].collect().toSet)
    // and the scan really is file-pruned: few admitted files
    val admitted = pruned.select(input_file_name()).distinct().count()
    assert(admitted <= 4L, s"expected <=4 admitted files, got $admitted")
  }

  test("a predicate outside every zone reads zero files, correct schema") {
    val dir = java.nio.file.Files.createTempDirectory("mani_data").toString
    writeZ(dir)
    val m = Manifest.build(spark, dir, Seq("a"))
    val out = Manifest.prunedRead(spark, m, Map("a" -> (lit(1000L), lit(2000L))))
    assert(out.columns.toSeq === Seq("a", "b"))
    assert(out.count() === 0L)
  }

  test("compact → prunedRead: stale manifest fails fast with a rebuild instruction") {
    val dir = java.nio.file.Files.createTempDirectory("mani_data").toString
    writeZ(dir)
    val m = graft.operators.Materialize(Manifest.build(spark, dir, Seq("a", "b")))
    // the rewrite the manifest doesn't know about
    graft.sources.Compact.compact(spark, dir, targetBytes = 1L << 20)
    val ranges = Map("a" -> (lit(8L), lit(15L)), "b" -> (lit(16L), lit(23L)))
    // never a FileNotFoundException mid-job: the consult detects the
    // rewrite BEFORE scheduling any data task
    val e = intercept[IllegalStateException] {
      Manifest.prunedRead(spark, m, ranges).count()
    }
    assert(e.getMessage.contains("STALE") && e.getMessage.contains("rebuild"))
    // opt-in recovery: re-catalog in place and return exact rows
    val rebuilt = Manifest.prunedRead(spark, m, ranges, onStale = "rebuild")
    assert(rebuilt.count() === 64L)
  }

  // ---- per-file bloom skipping ----

  private def writeHashed(dir: String): Unit =
    grid.repartition(16, col("a"))
      .write.mode("overwrite").parquet(dir)

  test("bloom prunes equality probes on a hash layout where zones admit everything") {
    val dir = java.nio.file.Files.createTempDirectory("mani_bloom").toString
    writeHashed(dir)
    val m = graft.operators.Materialize(Manifest.buildWithBlooms(
      spark, dir, cols = Seq("a"), bloomCols = Seq("a"), expectedPerFile = 1024L))
    // zone maps alone: hash layout → every file spans ~[0,63] on `a`
    val zoneAdmits = m.filter(col("min_a") <= 7L && col("max_a") >= 7L).count()
    assert(zoneAdmits >= 4L, s"hash layout should defeat zones, admitted $zoneAdmits")
    val pruned = Manifest.prunedReadEq(spark, m, Map("a" -> 7L))
    val full = spark.read.parquet(dir).filter(col("a") === 7L)
    assert(pruned.count() === 64L)
    assert(pruned.as[(Long, Long)].collect().toSet ===
      full.as[(Long, Long)].collect().toSet)
    // the payoff: only the file(s) that can hold a=7 are scanned
    val scanned = pruned.select(input_file_name()).distinct().count()
    assert(scanned <= 3L, s"expected <=3 bloom-admitted files, got $scanned")
  }

  test("prunedReadIn: one pass over shared files, still prunes, exact IN result") {
    val dir = java.nio.file.Files.createTempDirectory("mani_in").toString
    writeHashed(dir)
    val m = graft.operators.Materialize(Manifest.buildWithBlooms(
      spark, dir, cols = Seq("a"), bloomCols = Seq("a"), expectedPerFile = 1024L))
    val pruned = Manifest.prunedReadIn(spark, m, "a", Seq(7L, 11L))
    val full = spark.read.parquet(dir).filter(col("a").isin(7L, 11L))
    assert(pruned.as[(Long, Long)].collect().toSet ===
      full.as[(Long, Long)].collect().toSet)
    // two probes admit at most the union of each probe's files
    val scanned = pruned.select(input_file_name()).distinct().count()
    assert(scanned <= 6L, s"expected <=6 bloom-admitted files, got $scanned")
    // values absent from every file → zero-file read, schema intact
    val none = Manifest.prunedReadIn(spark, m, "a", Seq(100000L, 100001L))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === full.columns.toSeq)
  }

  test("bloom probe absent from every file reads zero files; stale rebuild works") {
    val dir = java.nio.file.Files.createTempDirectory("mani_bloom").toString
    writeHashed(dir)
    val m = graft.operators.Materialize(Manifest.buildWithBlooms(
      spark, dir, cols = Seq(), bloomCols = Seq("a"), expectedPerFile = 1024L))
    val out = Manifest.prunedReadEq(spark, m, Map("a" -> 4096L))
    assert(out.columns.toSeq === Seq("a", "b"))
    assert(out.count() === 0L)
    // rewrite → stale consult must fail fast, rebuild must recover
    graft.sources.Compact.compact(spark, dir, targetBytes = 1L << 20)
    val e = intercept[IllegalStateException] {
      Manifest.prunedReadEq(spark, m, Map("a" -> 7L)).count()
    }
    assert(e.getMessage.contains("STALE"))
    assert(Manifest.prunedReadEq(spark, m, Map("a" -> 7L), onStale = "rebuild")
      .count() === 64L)
  }

  test("write/read round-trip: persisted manifest drives the same pruning") {
    val dir = java.nio.file.Files.createTempDirectory("mani_data").toString
    val mdir = java.nio.file.Files.createTempDirectory("mani_meta").toString
    writeZ(dir)
    Manifest.write(spark, dir, Seq("a", "b"), mdir)
    val m = spark.read.parquet(mdir)
    val out = Manifest.prunedRead(spark, m,
      Map("a" -> (lit(0L), lit(7L)), "b" -> (lit(0L), lit(7L))))
    assert(out.count() === 64L)
  }
}
