package graft

import org.apache.spark.sql.functions._

import graft.sources.{Manifest, ManifestedSink}

/** Transactional manifest sink: data-dir ↔ manifest coherence after
  * every batch, idempotent replay, orphan cleanup, crash-staged
  * publish recovery, and live pruning mid-ingest.
  */
class ManifestedSinkSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def batchDf(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"row$i")).toDF("k", "payload")

  test("two batches: every file cataloged, staleness guard passes, blooms prune") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    // appendBatch is the foreachBatch body — drive it directly
    ManifestedSink.appendBatch(batchDf(0, 64).repartition(4, col("k")),
      dir, mdir, Seq("k"), Seq("k"), batchId = 0L, expectedPerFile = 1024L)
    ManifestedSink.appendBatch(batchDf(64, 128).repartition(4, col("k")),
      dir, mdir, Seq("k"), Seq("k"), batchId = 1L, expectedPerFile = 1024L)

    val m = graft.operators.Materialize(
      ManifestedSink.readManifest(spark, mdir).get)
    assert(m.agg(sum("n_rows")).head.getLong(0) === 128L)
    assert(m.select("batch_id").distinct().count() === 2L)
    // coherence: prunedReadEq must NOT see a stale manifest
    val hit = Manifest.prunedReadEq(spark, m, Map("k" -> 7L))
    assert(hit.count() === 1L)
    val scanned = hit.select(input_file_name()).distinct().count()
    assert(scanned <= 3L, s"expected bloom-pruned scan, got $scanned files")
  }

  test("replaying a batch id is idempotent (no duplicate rows, no duplicate catalog)") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    ManifestedSink.appendBatch(batchDf(0, 32), dir, mdir, Seq("k"), Seq("k"), 0L)
    ManifestedSink.appendBatch(batchDf(32, 64), dir, mdir, Seq("k"), Seq("k"), 1L)
    // crash-replay of batch 1
    ManifestedSink.appendBatch(batchDf(32, 64), dir, mdir, Seq("k"), Seq("k"), 1L)
    assert(spark.read.parquet(dir).count() === 64L)
    assert(spark.read.parquet(dir).select("k").distinct().count() === 64L)
    val m = ManifestedSink.readManifest(spark, mdir).get
    assert(m.agg(sum("n_rows")).head.getLong(0) === 64L)
  }

  test("uncommitted orphan files are swept on the next append") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    ManifestedSink.appendBatch(batchDf(0, 32), dir, mdir, Seq("k"), Seq("k"), 0L)
    // simulate a batch that crashed after writing data, before publish
    batchDf(1000, 1032).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() === 64L) // orphans visible raw
    ManifestedSink.appendBatch(batchDf(32, 64), dir, mdir, Seq("k"), Seq("k"), 1L)
    val rows = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(rows === (0L until 64L).toSet) // orphans gone, batches intact
    // and the manifest still exactly matches the directory
    val m = ManifestedSink.readManifest(spark, mdir).get
    assert(Manifest.prunedReadEq(spark, m, Map("k" -> 33L)).count() === 1L)
  }

  test("crash between manifest delete and rename recovers from the stage") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    ManifestedSink.appendBatch(batchDf(0, 32), dir, mdir, Seq("k"), Seq("k"), 0L)
    // simulate the crash window: live manifest deleted, stage present
    val fs = new org.apache.hadoop.fs.Path(mdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(mdir),
      new org.apache.hadoop.fs.Path(mdir + ".stage"))
    val m = ManifestedSink.readManifest(spark, mdir)
    assert(m.isDefined)
    assert(m.get.agg(sum("n_rows")).head.getLong(0) === 32L)
  }

  test("readAsOf: batch-snapshot time travel off the commit log") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    ManifestedSink.appendBatch(batchDf(0, 32), dir, mdir, Seq("k"), Seq("k"), 0L)
    ManifestedSink.appendBatch(batchDf(32, 64), dir, mdir, Seq("k"), Seq("k"), 1L)
    ManifestedSink.appendBatch(batchDf(64, 96), dir, mdir, Seq("k"), Seq("k"), 2L)
    assert(ManifestedSink.readAsOf(spark, mdir, 0L)
      .select("k").as[Long].collect().toSet === (0L until 32L).toSet)
    assert(ManifestedSink.readAsOf(spark, mdir, 1L).count() === 64L)
    assert(ManifestedSink.readAsOf(spark, mdir, 99L).count() === 96L)
    intercept[IllegalArgumentException] {
      ManifestedSink.readAsOf(spark, mdir, -1L)
    }
  }

  test("readChangesSince: incremental consumption touches only new batches") {
    val dir = tmp("msink_cdf"); val mdir = tmp("msink_cdf_meta")
    ManifestedSink.appendBatch(batchDf(0, 32), dir, mdir, Seq("k"), Seq("k"), 0L)
    ManifestedSink.appendBatch(batchDf(32, 64), dir, mdir, Seq("k"), Seq("k"), 1L)
    // consumer materialized through batch 0, resumes:
    assert(ManifestedSink.latestBatchId(spark, mdir) === 1L)
    val delta = ManifestedSink.readChangesSince(spark, mdir, sinceBatchId = 0L)
    assert(delta.select("k").as[Long].collect().toSet === (32L until 64L).toSet)
    // only batch-1 files were opened
    assert(delta.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).nonEmpty))
    // bounded window
    ManifestedSink.appendBatch(batchDf(64, 96), dir, mdir, Seq("k"), Seq("k"), 2L)
    assert(ManifestedSink.readChangesSince(spark, mdir, 0L, untilBatchId = 1L)
      .count() === 32L)
    // caught-up consumer: empty, schema intact
    val none = ManifestedSink.readChangesSince(spark, mdir, sinceBatchId = 2L)
    assert(none.count() === 0L)
    assert(none.columns.contains("k"))
  }

  test("out-of-band manifest rewrite invalidates the driver cache (fingerprint guard)") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    ManifestedSink.appendBatch(batchDf(0, 32), dir, mdir, Seq("k"), Seq("k"), 0L)
    // snapshot the batch-0 manifest, append batch 1 (cache now holds
    // batches {0,1}), then restore the snapshot — simulating another
    // process rolling the manifest back out-of-band
    val snap = tmp("msink_snap")
    val fs = new org.apache.hadoop.fs.Path(mdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(mdir),
      fs, new org.apache.hadoop.fs.Path(snap, "m"), false, true,
      spark.sessionState.newHadoopConf())
    ManifestedSink.appendBatch(batchDf(32, 64), dir, mdir, Seq("k"), Seq("k"), 1L)
    fs.delete(new org.apache.hadoop.fs.Path(mdir), true)
    fs.rename(new org.apache.hadoop.fs.Path(snap, "m"),
      new org.apache.hadoop.fs.Path(mdir))
    // the manifest (truth) now says only batch 0 committed — batch 1's
    // files are orphans and MUST be swept by the next append; a stale
    // cache would have kept cataloging them
    ManifestedSink.appendBatch(batchDf(64, 96), dir, mdir, Seq("k"), Seq("k"), 2L)
    val rows = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(rows === ((0L until 32L) ++ (64L until 96L)).toSet,
      "restored manifest must win over the in-JVM cache")
    val m = ManifestedSink.readManifest(spark, mdir).get
    assert(m.agg(sum("n_rows")).head.getLong(0) === 64L)
  }

  test("the cached and freshly-read manifest publish identical rows") {
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    ManifestedSink.appendBatch(batchDf(0, 32).repartition(2, col("k")),
      dir, mdir, Seq("k"), Seq("k"), 0L)
    ManifestedSink.appendBatch(batchDf(32, 64).repartition(2, col("k")),
      dir, mdir, Seq("k"), Seq("k"), 1L) // cache-hit publish
    val viaCache = ManifestedSink.readManifest(spark, mdir).get
      .select("file", "n_rows", "min_k", "max_k", "batch_id")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // same sequence with the cache wiped before every append
    val dir2 = tmp("msink_data2"); val mdir2 = tmp("msink_meta2")
    ManifestedSink.invalidateManifestCache()
    ManifestedSink.appendBatch(batchDf(0, 32).repartition(2, col("k")),
      dir2, mdir2, Seq("k"), Seq("k"), 0L)
    ManifestedSink.invalidateManifestCache()
    ManifestedSink.appendBatch(batchDf(32, 64).repartition(2, col("k")),
      dir2, mdir2, Seq("k"), Seq("k"), 1L)
    val viaDisk = ManifestedSink.readManifest(spark, mdir2).get
      .select("file", "n_rows", "min_k", "max_k", "batch_id")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    def stripDir(s: Set[(String, Long, Long, Long, Long)]) =
      s.map { case (f, n, lo, hi, b) =>
        (f.substring(f.lastIndexOf('/') + 1).replaceAll("part-\\d+-[-0-9a-f]+", "part"),
          n, lo, hi, b) }
    assert(viaCache.size === viaDisk.size)
    assert(stripDir(viaCache).map(t => (t._2, t._3, t._4, t._5))
      === stripDir(viaDisk).map(t => (t._2, t._3, t._4, t._5)))
  }

  test("real writeStream drive: the sink body commits per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp("msink_data"); val mdir = tmp("msink_meta")
    val ckpt = tmp("msink_ckpt")
    val input = MemoryStream[(Long, String)](spark)
    val q = ManifestedSink.sink(
      input.toDF().toDF("k", "payload"), dir, mdir, Seq("k"), Seq("k"), ckpt)
    try {
      input.addData((0L until 32L).map(i => (i, s"row$i")))
      q.processAllAvailable()
      input.addData((32L until 64L).map(i => (i, s"row$i")))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(dir).count() === 64L)
    val m = ManifestedSink.readManifest(spark, mdir).get
    assert(m.agg(sum("n_rows")).head.getLong(0) === 64L)
    assert(m.select("batch_id").distinct().count() === 2L)
    // pruning is live immediately after ingest — no rebuild step
    assert(Manifest.prunedReadEq(spark, m, Map("k" -> 5L)).count() === 1L)
  }

  test("auditedSink: a poisoned micro-batch diverts whole to rejects, clean ones commit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp("wsink_data"); val mdir = tmp("wsink_meta")
    val ckpt = tmp("wsink_ckpt"); val rej = tmp("wsink_rej")
    val input = MemoryStream[(Long, Double)](spark)
    val q = ManifestedSink.auditedSink(
      input.toDF().toDF("k", "v"), dir, mdir, Seq("k"), Seq("k"), ckpt,
      rules = Seq("v_positive" -> (col("v") > 0)),
      rejectDir = rej)
    try {
      input.addData((0L until 8L).map(i => (i, 1.0)))       // clean
      q.processAllAvailable()
      input.addData(Seq((8L, 2.0), (9L, -1.0)))             // poisoned
      q.processAllAvailable()
      input.addData((10L until 14L).map(i => (i, 3.0)))     // clean again
      q.processAllAvailable()
    } finally q.stop()
    // table holds ONLY the clean batches; the manifest agrees
    val table = spark.read.parquet(dir)
    assert(table.count() === 12L)
    assert(table.filter(col("v") <= 0).count() === 0L)
    val m = ManifestedSink.readManifest(spark, mdir).get
    assert(m.agg(sum("n_rows")).head.getLong(0) === 12L)
    // the poisoned batch survives WHOLE in the reject dir — including
    // its clean-looking rows (batch-grain quarantine for replay)
    val rejected = spark.read.parquet(rej)
    assert(rejected.count() === 2L)
    assert(rejected.select("k").as[Long].collect().toSet === Set(8L, 9L))
  }
}
