package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SketchStream

/** Streaming sketch maintenance ([[graft.streaming.SketchStream]]):
  * serve-over-partials equals the one-shot sketch of the full
  * history, replay is idempotent, and state stays sketch-sized.
  */
class SketchStreamSpec extends SparkSpecBase {

  import spark.implicits._

  private def rows = (1L to 8000L).map(i => (s"g${i % 4}", i % 997))

  test("serving over streamed partials equals the direct full-history sketch") {
    val stateDir = java.nio.file.Files.createTempDirectory("sketch_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sketch_ckpt").toString
    val input = MemoryStream[(String, Long)](spark)
    val q = SketchStream.stream(
      input.toDF().toDF("grp", "member"), stateDir, ckpt, Seq("grp"), "member")
    val (b0, b1) = rows.partition(_._2 % 2 == 0)
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
    } finally q.stop()

    val served = SketchStream.serve(spark, stateDir, Seq("grp"))
      .as[(String, Long)].collect().toMap
    val direct = rows.toDF("grp", "member").groupBy("grp")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("member"), lit(12)))
        .as("approx_distinct"))
      .as[(String, Long)].collect().toMap
    assert(served === direct)
    // and the estimate is close to truth
    val exact = rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    exact.foreach { case (g, n) =>
      assert(math.abs(served(g) - n).toDouble / n < 0.05, s"$g: ${served(g)} vs $n")
    }
  }

  test("replaying a batch id overwrites its own partition (idempotent)") {
    val stateDir = java.nio.file.Files.createTempDirectory("sketch_replay").toString
    val df0 = rows.take(4000).toDF("grp", "member")
    val df1 = rows.drop(4000).toDF("grp", "member")
    SketchStream.appendPartials(df0, 0L, stateDir, Seq("grp"), "member")
    SketchStream.appendPartials(df1, 1L, stateDir, Seq("grp"), "member")
    val once = SketchStream.serve(spark, stateDir, Seq("grp"))
      .as[(String, Long)].collect().toMap
    // failure recovery re-runs the last batch
    SketchStream.appendPartials(df1, 1L, stateDir, Seq("grp"), "member")
    val twice = SketchStream.serve(spark, stateDir, Seq("grp"))
      .as[(String, Long)].collect().toMap
    assert(twice === once)
    // state is sketch-sized: one partial row per (group, batch)
    assert(spark.read.parquet(stateDir).count() === 8L)
  }

  test("portable registers: streamed slices serve the exact one-shot state; replay idempotent") {
    import org.apache.spark.sql.functions.col
    val stateDir = java.nio.file.Files.createTempDirectory("sketch_preg").toString
    val df0 = rows.take(4000).toDF("grp", "member")
    val df1 = rows.drop(4000).toDF("grp", "member")
    SketchStream.appendPortable(df0, 0L, stateDir, Seq("grp"), col("member"))
    SketchStream.appendPortable(df1, 1L, stateDir, Seq("grp"), col("member"))
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val served = snap(SketchStream.servePortable(spark, stateDir, Seq("grp")))
    // streamed end state ≡ one-shot batch registers, bit for bit —
    // the property that lets the replay query share the batch oracle
    val direct = snap(graft.operators.Sketches.hllPortableRegisters(
      rows.toDF("grp", "member"), Seq("grp"), col("member")))
    assert(served === direct)
    // replaying a batch overwrites its own partition
    SketchStream.appendPortable(df1, 1L, stateDir, Seq("grp"), col("member"))
    assert(snap(SketchStream.servePortable(spark, stateDir, Seq("grp"))) === direct)
  }
}
