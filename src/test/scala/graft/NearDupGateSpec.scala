package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.NearDupGate

/** Streaming MinHash near-dup gate: first-wins across micro-batches,
  * chain collapse to the earliest keeper, idempotent batch replay, and
  * the real foreachBatch streaming path.
  */
class NearDupGateSpec extends SparkSpecBase {

  import spark.implicits._

  // Three near-dup families (one-token edits of ≥10-token sentences)
  // plus unique docs; family letters mark expected components.
  private val baseA = "the quick brown fox jumps over the lazy dog tonight again"
  private val baseB = "distributed query engines shuffle data between stages for joins always"
  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("first batch: intra-batch dups collapse to min id; uniques pass") {
    val state = tmp("ndg_state")
    val b0 = docsDf(
      10L -> baseA, 11L -> baseA.replace("tonight", "today"),
      20L -> baseB, 30L -> "short unique text")
    val acc = NearDupGate.acceptBatch(b0, 0L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(acc === Set(10L, 20L, 30L))
  }

  test("later batch rejects near-dups of earlier accepted docs") {
    val state = tmp("ndg_state")
    NearDupGate.acceptBatch(docsDf(10L -> baseA, 20L -> baseB),
      0L, "doc_id", "text", state).collect()
    val acc1 = NearDupGate.acceptBatch(
      docsDf(
        40L -> baseA.replace("again", "anew"), // dup of accepted 10
        50L -> "a genuinely new document about completely different things"),
      1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(acc1 === Set(50L))
  }

  test("a component touching stream history rejects ALL its members") {
    val state = tmp("ndg_state")
    NearDupGate.acceptBatch(docsDf(10L -> baseA), 0L, "doc_id", "text", state)
      .collect()
    // 40 dups accepted-10; 41 dups 40 (and 10). Batch CC over the whole
    // corpus would put {10, 40, 41} in one component with keeper 10 —
    // so BOTH 40 and 41 must go, even though 40 is its component's min.
    val acc1 = NearDupGate.acceptBatch(
      docsDf(
        40L -> baseA.replace("again", "anew"),
        41L -> baseA.replace("again", "afresh")),
      1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(acc1 === Set.empty[Long])
  }

  test("replaying a batch is idempotent (state + output identical)") {
    val state = tmp("ndg_state")
    NearDupGate.acceptBatch(docsDf(10L -> baseA), 0L, "doc_id", "text", state)
      .collect()
    val b1 = docsDf(40L -> baseA.replace("again", "anew"), 50L -> baseB)
    val first = NearDupGate.acceptBatch(b1, 1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    val stateRows = NearDupGate.readState(spark, state).count()
    // failure recovery re-runs the same micro-batch
    val replay = NearDupGate.acceptBatch(b1, 1L, "doc_id", "text", state)
      .select("doc_id").as[Long].collect().toSet
    assert(replay === first)
    assert(first === Set(50L))
    assert(NearDupGate.readState(spark, state).count() === stateRows)
  }

  test("a clean batch (no dups anywhere) passes through whole") {
    val state = tmp("ndg_state")
    val acc = NearDupGate.acceptBatch(
      docsDf(1L -> baseA, 2L -> baseB), 0L, "doc_id", "text", state)
    assert(acc.count() === 2L)
  }

  test("end-to-end streaming gate over MemoryStream micro-batches") {
    val state = tmp("ndg_state"); val out = tmp("ndg_out")
    val ckpt = tmp("ndg_ckpt")
    val input = MemoryStream[(Long, String)](spark)
    val q = NearDupGate.gate(
      input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", state, out, ckpt)
    try {
      input.addData(10L -> baseA, 11L -> baseA.replace("tonight", "today"),
        20L -> baseB)
      q.processAllAvailable()
      input.addData(40L -> baseA.replace("again", "anew"), 50L -> "fresh one of a kind content here")
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(accepted === Set(10L, 20L, 50L))
  }
}
