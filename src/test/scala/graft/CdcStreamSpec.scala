package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.streaming.CdcStream

/** One change row for the MemoryStream fixture (top-level: local
  * case classes have no derivable Encoder).
  */
final case class CdcSpecChange(
    id: Long, ts: Timestamp, event_id: Long, op: String, new_bal: Double)

/** Streaming CDC apply ([[graft.streaming.CdcStream]]): end-state
  * equality with the batch merge under adversarial batch splits,
  * out-of-order / tombstone semantics, and replay idempotency.
  */
class CdcStreamSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def base = Seq(
    (1L, "alice", 100.0),
    (2L, "bob", 200.0),
    (3L, "carol", 300.0)).toDF("id", "name", "bal")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val key = Seq("id")
  private val ord = Seq("ts", "event_id")
  private val upd = Map("bal" -> "new_bal")

  private def mkChanges(rows: Seq[(Long, String, Long, String, Double)]) =
    rows.toDF("id", "tss", "event_id", "op", "new_bal")
      .select(col("id"), col("tss").cast("timestamp").as("ts"),
        col("event_id"), col("op"), col("new_bal"))

  private def applySeq(dir: String, batches: Seq[Seq[(Long, String, Long, String, Double)]]): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      CdcStream.applyBatch(mkChanges(b), i.toLong, dir, base, key, ord, "op", upd)
    }

  private def readIds(dir: String): Map[Long, (String, Double)] =
    CdcStream.readTable(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)).orNull, r.getDouble(2))).toMap

  test("stale update arriving after a newer one is rejected (ord gate)") {
    val dir = tmp("cdc_stale")
    applySeq(dir, Seq(
      Seq((1L, "2024-01-01 10:00:00", 10L, "U", 150.0)),
      Seq((1L, "2024-01-01 09:00:00", 5L, "U", 999.0)))) // older ts → stale
    assert(readIds(dir)(1L) === (("alice", 150.0)))
  }

  test("stale update after a delete does not resurrect the row") {
    val dir = tmp("cdc_tomb")
    applySeq(dir, Seq(
      Seq((2L, "2024-01-01 10:00:00", 10L, "D", 0.0)),
      Seq((2L, "2024-01-01 09:00:00", 5L, "U", 999.0))))
    assert(!readIds(dir).contains(2L))
  }

  test("newer update after a delete resurrects the row with unmapped columns intact") {
    val dir = tmp("cdc_resurrect")
    applySeq(dir, Seq(
      Seq((2L, "2024-01-01 10:00:00", 10L, "D", 0.0)),
      Seq((2L, "2024-01-01 11:00:00", 20L, "U", 42.0))))
    // the batch merge of the full log never deletes (last op is U),
    // so bob's name survives
    assert(readIds(dir)(2L) === (("bob", 42.0)))
  }

  test("replayed batch id recomputes from the same prior state (idempotent)") {
    val dir = tmp("cdc_replay")
    val b0 = Seq((1L, "2024-01-01 10:00:00", 10L, "U", 150.0))
    val b1 = Seq((3L, "2024-01-01 11:00:00", 20L, "D", 0.0))
    applySeq(dir, Seq(b0, b1))
    val once = readIds(dir)
    // failure recovery re-runs the last batch
    CdcStream.applyBatch(mkChanges(b1), 1L, dir, base, key, ord, "op", upd)
    assert(readIds(dir) === once)
    assert(CdcStream.versions(spark, dir) === Seq(0L, 1L))
  }

  test("end state equals batch Cdc.applyChanges under an adversarial parity split (real writeStream)") {
    // change log with inserts, deletes, out-of-order updates
    val rnd = new scala.util.Random(11)
    val log = (1L to 200L).map { eid =>
      val id = rnd.nextInt(6).toLong + 1L // ids 1..6 (4..6 are inserts)
      val op = if (rnd.nextInt(5) == 0) "D" else "U"
      (id, f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00", eid, op, rnd.nextInt(1000).toDouble)
    }
    val expected = Cdc.applyChanges(base, mkChanges(log), key, ord, "op", upd)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).orNull, r.getDouble(2))).toSet

    val typed = log.map { case (id, t, eid, op, nb) => CdcSpecChange(id, ts(t), eid, op, nb) }
    val (even, odd) = typed.partition(_.event_id % 2 == 0) // scatters timestamps
    val dir = tmp("cdc_e2e")
    val ckpt = tmp("cdc_e2e_ckpt")
    val input = MemoryStream[CdcSpecChange](spark)
    val q = CdcStream.stream(input.toDF(), dir, ckpt, base, key, ord, "op", upd)
    try {
      input.addData(even); q.processAllAvailable()
      input.addData(odd); q.processAllAvailable()
    } finally q.stop()
    val got = CdcStream.readTable(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).orNull, r.getDouble(2))).toSet
    assert(got === expected)
  }
}
