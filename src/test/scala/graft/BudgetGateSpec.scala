package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.BudgetGate

/** Streaming per-group token-budget gate: in-batch deterministic
  * order, cross-batch spent state, one-row overshoot bound, replay
  * idempotence, and the real foreachBatch streaming path.
  */
class BudgetGateSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def df(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "grp_col", "n_tokens")

  // idHash order within a batch: rank ids by the same multiplicative
  // hash the gate (and the batch op) uses
  private def hashOrder(ids: Seq[Long]): Seq[Long] =
    ids.sortBy(id => ((id % 2147483647L) * 2654435761L % 2147483647L, id))

  test("accepts in idHash order until the group budget is spent; overshoot <= one row") {
    val state = tmp("bg_state")
    val ids = Seq(1L, 2L, 3L, 4L, 5L)
    val b0 = df(ids.map(i => (i, "en", 40L)): _*)
    val acc = BudgetGate.acceptBatch(b0, 0L, "grp_col", "doc_id", "n_tokens",
      state, budget = 100L).select("doc_id").as[Long].collect().toSet
    // 40-token docs vs budget 100: spent-before < 100 admits exactly 3
    // (0, 40, 80 all < 100; the third overshoots to 120 and closes the group)
    assert(acc === hashOrder(ids).take(3).toSet)
  }

  test("cross-batch state: an exhausted group rejects everything in later batches") {
    val state = tmp("bg_state")
    BudgetGate.acceptBatch(df((1L, "en", 90L), (2L, "de", 10L)),
      0L, "grp_col", "doc_id", "n_tokens", state, budget = 100L).collect()
    // en spent 90 -> one more row still fits (89+..., spent-before 90 < 100);
    // after it the group is closed; de has 90 left
    val a1 = BudgetGate.acceptBatch(
      df((10L, "en", 50L), (11L, "en", 50L), (20L, "de", 50L)),
      1L, "grp_col", "doc_id", "n_tokens", state, budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    val enFirst = hashOrder(Seq(10L, 11L)).head
    assert(a1 === Set(enFirst, 20L))
    // batch 2: en now spent 140 >= 100 -> rejects even a 1-token row;
    // every group's FIRST row overall is always accepted (fresh group)
    val a2 = BudgetGate.acceptBatch(
      df((30L, "en", 1L), (40L, "fr", 999L)),
      2L, "grp_col", "doc_id", "n_tokens", state, budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(a2 === Set(40L))
  }

  test("replaying a batch id overwrites its state partition (no double count)") {
    val state = tmp("bg_state")
    val b0 = df((1L, "en", 60L))
    BudgetGate.acceptBatch(b0, 0L, "grp_col", "doc_id", "n_tokens",
      state, budget = 100L).collect()
    // replay batch 0 — state must hold ONE 60-token delta, not 120
    BudgetGate.acceptBatch(b0, 0L, "grp_col", "doc_id", "n_tokens",
      state, budget = 100L).collect()
    val a1 = BudgetGate.acceptBatch(df((2L, "en", 30L)),
      1L, "grp_col", "doc_id", "n_tokens", state, budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(a1 === Set(2L)) // spent-before 60 < 100; 120 would reject
  }

  test("null token counts ride free; staging-column collisions are refused") {
    val state = tmp("bg_state")
    val rows = Seq((1L, "en", Some(95L)), (2L, "en", Option.empty[Long]))
      .toDF("doc_id", "grp_col", "n_tokens")
    val acc = BudgetGate.acceptBatch(rows, 0L, "grp_col", "doc_id", "n_tokens",
      state, budget = 100L).select("doc_id").as[Long].collect().toSet
    assert(acc === Set(1L, 2L)) // null = 0 tokens, never closes the budget
    intercept[IllegalArgumentException] {
      BudgetGate.acceptBatch(
        rows.withColumnRenamed("grp_col", "__cum"), 0L, "__cum", "doc_id",
        "n_tokens", state, budget = 100L)
    }
  }

  test("end-to-end streaming gate over MemoryStream micro-batches") {
    val state = tmp("bg_state"); val out = tmp("bg_out")
    val ckpt = tmp("bg_ckpt")
    val input = MemoryStream[(Long, String, Long)](spark)
    val q = BudgetGate.gate(
      input.toDF().toDF("doc_id", "grp_col", "n_tokens"),
      "grp_col", "doc_id", "n_tokens", state, out, ckpt, budget = 100L)
    try {
      input.addData((1L, "en", 80L), (2L, "de", 80L))
      q.processAllAvailable()
      input.addData((3L, "en", 80L), (4L, "de", 10L), (5L, "de", 80L))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    // en: 80 spent, then 80 more (before=80 < 100) closes it at 160.
    // de: 80, then 10 and 80 in batch 2 — in-batch idHash order decides
    val deOrder = hashOrder(Seq(4L, 5L))
    val deAccepted =
      if (deOrder == Seq(4L, 5L)) Set(4L, 5L) // 80+10=90 before 5 -> 5 in too
      else Set(5L, 4L)                        // 80+80=160 before 4 -> 4 out
    val expected =
      if (deOrder == Seq(4L, 5L)) Set(1L, 2L, 3L, 4L, 5L)
      else Set(1L, 2L, 3L, 5L)
    assert(accepted === expected, s"deOrder=$deOrder deAccepted=$deAccepted")
  }
}
