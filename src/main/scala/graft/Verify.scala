package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Gate-robustness contract (round 10, after the round-9 driver artifact
  * came back empty despite a 195/195 local pass):
  *  - `oracle_sql.json` is written BEFORE any query runs, so a mid-run
  *    kill (time budget, OOM) still leaves every completed per-query
  *    parquet comparable — a partial artifact instead of an empty one.
  *  - Queries run in [[QueryCatalog]] order: ~180 cheap batch queries
  *    first, the 21+ streaming replays last, so a timeout loses the
  *    expensive tail, not the whole round.
  *  - Per-query wall-clock + cumulative time go to stdout so a driver
  *    log shows exactly where a budget was exceeded.
  *  - A per-query watchdog (`SPARK_GRAFT_VERIFY_TIMEOUT_S`, default
  *    300 s — the slowest sf0.01 query measures ~8 s on a quiet box)
  *    cancels a hung query's job group and moves on, so one
  *    pathological plan costs its timeout, not the round
  *    (spec-pinned in `VerifyWatchdogSpec`).
  */
object Verify {

  /** Run one query under the watchdog: dump to `outDir/<name>` or fail
    * within `timeoutS`. Returns `None` on success, `Some(reason)` on
    * failure/timeout. The worker thread owns the job group
    * (`setJobGroup` is thread-local), so a timeout cancels exactly
    * this query's jobs and leaves the session usable for the rest of
    * the run.
    */
  def runOne(
      spark: SparkSession,
      qd: QueryDef,
      sfDir: String,
      outDir: String,
      timeoutS: Long): Option[String] = {
    val group = s"verify-${qd.name}"
    val worker = new java.util.concurrent.FutureTask[Unit](
      new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(group, qd.name,
            interruptOnCancel = true)
          try qd.fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/${qd.name}")
          finally spark.sparkContext.clearJobGroup()
        }
      })
    val th = new Thread(worker, group)
    th.setDaemon(true)
    th.start()
    try {
      worker.get(timeoutS, java.util.concurrent.TimeUnit.SECONDS)
      None
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        worker.cancel(true)
        // Join with a grace period: the worker's finally blocks (e.g. a
        // streaming replay's shuffle-partition restore) must complete
        // before the next query starts, or the session conf stays
        // narrowed for the rest of the run.
        th.join(15000)
        val note =
          if (th.isAlive) " — worker refused to die within 15s grace"
          else ""
        Some(s"timed out after ${timeoutS}s (job group cancelled)$note")
      case e: java.util.concurrent.ExecutionException =>
        Some(String.valueOf(e.getCause.getMessage))
      case e: Throwable =>
        Some(String.valueOf(e.getMessage))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val timeoutS =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_S", "300").toLong
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val t0 = System.nanoTime()
    var ok, bad = 0
    // Optional subset for local iteration (comma-separated names):
    // the driver never sets this, so its runs stay full-catalog.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    QueryCatalog.all.filter(qd => only.forall(_.contains(qd.name))).foreach { qd =>
      val s = System.nanoTime()
      runOne(spark, qd, sfDir, outDir, timeoutS) match {
        case None =>
          ok += 1
          println(f"[verify] ${qd.name} ok ${(System.nanoTime() - s) / 1e9}%.1fs" +
            f" (cum ${(System.nanoTime() - t0) / 1e9}%.0fs, $ok ok)")
        case Some(reason) =>
          bad += 1
          System.err.println(s"[verify] ${qd.name} failed: $reason")
      }
    }
    println(f"[verify] done: $ok ok, $bad failed," +
      f" ${(System.nanoTime() - t0) / 1e9}%.0fs total")
    spark.stop()
    // Hard exit: streaming replays can leave non-daemon threads
    // (state-store maintenance pools). A JVM that hangs here reads as
    // a FAILED run to the driver even though every per-query parquet
    // is already on disk — and a failed run is indistinguishable from
    // an empty round. Exit 0 whenever ANYTHING succeeded (partial
    // failures still leave comparable outputs, and a nonzero rc risks
    // the driver discarding the whole dump) — but a run where EVERY
    // query failed (or the outDir was never writable) has nothing to
    // compare, so rc-based callers get the total-failure signal.
    sys.exit(if (ok > 0) 0 else 1)
  }
}
