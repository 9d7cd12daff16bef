package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Host-cardinality politeness probe (round-17 verdict task 6): the
  * round-16 BASELINE entry adjudicated `fetchScheduled`'s ~+0.7/decade
  * as a 5-HOST FIXTURE's parallelism wall and asserted "real plans
  * span millions of hosts" — this main MEASURES that claim at 10k
  * hosts instead of asserting it. Fixed total range count, host
  * cardinality swept 5 → 100 → 10 000 (ranges per host 20 000 → 1 000
  * → 10), same archive bytes each time: if hosts are truly the
  * parallelism unit, wall time should FALL from the 5-host serial
  * wall to the flat per-range cost at full task width and then hold;
  * if a per-host fixed cost dominates at 10k hosts (scheduler rows,
  * window state, per-host-run segment reopens), the 10k point rises
  * and the tasks-per-host batching fix gets recorded.
  *
  * Stages timed separately per host count:
  *  - `schedule` — [[graft.sources.Cdx.schedule]] (per-host window)
  *    into a Materialize cut;
  *  - `fetch`    — [[graft.sources.Warc.fetchScheduled]] over that
  *    cut, noop-written.
  *
  * The archive is ONE segment of gzip members (the fixture writer is
  * excluded: built once, reused by every host count — only host
  * LABELS change per sweep point, so every sweep reads identical
  * bytes). Protocol: `SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g`,
  * warm-min across ≥2 in-JVM reps per point (the first rep charges
  * codegen), ≥2 fresh JVMs by the caller.
  *
  * `runMain graft.ScaleProbeHosts [totalRanges]` (default 100 000).
  */
object ScaleProbeHosts {
  def main(args: Array[String]): Unit = {
    val total = if (args.nonEmpty) args(0).toInt else 100000
    val spark = GraftSession.get()
    import spark.implicits._

    // one segment, `total` tiny records — built once, host-agnostic
    val dir = graft.streaming.Scratch.tmpDir("graft_probe_hosts")
    val payload = ("x" * 80).getBytes("UTF-8")
    val recs = (0 until total).map { i =>
      graft.sources.Warc.renderRecord(
        warcType = "response",
        recordId = s"<urn:uuid:ph-$i>",
        targetUri = s"https://h.test/doc/$i", // host comes from the PLAN
        warcDate = "2026-08-16T00:00:00Z",
        contentType = "text/plain",
        payload = payload)
    }
    val (bytes, idx) = graft.sources.Warc.gzipMembersIndexed(recs)
    Files.write(Paths.get(dir, "seg.warc.gz"), bytes)
    println(s"[probe] fixture ranges=$total bytes=${bytes.length}")

    val ranges = idx.zipWithIndex.map { case ((off, len), i) =>
      (i, "seg.warc.gz", off, len)
    }.toDF("i", "warc_file", "offset", "length")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
      r
    }

    Seq(5, 100, 10000).foreach { hosts =>
      val plan = ranges.select(
        col("warc_file"), col("offset"), col("length"),
        concat(lit("h"), (col("i") % hosts).cast("string"), lit(".test"))
          .as("host"),
        lit(0.001).as("delay_s"))
      (1 to 2).foreach { rep =>
        val sched = time(s"schedule_h${hosts}_r$rep") {
          graft.operators.Materialize(graft.sources.Cdx.schedule(
            plan, "host", "delay_s", orderCols = Seq("warc_file", "offset")))
        }
        time(s"fetch_h${hosts}_r$rep") {
          val (recs2, rej) = graft.sources.Warc.fetchScheduled(
            spark, sched, baseDir = dir)
          val n = recs2.count()
          require(rej.count() == 0L && n == total.toLong,
            s"landed $n of $total")
        }
        graft.operators.Materialize.release(sched)
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
