package graft

import org.apache.spark.sql.functions._

/** Dev probe (round 20): per-tick SERVE cost of the AggStream
  * partials table over a long stream, folding vs not — the round-19
  * verdict's item-6 done-criterion ("flat per-tick serve time across
  * a 50-tick replay"). Drives appendCombinedPartials + the dashboard
  * pair of serves for N ticks at compactEvery OFF and ON and prints
  * per-tick serve wall + partition counts.
  *
  * `runMain graft.ScaleProbeAggFold [ticks] [rowsPerTick]`
  */
object ScaleProbeAggFold {
  def main(args: Array[String]): Unit = {
    val ticks = if (args.length > 0) args(0).toInt else 50
    val perTick = if (args.length > 1) args(1).toInt else 20000
    val spark = GraftSession.get()
    import spark.implicits._
    val key = "spark.graft.streaming.partialsCompactEvery"

    def run(compactEvery: Long): Seq[Double] = {
      spark.conf.set(key, compactEvery.toString)
      val state = streaming.Scratch.tmpDir("aggfold_probe")
      val groupCols = Seq("user_id", "event_type")
      (0 until ticks).map { t =>
        val batch = spark.range(t.toLong * perTick, (t + 1L) * perTick)
          .select(
            (col("id") % 997).as("user_id"),
            concat(lit("t"), col("id") % 7).as("event_type"),
            col("id").as("event_id"),
            col("id").as("ts"),
            (col("id") % 500).cast("double").as("value"))
        graft.streaming.AggStream.appendCombinedPartials(
          batch, t.toLong, state, groupCols, Seq("ts", "event_id"), "value")
        val t0 = System.nanoTime()
        graft.streaming.AggStream.serve(spark, state, Seq("event_type"))
          .write.format("noop").mode("overwrite").save()
        graft.streaming.AggStream.serveLatest(
            spark, state, groupCols, Seq("ts", "event_id"), Seq("value"))
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        val dirs = new java.io.File(state).listFiles()
          .count(f => f.isDirectory && f.getName.startsWith("batch_id="))
        println(f"[aggfold] compactEvery=$compactEvery tick=$t%3d " +
          f"serve=${s}%6.3f s dirs=$dirs")
        s
      }
    }
    val off = run(0L)
    val on = run(32L)
    def tail10(xs: Seq[Double]) = xs.takeRight(10).sum / 10
    println(f"[aggfold] ticks=$ticks perTick=$perTick " +
      f"last-10-tick mean serve: off=${tail10(off)}%.3f s on=${tail10(on)}%.3f s")
    spark.stop()
    sys.exit(0)
  }
}
