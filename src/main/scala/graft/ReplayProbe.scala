package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev probe: phase-level wall-clock of the two-batch FileReplay
  * harness (`q_stream_noop_replay`'s shape) — where does the replay
  * floor spend? Run:
  * `sbt "runMain graft.ReplayProbe /root/testdata/sf0.1 <reps>"`.
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe]   $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (i <- 0 until reps) {
      println(s"[probe] rep $i mgr=" + spark.conf.getOption(
        "spark.sql.streaming.checkpointFileManagerClass").getOrElse("default"))
      val t0 = System.nanoTime()
      val evs = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
      val replay = new graft.streaming.FileReplay(spark, evs.schema)
      t("add-b0")(replay.add(evs.filter(col("event_id") % 2 === 0)))
      val out = graft.streaming.Scratch.tmpDir("graft_noop_out")
      val q = t("start")(replay.stream
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", graft.streaming.Scratch.ckptDir())
        .foreachBatch((b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out))
        .start())
      try {
        t("paa-1")(q.processAllAvailable())
        println("[probe]   progress1 " + Option(q.lastProgress).map(_.json).getOrElse("none"))
        t("add-b1")(replay.add(evs.filter(col("event_id") % 2 =!= 0)))
        t("paa-2")(q.processAllAvailable())
        println("[probe]   progress2 " + Option(q.lastProgress).map(_.json).getOrElse("none"))
      } finally t("stop")(q.stop())
      t("readback")(
        spark.read.schema(evs.schema).parquet(out)
          .agg(count(lit(1)).as("n_rows")).collect())
      println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
