package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** StreamCurate per-stage tick decomposition (round 19, dev probe):
  * `q_stream_curate` spends ~5-6 s driving two parity micro-batches
  * at sf0.1 against a 0.9 s two-tick replay floor — this main runs
  * the SAME stage sequence the foreachBatch body runs (gate filter →
  * NearDupGate.acceptBatch → token count → BudgetGate.acceptBatch →
  * accepted-partition write), directly per batch, so the per-stage
  * wall splits without the streaming machinery in the way. Sized to
  * the replay harness's 8 shuffle partitions.
  *
  * `runMain graft.ScaleProbeStreamCurate <sfDir>`
  */
object ScaleProbeStreamCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.get()
    val key = "spark.sql.shuffle.partitions"
    spark.conf.set(key,
      spark.conf.get("spark.graft.streaming.shufflePartitions", "8"))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    docs.count() // sponge

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      val nd = graft.streaming.Scratch.tmpDir(s"graft_pscur_nd_$rep")
      val bud = graft.streaming.Scratch.tmpDir(s"graft_pscur_bud_$rep")
      val acc = graft.streaming.Scratch.tmpDir(s"graft_pscur_acc_$rep")
      (0 to 1).foreach { b =>
        val batch = docs.filter(col("doc_id") % 2 === b)
        val gated = t(s"rep${rep}_b${b}_gate") {
          val g = graft.operators.Materialize(
            TextAnalysis.qualityKeep(batch, "text"))
          g.count(); g
        }
        val kept = t(s"rep${rep}_b${b}_neardup") {
          val k = graft.streaming.NearDupGate.acceptBatch(
            gated, b.toLong, "doc_id", "text", nd)
          k.count(); k
        }
        val withTok = kept.select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        val admitted = t(s"rep${rep}_b${b}_budget") {
          val a = graft.streaming.BudgetGate.acceptBatch(
            withTok, b.toLong, "lang", "doc_id", "n_tokens", bud, 5000L)
          a.count(); a
        }
        t(s"rep${rep}_b${b}_land") {
          admitted
            .withColumn("split",
              when(TextAnalysis.splitBucket(col("doc_id")) < 90, "train")
                .otherwise("valid"))
            .write.mode("overwrite").parquet(s"$acc/batch_id=$b")
        }
        graft.operators.Materialize.releaseHard(gated)
      }
      System.gc()
    }
    spark.stop()
    sys.exit(0)
  }
}
