package graft

import org.apache.spark.sql.functions._

import graft.operators.{Materialize, TextAnalysis}

/** Focused gate-stage probe (round 18): times EXACTLY
  * [[ScaleProbeDedup]]'s `stage_gate` block — Gopher quality gate +
  * keeper semi-join + Materialize cut — so the fused
  * [[graft.functions.QualityCountsExpr]] scan A/Bs against the
  * round-18 composed-form baseline (235/279/292 s across 3 JVMs on
  * the 5M/1000-way corpus) without paying the full chain first.
  * Two in-JVM reps: rep 1 charges the cold corpus read, rep 2 is the
  * warm number. Same protocol env as the dedup probe.
  *
  * `runMain graft.ScaleProbeGate <corpusDir>`
  */
object ScaleProbeGate {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count() // sponge
    val dd = docs.select(col("doc_id"), col("text"))
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val gated = {
        val pass = TextAnalysis.qualityGate(dd, "doc_id", "text")
          .filter(col("pass") === 1).select("doc_id")
        Materialize(dd.join(pass, Seq("doc_id"), "left_semi"))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] gate_rep$rep n=$nDocs $dt%.2f s rows=${gated.count()}")
      Materialize.releaseHard(gated)
      System.gc()
    }
    // round-18 fused repetition suite (map-only after the fuse)
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val agg = TextAnalysis.repetitionSignals(dd, "doc_id", "text")
        .agg(sum(col("pass")).as("p"), sum(col("dup_line_ppm")).as("d"))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] repsig_rep$rep n=$nDocs $dt%.2f s " +
        s"pass=${agg.getLong(0)} dups=${agg.getLong(1)}")
      System.gc()
    }
    spark.stop()
    sys.exit(0)
  }
}
