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
      val gated = Materialize(TextAnalysis.qualityKeep(dd, "text"))
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
    // round-19 stage_gate decomposition (r18 verdict task 5): where
    // do the seconds live once the gate scan is fused? (a) the bare
    // map-only gate aggregate; (b) gate + keeper semi-join, noop-
    // written (no cut); (c) is gate_rep above (gate + semi-join +
    // Materialize cut). (b)−(a) prices the join, (c)−(b) the cut.
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val p = TextAnalysis.qualityGate(dd, "doc_id", "text")
        .agg(sum(col("pass"))).collect()(0).getLong(0)
      println(f"[probe] gatescan_rep$rep n=$nDocs ${(System.nanoTime() - t0) / 1e9}%.2f s pass=$p")
      System.gc()
    }
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val pass = TextAnalysis.qualityGate(dd, "doc_id", "text")
        .filter(col("pass") === 1).select("doc_id")
      dd.join(pass, Seq("doc_id"), "left_semi")
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] gatejoin_rep$rep n=$nDocs ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
    }
    // r19: the map-only keep WITHOUT the cut — (keep_noop − scan)
    // prices carrying text through the filter; (gate_rep − keep_noop)
    // prices the localCheckpoint cut itself
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      TextAnalysis.qualityKeep(dd, "text")
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] gatekeep_noop_rep$rep n=$nDocs ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
    }
    // round-19: the C4 line-clean chain at scale (never probed) —
    // the per-line HOF filter (regex + split + contains) is
    // CodegenFallback per ELEMENT; this measures whether it deserves
    // the QualityCountsExpr fuse treatment
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val cleaned = dd.select(col("doc_id"),
        TextAnalysis.c4CleanLines(col("text")).as("c"))
      val agg = cleaned.select(
          sum(TextAnalysis.c4DocPass(col("c"))).as("p"),
          sum(length(col("c"))).as("len"))
        .collect()(0)
      println(f"[probe] c4_rep$rep n=$nDocs ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"pass=${agg.getLong(0)} chars=${agg.getLong(1)}")
      System.gc()
    }
    spark.stop()
    sys.exit(0)
  }
}
