package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materialize, TextAnalysis}

/** Next-decade dup-heavy dedup probe (round-16 verdict task 6): the
  * 153k → 1.5M curate-family exponent was ~+0.65–0.9 (BASELINE.md
  * round 15); this main measures the NEXT point — 5M docs with
  * 1000-way verbatim cliques (`ScaleGen dupes` of sf0.1 × 1000) — and
  * splits the chain per STAGE so the growth attributes to a specific
  * stage instead of the composition:
  *
  *  - `gate`   — quality gate + keeper semi-join (Materialize cut);
  *  - `sigs`   — compact minhash signatures + the F2-probed cut +
  *               star decision ([[Dedup.sigsWithStarDecisionCompact]]);
  *  - `pairs`  — candidate generation + est-Jaccard verification
  *               (star or all-pairs, whatever the probe decided);
  *  - `cc`     — connected components over the verified pairs;
  *  - `land`   — keeper anti-join + parquet write of the kept corpus.
  *
  * Each stage consumes the PREVIOUS stage's Materialize cut, so the
  * per-stage numbers sum to (approximately) the composed chain, which
  * is also timed whole (`dedup_docs_full`, warm min-of-2 in-JVM). The
  * `extract` stage of the crawl flagships is deliberately absent: it
  * is map-only parse+strip measured at +0.31/decade through 5M in the
  * round-14 BASELINE entry, and re-muxing a 5M-doc archive would
  * measure the fixture writer, not the engine.
  *
  * Protocol (BASELINE.md probe rules): `SPARK_GRAFT_CPUS=32
  * SPARK_DRIVER_MEM=32g`, a cheap sponge pass charges JVM+session
  * startup, warm mins taken across ≥3 fresh JVMs by the caller.
  *
  * `runMain graft.ScaleProbeDedup <corpusDir>` — expects
  * `<corpusDir>/documents.parquet` (a `ScaleGen` output dir).
  */
object ScaleProbeDedup {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count() // sponge: JVM + session + footer read

    def time[A](tag: String, reps: Int = 1)(f: => A): A = {
      var last: Option[A] = None
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = Some(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag n=$nDocs min=${ts.min}%.2f s" +
        (if (reps > 1) s" (of ${ts.map(t => f"$t%.2f").mkString(", ")})" else ""))
      System.gc()
      last.get
    }

    // the composed chain, whole (the headline number; one pass per
    // JVM — the protocol's min is across fresh JVMs, and a second
    // in-JVM rep measured SLOWER at 5M: superseded localCheckpoint
    // blocks from rep 1 pressure rep 2's heap)
    time("dedup_docs_full") {
      Dedup.dropNearDuplicates(docs, "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
        .write.format("noop").mode("overwrite").save()
    }

    val dd = docs.select(col("doc_id"), col("text"))

    /** The sigs → pairs → cc → land stage protocol, run once per
      * input frame so the ungated (q_dedup_docs) and gated (curate
      * shape) splits can never diverge in what they measure.
      */
    def runStages(input: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val (cut, star) = time(s"${tag}_sigs") {
        Dedup.sigsWithStarDecisionCut(
          Dedup.compactSigsPlan(input, "doc_id", "text"),
          bands = 16, rows = 4, force = false,
          cap = Dedup.defaultAutoStarPairsCap)
      }
      println(s"[probe] ${tag}_star=$star")
      val pairs = time(s"${tag}_pairs") {
        Materialize(
          if (star) Dedup.starCandidatesFromCompact(cut, 16, 4, 64, 0.5)
          else Dedup.candidatesFromCompact(cut, 16, 4, 64, 0.5))
      }
      println(s"[probe] ${tag}_pairs_n=${pairs.count()}")
      val comp = time(s"${tag}_cc") {
        Materialize(Dedup.connectedComponents(pairs))
      }
      println(s"[probe] ${tag}_components_rows=${comp.count()}")
      time(s"${tag}_land") {
        val losers = comp.filter(col("id") =!= col("component")).select(col("id"))
        val out = graft.streaming.Scratch.tmpDir(s"probe_dedup_land_$tag")
        docs.join(losers, docs("doc_id") === losers("id"), "left_anti")
          .select("doc_id", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(out)
      }
      Materialize.release(pairs); Materialize.release(comp)
      System.gc()
    }

    // UNGATED: the q_dedup_docs decomposition (sigs/pairs over the
    // FULL dup-heavy corpus — 1000-way cliques)
    runStages(dd, "ungated")

    // GATED (curate-shaped): the flagship family's order — the gate
    // admits a fraction and everything downstream shrinks with it
    val gated = time("stage_gate") {
      // r19: map-only gate filter — the semi-join form shuffled the
      // full-text corpus to keep 8.6% (22 s of join for a 2.8 s scan)
      Materialize(TextAnalysis.qualityKeep(dd, "text"))
    }
    runStages(gated, "gated")

    spark.stop()
    sys.exit(0)
  }
}
