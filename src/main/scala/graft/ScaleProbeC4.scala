package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** C4 line-clean worst case at 5M docs (round-19 verdict task 5's
  * second question): the dupes-corpus c4 number (2.0–2.9 s at 5M) is
  * biased — that corpus has NO sentence-like lines, so the per-line
  * predicate short-circuits at the terminal-punctuation regex and
  * the `split`/`contains` legs never run. This main builds a
  * survive-ALL-lines corpus (10 sentence-shaped lines per doc,
  * deterministic) and times the same chain there — the honest upper
  * bound that decides whether [[TextAnalysis.c4CleanLines]] deserves
  * the QualityCountsExpr fuse treatment.
  *
  * `runMain graft.ScaleProbeC4 [nDocs]` (default 5M).
  */
object ScaleProbeC4 {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val spark = GraftSession.get()
    val line = "the quick brown fox jumps over the lazy dog near the river bank."
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws("\n", (0 until 10).map(i =>
        concat(lit(s"line $i "), col("id") % 97, lit(" " + line))): _*)
        .as("text"))
    val dir = "/tmp/graft_c4corpus"
    if (!new java.io.File(s"$dir/_SUCCESS").exists)
      docs.write.mode("overwrite").parquet(dir)
    val dd = spark.read.parquet(dir)
    println(s"[probe] c4 corpus rows=${dd.count()}")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val agg = dd.select(col("doc_id"),
          TextAnalysis.c4CleanLines(col("text")).as("c"))
        .select(sum(TextAnalysis.c4DocPass(col("c"))).as("p"),
          sum(length(col("c"))).as("len"))
        .collect()(0)
      println(f"[probe] c4_survive_rep$rep n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"pass=${agg.getLong(0)} chars=${agg.getLong(1)}")
      System.gc()
    }
    spark.stop()
    sys.exit(0)
  }
}
