package graft

import org.apache.spark.sql.functions._

/** Deterministic corpus amplifier for the one-off scale-stress bench
  * (round-8 verdict task 5): writes an N× `documents` / `embeddings` /
  * `events` corpus (TPC-H tables copied through unchanged) so the
  * headline bench can be re-run at a scale point above sf0.1 and
  * per-query scaling exponents recorded in BASELINE.md.
  *
  * Amplification must preserve each table's STATISTICAL SHAPE, not
  * just its row count — a naive 10× text copy would make every doc a
  * 10-way exact duplicate and blow the near-dup candidate count up
  * quadratically (100×), measuring a different workload entirely:
  *
  *  - documents: copy `c` prefixes every whitespace token with `c<c>_`
  *    — injective per copy, so within-copy near-dup structure (the
  *    planted pairs, the natural collision rate) is preserved exactly
  *    while NO cross-copy near-dups appear; the duplicate rate scales
  *    linearly like a real 10× crawl. `n_chars` is recomputed for the
  *    rewritten text.
  *  - embeddings: copy `c` rotates each vector left by `c` positions —
  *    norms (and so cosine magnitudes) preserved, but rotated copies
  *    are not mutual nearest neighbors, keeping the kNN topology
  *    realistic rather than 10-way-twinned.
  *  - events: ids and users shift per copy (more sessions, not longer
  *    ones — how real traffic grows); `ts` passes through as raw
  *    nanos (the session reads TIMESTAMP(NANOS) as long, and
  *    `Tables.events` div-1000s either representation).
  *
  * Usage: `runMain graft.ScaleGen [srcDir] [dstDir] [copies] [mode]`.
  * `mode = docs` amplifies ONLY `documents` (embeddings/events copy
  * through at source scale) — the round-9-verdict 100× documents
  * probe for the dedup/curation chain, where a 100× embeddings
  * rotation is impossible anyway (rotation distance would exceed the
  * 64-dim vector).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "all"
    val docsOnly = mode == "docs" || mode == "dupes"
    val spark = GraftSession.get()

    // `dupes` mode (round 12): copies keep the text VERBATIM — the
    // dup-heavy crawl shape, where every doc has `copies − 1` exact
    // twins. The opposite trade to the default injective prefixing:
    // quality rules see natural tokens (the prefix rewrite defeats
    // the stopword-ratio rule wholesale) and the near-dup/CC chain
    // gets its worst case — copy-sized duplicate cliques whose edge
    // count exceeds the CC driver cap, forcing the distributed
    // pointer-jumping loop.
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until copies).map { c =>
      docs.select(
        (col("doc_id") + lit(c * maxDoc)).as("doc_id"),
        (if (mode == "dupes") col("text")
         else concat_ws(" ",
          transform(graft.operators.TextAnalysis.tokens(col("text")),
            t => concat(lit(s"c${c}_"), t)))).as("text"),
        col("lang"), col("source"))
    }.reduce(_ union _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    if (docsOnly)
      emb.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    else {
      val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1
      (0 until copies).map { c =>
        emb.select(
          (col("vec_id") + lit(c * maxVec)).as("vec_id"),
          concat(slice(col("embedding"), lit(c + 1), size(col("embedding")) - c),
            slice(col("embedding"), lit(1), lit(c))).as("embedding"),
          col("label"))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    }

    val ev = spark.read.parquet(s"$src/events.parquet")
    if (docsOnly)
      ev.write.mode("overwrite").parquet(s"$dst/events.parquet")
    else {
      val maxEvent = ev.agg(max("event_id")).head.getLong(0) + 1
      val maxUser = ev.agg(max("user_id")).head.getLong(0) + 1
      (0 until copies).map { c =>
        ev.select(
          (col("event_id") + lit(c * maxEvent)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(c * maxUser)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
    }

    // TPC-H tables pass through at the source SF (their headline
    // queries serve as the flat control group in the exponent table).
    val passThrough = Seq("region", "nation", "customer", "supplier",
      "part", "partsupp", "orders", "lineitem")
    passThrough.foreach { t =>
      val p = new java.io.File(s"$src/$t.parquet")
      if (p.exists())
        spark.read.parquet(p.toString)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"[scalegen] wrote ${copies}x documents/embeddings/events to $dst")
    spark.stop()
  }
}
