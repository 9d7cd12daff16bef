package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}

/** The composed curation pipeline: hand-planted stage interactions
  * plus corpus-level stage properties — each output row must have
  * passed the gate, survived dedup as its component keeper, fit the
  * language budget, and carry a hash-consistent split.
  */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog tonight again"
  private val baseB = "distributed query engines shuffle data between stages for joins always"

  test("curate: gate failure, near-dup collapse, and split compose on planted docs") {
    val docs = Seq(
      (1L, baseA, "en"),
      (2L, baseA.replace("tonight", "today"), "en"), // near-dup of 1
      (3L, baseB + " for it", "de"),
      (4L, "x", "en"))                               // fails the length rule
      .toDF("doc_id", "text", "lang")
    val out = Curation.curate(docs, "doc_id", "text", "lang",
      budgetPerLang = 5000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
    // doc 4 gated out; doc 2 deduped (keeper = min id 1); 1 and 3 kept
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L)._1 === "en" && out(3L)._1 === "de")
    assert(out(1L)._2 === 11L) // tokenCount(baseA)
    // split is the id-hash bucket rule, reproducible from the id alone
    out.foreach { case (id, (_, _, split)) =>
      val bucket = ((id % 2147483647L) * 2654435761L % 2147483647L) % 100
      assert(split === (if (bucket < 90) "train" else "valid"), s"doc $id")
    }
  }

  test("curate: stage properties hold on the sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Curation.curate(docs, "doc_id", "text", "lang",
      budgetPerLang = 2000L)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val ids = rows.map(_._1).toSet
    // every survivor passed the gate
    val passed = TextAnalysis.qualityGate(docs, "doc_id", "text")
      .filter(col("pass") === 1).select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(passed))
    // no near-dup candidate pair (among gated docs) survives intact
    val gated = docs.join(passed.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
    Dedup.minhashCandidates(gated, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(!(ids.contains(a) && ids.contains(b)), s"pair ($a,$b) survived")
      }
    // per-language token mass respects the budget up to one doc's overshoot
    rows.groupBy(_._2).foreach { case (lang, g) =>
      val total = g.map(_._3).sum
      val maxDoc = g.map(_._3).max
      assert(total - maxDoc < 2000L,
        s"$lang: $total tokens with max doc $maxDoc exceeds the budget bound")
    }
    // both split sides populated at corpus size, and no third value
    assert(rows.map(_._4).toSet === Set("train", "valid"))
  }
}
