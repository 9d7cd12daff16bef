package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materialize}

/** Pair-stage shuffle-key A/B (round-19 verdict task 7): does packing
  * the `(band INT, bucket LONG)` equi-join key into ONE BIGINT —
  * band in the top 4 bits, bucket right-shifted into the low 60 —
  * buy a slice of the candidate stage? The packed key is NOT
  * injective (it drops 4 bucket bits), so it is measured here as a
  * PROBE-ONLY variant: adoption requires the pair count bit-stable
  * AND a measured win (the banding is already hash-bucketed, so the
  * packing only raises the existing 2⁻⁶⁴-scale collision odds to
  * 2⁻⁶⁰-scale — but the library form stays injective unless the win
  * justifies the documented odds).
  *
  * Both forms run the full star candidate stage (hub aggregate with
  * singleton drop → member↔hub join → pair distinct → est-Jaccard
  * verify against the compact cut) over the SAME materialized
  * `(doc_id, sig)` cut, so the A/B isolates the join-key shape.
  *
  * `runMain graft.ScaleProbePairKey <corpusDir>` — the
  * 5M/1000-way protocol env (32g/32cpus, ≥2 fresh JVMs).
  */
object ScaleProbePairKey {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count() // sponge
    val dd = docs.select(col("doc_id"), col("text"))

    val cut = Materialize(Dedup.compactSigsPlan(dd, "doc_id", "text"))
    println(s"[probe] sigs cut rows=${cut.count()} n=$nDocs")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
      r
    }

    val bands = 16; val rows = 4
    (1 to 2).foreach { rep =>
      // A: the library form — two-column (band, bucket) key
      val a = time(s"pairs_twocol_rep$rep") {
        val p = Materialize(
          Dedup.starCandidatesFromCompact(cut, bands, rows, 64, 0.5))
        val n = p.count(); Materialize.releaseHard(p); n
      }
      println(s"[probe] pairs_twocol_rep${rep}_n=$a")
      // B: packed single-long key (band << 60 | bucket >>> 4)
      val b = time(s"pairs_packed_rep$rep") {
        val slim = cut
          .select(col("doc_id"),
            explode(Dedup.lshBands(col("sig"), bands, rows)).as("__b"))
          .select(col("doc_id"),
            shiftleft(col("__b.band").cast("long"), 60)
              .bitwiseOR(shiftrightunsigned(col("__b.bucket"), 4))
              .as("bb"))
        val hubs = slim.groupBy(col("bb"))
          .agg(min(col("doc_id")).as("hub_id"), count(lit(1)).as("__c"))
          .filter(col("__c") > 1).drop("__c")
        val pairs = slim.join(hubs, Seq("bb"))
          .filter(col("doc_id") =!= col("hub_id"))
          .select(col("hub_id").as("id_a"), col("doc_id").as("id_b"))
          .distinct()
        val p = Materialize(Dedup.verifyPairsCompact(pairs, cut, 64, 0.5))
        val n = p.count(); Materialize.releaseHard(p); n
      }
      println(s"[probe] pairs_packed_rep${rep}_n=$b" +
        (if (a == b) " (bit-stable vs twocol)" else s" DIVERGED from $a"))
    }
    spark.stop()
    sys.exit(0)
  }
}
