package graft

import org.apache.spark.sql.functions._

/** Hot-block stress probe for
  * [[graft.operators.Similarity.cosineNearDupPairsAuto]] — the
  * committed form of the round-12 ad-hoc harness (BASELINE.md
  * evidence lives here now so the numbers are re-runnable):
  *
  *  - `ring`: a SINGLE caller block of ring-distributed 16-dim unit
  *    vectors with planted exact-duplicate pairs (ids 2k / 2k+1 share
  *    an angle) — the quantizer-sub-blocking path; the strict
  *    operator refuses this shape outright past 65,536 rows.
  *  - `ident`: n IDENTICAL vectors — the degenerate block no
  *    similarity quantizer can split, driving the TERMINAL hash-split
  *    + hub-star bridge (the round-13 empty-bucket fix), and the
  *    probe ASSERTS the duplicate group survives as ONE connected
  *    component covering every id.
  *
  * Usage: `runMain graft.ScaleProbeEmbed <n> <ring|ident> [maxBlockSize]`
  */
object ScaleProbeEmbed {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val mode = args(1)
    val cap = if (args.length > 2) args(2).toLong else 1L << 16
    val spark = GraftSession.get()
    val zeros = (0 until 14).map(_ => lit(0.0f))
    val vec = mode match {
      case "ring" =>
        // pair 2k/2k+1 shares angle k — planted exact dups on a ring
        val a = (col("vec_id") / 2).cast("long").cast("double") *
          lit(2.0 * math.Pi) / lit((n / 2).toDouble)
        array((cos(a).cast("float") +: sin(a).cast("float") +: zeros): _*)
      case "ident" =>
        array((lit(0.6f) +: lit(0.8f) +: zeros): _*)
      case other => sys.error(s"unknown mode '$other' (ring|ident)")
    }
    val vecs = spark.range(n).select(
      col("id").as("vec_id"), vec.as("embedding"), lit(0).as("label"))
    val t0 = System.nanoTime()
    val pairs = graft.operators.Similarity.cosineNearDupPairsAuto(
      vecs, "vec_id", "embedding", col("label"), threshold = 0.99,
      maxBlockSize = cap)
    val nPairs = pairs.count()
    println(f"[probe] mode=$mode n=$n cap=$cap pairs=$nPairs " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (mode == "ident") {
      val t1 = System.nanoTime()
      val comp = graft.operators.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      val nComp = comp.select("component").distinct().count()
      val covered = comp.count()
      println(f"[probe] cc components=$nComp covered=$covered " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s")
      require(nComp == 1L && covered == n.toLong,
        s"hub-star bridge lost connectivity: $nComp components, $covered/$n ids")
      println("[probe] connectivity OK: one component covering every id")
    }
    spark.stop()
  }
}
