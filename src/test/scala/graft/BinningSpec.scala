package graft

import org.apache.spark.sql.functions._

import graft.operators.Binning

/** Equi-depth binning: known quartiles, bin-edge semantics, equal
  * depths on uniform data, approx-path agreement.
  */
class BinningSpec extends SparkSpecBase {

  import spark.implicits._

  private val uniform = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")

  test("quartile boundaries and left-open/right-closed bin edges") {
    val b = Binning.quantileBoundaries(uniform, Seq("g"), "v", nBins = 4)
      .collect().head.getSeq[Double](1)
    assert(b === Seq(25.75, 50.5, 75.25)) // linear interpolation over 1..100
    val bins = Binning.equiDepthBins(uniform, Seq("g"), "v", nBins = 4)
      .select("v", "bin").collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(bins(25.0) === 0)
    assert(bins(26.0) === 1) // just above the rounded first boundary
    assert(bins(50.0) === 1)
    assert(bins(51.0) === 2)
    assert(bins(100.0) === 3)
  }

  test("uniform data lands in (near-)equal depths; bins span 0..n-1") {
    val depths = Binning.equiDepthBins(uniform, Seq("g"), "v", nBins = 4)
      .groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(depths.keySet === Set(0, 1, 2, 3))
    assert(depths.values.forall(n => n >= 24 && n <= 26), depths.toString)
  }

  test("per-group boundaries are independent") {
    val two = ((1 to 10).map(i => ("lo", i.toDouble)) ++
      (1 to 10).map(i => ("hi", i * 1000.0))).toDF("g", "v")
    val bins = Binning.equiDepthBins(two, Seq("g"), "v", nBins = 2)
      .groupBy("g", "bin").count().collect()
    // each group splits around ITS OWN median — 5/5 per group
    assert(bins.length === 4 && bins.forall(_.getLong(2) === 5L))
  }

  test("approx boundaries reproduce exact bins at full accuracy on small data") {
    val exact = Binning.equiDepthBins(uniform, Seq("g"), "v", 4)
      .select("v", "bin")
    val approx = Binning.withBins(uniform, Seq("g"), "v",
      Binning.approxQuantileBoundaries(uniform, Seq("g"), "v", 4))
      .select("v", "bin")
    val diff = exact.exceptAll(approx).count() + approx.exceptAll(exact).count()
    // KLL-ish sketch at default accuracy is exact for 100 points
    assert(diff === 0L)
  }
}
