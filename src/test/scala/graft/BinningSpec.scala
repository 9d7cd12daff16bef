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

  test("winsorize: clamps into the per-group quantile range, interior untouched") {
    val df = ((1 to 99).map(i => ("a", i.toDouble)) :+ (("a", 100000.0)))
      .toDF("g", "v")
    val got = Binning.winsorize(df, Seq("g"), "v", loQ = 0.05, hiQ = 0.95)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val hi = got(100000.0)
    assert(hi < 100.0 && hi >= 95.0)     // outlier capped near p95
    assert(got(50.0) === 50.0)           // interior value untouched
    assert(got.values.min >= got(1.0))   // low side clamped too
    assert(got(1.0) > 1.0)
  }

  test("winsorize: groups cap independently") {
    val df = ((1 to 20).map(i => ("lo", i.toDouble)) ++
      (1 to 20).map(i => ("hi", i * 1000.0))).toDF("g", "v")
    val got = Binning.winsorize(df, Seq("g"), "v", 0.1, 0.9)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val loMax = got.filter(_._1 == "lo").map(_._2).max
    val hiMax = got.filter(_._1 == "hi").map(_._2).max
    assert(loMax <= 20.0 && hiMax > 17000.0) // each group's own p90
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
