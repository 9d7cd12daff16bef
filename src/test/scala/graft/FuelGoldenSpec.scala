package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.fuel.{FuelCleaning, FuelQueries}

/** Golden end-to-end replay (SURVEY.md §5): the reference's own
  * warehouse snapshot (`FuelAnalysis.db`, 1,597 stations / 1,673
  * prices) exported to JSONL, replayed through cleaning and the
  * standing queries, compared against pandas-computed goldens that
  * mimic `DataAnalysis.py` exactly.
  */
class FuelGoldenSpec extends SparkSpecBase {

  private lazy val prices: DataFrame =
    FuelCleaning.cleanPrices(
      spark.read.json(resource("/fuel/prices.jsonl"))).valid.cache()

  private lazy val stations: DataFrame =
    FuelCleaning.cleanStations(
      spark.read.json(resource("/fuel/stations.jsonl"))).valid.cache()

  test("replay corpus survives cleaning intact (golden data is clean)") {
    assert(prices.count() === 1673L)
    assert(stations.count() === 1597L)
  }

  test("Q-bar matches the pandas golden (8 fuel types, 2dp means)") {
    val got = FuelQueries.qBar(prices).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = spark.read.json(resource("/fuel/golden_qbar.json")).collect()
      .map(r => r.getAs[String]("fueltype") -> r.getAs[Double]("avg_price")).toMap
    assert(got.keySet === want.keySet)
    for ((ft, avg) <- want)
      assert(math.abs(got(ft) - avg) < 1e-9, s"fueltype=$ft got=${got(ft)} want=$avg")
  }

  test("Q-map matches the pandas golden (1,597 stations, orphan prices dropped)") {
    val key = (df: DataFrame) => df.withColumn("k",
      concat_ws("|", col("name"), col("brand"), col("address"),
        format_number(col("location_latitude"), 6),
        format_number(col("location_longitude"), 6)))
    val got = key(FuelQueries.qMap(stations, prices))
      .select("k", "fuelinfo_agg").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val want = key(spark.read.json(resource("/fuel/golden_qmap.json")))
      .select("k", "fuelinfo_agg").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size === 1597)
    assert(got.keySet === want.keySet)
    val diffs = want.collect { case (k, v) if got(k) != v => (k, got(k), v) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).mkString("; ")}")
  }

  test("Q-map left-join orientation: station-less prices drop, price-less stations survive") {
    val qmap = FuelQueries.qMap(stations, prices)
    // 879/1,673 price rows are orphans (BASELINE.md) — they must not
    // create extra output rows.
    assert(qmap.count() === 1597L)
    // Stations with no prices at all keep an empty fuelinfo.
    assert(qmap.filter(col("fuelinfo_agg") === "").count() > 0)
  }

  test("Q-line is the full ordered series") {
    val line = FuelQueries.qLine(prices)
    assert(line.count() === 1673L)
    assert(line.columns.toSeq === Seq("fueltype", "lastupdated", "price"))
  }
}
