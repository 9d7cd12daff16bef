package graft.fuel

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The reference's three standing queries (SURVEY.md §3), over cleaned
  * `prices` / `stations` frames.
  *
  * At scale: `stations` is a small dimension (1,597 rows in the golden
  * snapshot; bounded by physical reality) → broadcast; the
  * latest-per-group collapse happens *before* the join so the join
  * input is bounded by |stations|×|fueltypes| regardless of stream
  * length.
  */
object FuelQueries {

  /** Q-bar (`DataAnalysis.py:67-88`): mean price per fuel type over
    * the entire stream history, 2 dp. Deliberately NOT deduplicated —
    * the reference averages every message ever received (SURVEY §3
    * entry 2).
    */
  def qBar(prices: DataFrame): DataFrame =
    prices.groupBy("fueltype")
      .agg(round(avg("price"), 2).as("avg_price"))

  /** Latest price per (stationcode, fueltype) — SURVEY §2 A3, ties
    * broken by ingest sequence (pandas input order equivalent).
    */
  def latestPrices(prices: DataFrame): DataFrame =
    Relational.latestPerGroup(
      prices,
      groupCols = Seq("stationcode", "fueltype"),
      orderCols = Seq("lastupdated", "seq"),
      payloadCols = Seq("price", "lastupdated"))

  /** Q-map (`DataAnalysis.py:91-138`) — the flagship: latest prices,
    * broadcast left join onto stations (station side preserved;
    * orphan prices drop — SURVEY §7 hard part 6), conditional
    * `fuelinfo` projection, per-station sorted `<br>` aggregation.
    */
  def qMap(stations: DataFrame, prices: DataFrame): DataFrame = {
    val latest = latestPrices(prices)
    val joined = stations.join(
      broadcast(latest),
      stations("code").cast("long") === latest("stationcode").cast("long"),
      "left_outer")
    val fuelinfo = when(col("price").isNotNull,
        concat(col("fueltype"), lit(": "), col("price").cast("string")))
      .otherwise(lit(""))
    joined
      .withColumn("fuelinfo", fuelinfo)
      .groupBy("name", "brand", "address", "location_latitude", "location_longitude")
      .agg(concat_ws("<br>", sort_array(collect_list(col("fuelinfo")))).as("fuelinfo_agg"))
  }

  /** Q-line (`DataAnalysis.py:142-165`): full per-fueltype time
    * series, ordered — the grouping is presentational (SURVEY §2 A5).
    */
  def qLine(prices: DataFrame): DataFrame =
    prices.select("fueltype", "lastupdated", "price")
      .orderBy("fueltype", "lastupdated")
}
