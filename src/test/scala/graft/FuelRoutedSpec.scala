package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.fuel.{FuelModel, FuelPipeline}
import graft.sources.Warehouse

/** S10 content-based router (reference `DataIngesting.py:55-64`): one
  * consumer on one MIXED cleaned topic, each record dispatched by key
  * presence. Covers the set-oriented [[Warehouse.route]] split, the
  * single-query streaming drive ([[FuelPipeline.startRouted]]) with
  * both halves landing in the warehouse, and the two dead-letter
  * paths (unparseable JSON; parseable-but-unroutable records).
  */
class FuelRoutedSpec extends SparkSpecBase {

  import spark.implicits._

  private def mixedFrame = {
    val station = Seq(("1", "10", "BrandA", "S1", "Alpha", "1 Main St",
      "-33.8", "151.2"))
      .toDF("brandid", "stationid", "brand", "code", "name", "address",
        "location_latitude", "location_longitude")
    val price = Seq(("S1", "E10", "189.9", "15/08/2026 10:00:00", 7L))
      .toDF("stationcode", "fueltype", "price", "lastupdated", "seq")
    val stationCols = station.columns.map(col)
    val priceCols = price.columns.map(col)
    val nullOf = (c: String) => lit(null).cast("string").as(c)
    station.select(stationCols ++ price.columns.map(nullOf): _*)
      .unionByName(price.select(station.columns.map(nullOf) ++ priceCols: _*)
        .withColumn("seq", col("seq").cast("long")), allowMissingColumns = true)
  }

  test("route: 3-way split by key presence — station, price, unroutable") {
    val mixed = mixedFrame.unionByName(
      mixedFrame.limit(1).select(mixedFrame.columns.map(c =>
        lit(null).cast("string").as(c)): _*).withColumn("seq", lit(null).cast("long")))
    val (stations, prices, unroutable) = Warehouse.route(mixed)
    assert(stations.count() === 1L && stations.head.getAs[String]("code") === "S1")
    assert(prices.count() === 1L && prices.head.getAs[String]("stationcode") === "S1")
    assert(unroutable.count() === 1L, "neither key -> dead letters, not the floor")
  }

  test("startRouted E2E: one mixed topic lands both halves + both dead-letter kinds") {
    val dir = Files.createTempDirectory("graft_routed_topic")
    val wh = Files.createTempDirectory("graft_routed_wh").toString
    val lines = Seq(
      // two stations, two prices, one unroutable, one unparseable
      """{"brandid":"1","stationid":"10","brand":"BrandA","code":"S1","name":"Alpha","address":"1 Main St","location_latitude":"-33.8","location_longitude":"151.2"}""",
      """{"brandid":"2","stationid":"20","brand":"BrandB","code":"S2","name":"Beta","address":"2 High St","location_latitude":"-33.9","location_longitude":"151.1"}""",
      """{"stationcode":"S1","fueltype":"E10","price":"189.9","lastupdated":"15/08/2026 10:00:00","seq":1}""",
      """{"stationcode":"S2","fueltype":"P95","price":"201.5","lastupdated":"15/08/2026 10:05:00","seq":2}""",
      """{"comment":"no routing key at all"}""",
      """{"stationcode": not-json""")
    Files.write(dir.resolve("batch0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val q = FuelPipeline.startRouted(spark, dir.toString, wh)
    try q.processAllAvailable() finally q.stop()

    val stations = spark.read.parquet(s"$wh/stations")
    assert(stations.select("code").as[String].collect().sorted.toSeq
      === Seq("S1", "S2"))
    assert(stations.columns.contains("id"), "surrogate-id discipline kept")
    assert(!stations.columns.contains("price"),
      "station half drops the price fields")

    val prices = spark.read.parquet(s"$wh/prices")
    assert(prices.select("stationcode", "fueltype").as[(String, String)]
      .collect().sorted.toSeq === Seq(("S1", "E10"), ("S2", "P95")))
    assert(!prices.columns.contains("code"),
      "price half drops the station fields")

    val unroutable = spark.read.parquet(s"$wh/dead_letters")
    assert(unroutable.count() === 1L)
    assert(unroutable.head.getAs[String]("_reject_reason") === "no routing key")

    val unparseable = spark.read.parquet(s"$wh/dead_letters_raw")
    assert(unparseable.count() === 1L)
    assert(unparseable.head.getAs[String]("raw").contains("not-json"),
      "the corrupt original survives in the dead letter")
  }

  test("startRouted is exactly-once across restarts: a second drive adds nothing, a new file appends") {
    val dir = Files.createTempDirectory("graft_routed_topic2")
    val wh = Files.createTempDirectory("graft_routed_wh2").toString
    Files.write(dir.resolve("b0.jsonl"),
      """{"stationcode":"S9","fueltype":"E10","price":"150.0","lastupdated":"15/08/2026 11:00:00","seq":3}"""
        .getBytes(StandardCharsets.UTF_8))
    val q1 = FuelPipeline.startRouted(spark, dir.toString, wh)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(s"$wh/prices").count() === 1L)
    // restart over the same checkpoint: the already-committed file
    // must not re-land (St1 high-water-mark, engine-managed)
    val q2 = FuelPipeline.startRouted(spark, dir.toString, wh)
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(s"$wh/prices").count() === 1L)
      Files.write(dir.resolve("b1.jsonl"),
        """{"stationcode":"S9","fueltype":"P95","price":"199.0","lastupdated":"15/08/2026 11:10:00","seq":4}"""
          .getBytes(StandardCharsets.UTF_8))
      q2.processAllAvailable()
      assert(spark.read.parquet(s"$wh/prices").count() === 2L)
    } finally q2.stop()
  }
}
