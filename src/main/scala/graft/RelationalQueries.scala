package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Det
import graft.operators.{Cdc, Relational}

/** The relational query surface mapped onto the testdata corpus.
  *
  * Each query re-expresses one operator row of SURVEY.md §2 (the
  * reference's fuel pipeline) against the TPC-H-ish tables: `events`
  * plays the `prices` stream (user_id ~ stationcode, event_type ~
  * fueltype, value ~ price, ts ~ lastupdated) and `customer` plays the
  * `stations` dimension. The fuel-domain modules under `graft.queries`
  * hold the same logic over the reference's own schema.
  */
object RelationalQueries {

  /** Money/measure columns are 2-dp decimals stored as doubles.
    * Aggregating them as doubles is partition-order-dependent (partial
    * sums associate differently run to run), so any rounded result
    * sits a ULP away from flipping at a .xx5 boundary. All sums here
    * go through exact decimal arithmetic — order-independent, and
    * bit-identical to the DuckDB oracle — then cast to double.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal mean rounded to `scale`: sum exactly, divide once,
    * then [[Det.round]] (Spark `round(double)` rounds the shortest
    * decimal repr; DuckDB rounds the value — they diverge at .xx5
    * boundaries).
    */
  private def decAvg(c: Column, scale: Int): Column =
    Det.round(sum(dec(c)).cast("double") / count(lit(1)), scale)

  /** SURVEY §2 A1 (`DataAnalysis.py:70-82`): running mean per group
    * over the whole stream history, rounded to 2 dp. Partial/final
    * hash aggregation — one shuffle of ≤|event_type| pre-aggregated
    * rows per map partition.
    */
  private def barAvg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(decAvg(col("value"), 2).as("avg_value"))

  /** SURVEY §2 A2 (`DataCleaning.py:23`): scalar max event time. */
  private def maxTs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).agg(max("ts").as("max_ts"))

  /** SURVEY §2 A3: latest row per (user, type) via single-shuffle
    * `max_by` (see [[Relational.latestPerGroup]]); ties broken by
    * event_id — the deterministic stand-in for pandas input order.
    */
  private def latestPerGroup(s: SparkSession, d: String): DataFrame =
    Relational.latestPerGroup(
      Tables.events(s, d),
      groupCols = Seq("user_id", "event_type"),
      orderCols = Seq("ts", "event_id"),
      payloadCols = Seq("event_id", "ts", "value"))

  /** SURVEY §2 St2 batch form: keyed first-wins dedup. */
  private def firstPerGroup(s: SparkSession, d: String): DataFrame =
    Relational.firstPerGroup(
      Tables.events(s, d),
      groupCols = Seq("user_id"),
      orderCols = Seq("ts", "event_id"),
      payloadCols = Seq("event_id", "event_type", "ts"))

  /** SURVEY §2 A4: grouped ordered string aggregation. */
  private def stringAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("info", concat(col("event_type"), lit(": "), col("value").cast("string")))
    Relational.groupedStringAgg(ev, Seq("user_id"), col("info"), "<br>", "infos")
  }

  /** The flagship query — SURVEY §3 entry point 1 ("Q-map",
    * `DataAnalysis.py:91-138`): latest-per-group, left outer join
    * onto the dimension, conditional string projection, grouped
    * ordered string agg. The aggregated `latest` side grows with
    * |users|×|types| — i.e. with the data — so it is NOT broadcast-
    * pinned: AQE broadcasts while it's small and falls back to a
    * shuffle join at scale. (Contrast `FuelQueries.qMap`, where the
    * dimension is physically bounded and the hint is pinned.)
    */
  def flagshipProfile(s: SparkSession, d: String): DataFrame = {
    val latest = Relational.latestPerGroup(
      Tables.events(s, d),
      groupCols = Seq("user_id", "event_type"),
      orderCols = Seq("ts", "event_id"),
      payloadCols = Seq("value"))
    val cust = Tables.customer(s, d)
    val info = when(col("value").isNotNull,
        concat(col("event_type"), lit(": "), col("value").cast("string")))
      .otherwise(lit(""))
    cust.join(latest, cust("c_custkey") === latest("user_id"), "left_outer")
      .withColumn("info", info)
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(concat_ws("<br>", sort_array(collect_list(col("info")))).as("events_info"))
  }

  /** SURVEY §2 St3: retention window anchored at observed max ts. */
  private def retention(s: SparkSession, d: String): DataFrame =
    Relational.retentionFilter(Tables.events(s, d), "ts", days = 7)
      .select("event_id", "user_id", "event_type", "value", "ts")

  /** SURVEY §2 St1 batch form: strictly-greater watermark gate. */
  private def watermark(s: SparkSession, d: String): DataFrame =
    Relational.watermarkGate(
        Tables.events(s, d), "ts", lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
      .select("event_id", "ts")

  /** SURVEY §2 P4/P10: conditional projection + default-fill shape. */
  private def conditionalProjection(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderstatus") === "O",
          concat_ws("/", col("o_orderstatus"), col("o_orderpriority")))
        .otherwise(col("o_orderstatus")).as("status_info"))

  /** SURVEY §2 P5/P6: zero-filter + casts, pushed into the scan. */
  private def zeroFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_discount") =!= 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_discount"), col("l_quantity").cast("int").as("qty_int"))

  /** SURVEY §2 P7/P8: the reference's dd/MM/yyyy HH:mm:ss timestamp
    * round-trip (`DataCleaning.py:71-79`) — format out, parse back.
    */
  private def tsRoundtrip(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      date_format(col("ts"), "dd/MM/yyyy HH:mm:ss").as("ts_str"),
      to_timestamp(date_format(col("ts"), "dd/MM/yyyy HH:mm:ss"), "dd/MM/yyyy HH:mm:ss")
        .cast("timestamp_ntz").as("ts_trunc"))

  /** SURVEY §2 O1 + top-k: TakeOrderedAndProject, no global sort. */
  private def topOrders(s: SparkSession, d: String): DataFrame =
    Relational.topK(Tables.orders(s, d), 10,
        col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_totalprice")

  /** TPC-H Q1 shape: wide partial/final aggregation over the fact
    * table with the filter pushed to the parquet scan.
    */
  private def discounted: Column =
    dec(col("l_extendedprice")) * (lit(1) - col("l_discount")).cast(DecimalType(4, 2))

  private def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        round(sum(discounted), 2).cast("double").as("sum_disc_price"),
        round(sum(discounted * (lit(1) + col("l_tax")).cast(DecimalType(4, 2))), 2)
          .cast("double").as("sum_charge"),
        decAvg(col("l_quantity"), 4).as("avg_qty"),
        decAvg(col("l_extendedprice"), 4).as("avg_price"),
        decAvg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape: selective dimension filter, two joins, grouped
    * revenue. Customer side is filtered then broadcast.
    */
  private def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(discounted), 2).cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  /** TPC-H Q5 shape: star join region→nation→customer→orders→lineitem
    * with the small dimension chain broadcast end-to-end.
    */
  private def regionRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(dims), ord("o_custkey") === dims("c_custkey"))
      .groupBy("r_name")
      .agg(round(sum(discounted), 2).cast("double").as("revenue"))
  }

  /** Set ops — EXCEPT: users who clicked but never purchased. */
  private def exceptUsers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "click").select("user_id").distinct()
      .except(ev.filter(col("event_type") === "purchase").select("user_id").distinct())
  }

  /** Set ops — INTERSECT: users who both signed up and purchased. */
  private def intersectUsers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "signup").select("user_id").distinct()
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id").distinct())
  }

  /** Window frame: per-user running sum in event-time order. */
  private def runningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      sum(dec(col("value"))).over(w).cast("double").as("running_value"))
  }

  /** Window analytic: lag delta per (user, type). */
  private def lagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      Det.round(col("value") - lag("value", 1).over(w), 2).as("delta"))
  }

  /** Distribution + navigation window functions in one pass:
    * quartile (`ntile`), `percent_rank`, `cume_dist` per event type
    * ordered by value, and `first_value` per user in event time.
    * Both orderings carry `event_id` as the unique tiebreak —
    * without it, ntile/first_value are partition-order-dependent and
    * no cross-engine check is possible. percent_rank/cume_dist are
    * single IEEE divisions of exact integers (same double in every
    * engine). One shuffle per distinct partitioning (two total).
    */
  private def windowRanks(s: SparkSession, d: String): DataFrame = {
    val byVal = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d).select(
      col("event_id"), col("event_type"), col("user_id"),
      ntile(4).over(byVal).as("quartile"),
      percent_rank().over(byVal).as("pct_rank"),
      cume_dist().over(byVal).as("cume"),
      first_value(col("value")).over(byTime).as("first_user_value"))
  }

  /** Interval join of events against an overlapping tier table
    * (12 tiers, stride 40, width 60 — most values match 1-2 tiers)
    * through [[Relational.rangeJoin]]'s bucketed equi-join, then a
    * per-tier rollup. Value sums go through DECIMAL (CLAUDE.md
    * invariant — `value` carries 2 dp so the cast is exact).
    */
  private def rangeJoinQ(s: SparkSession, d: String): DataFrame = {
    val tiers = s.range(0, 12).select(
      col("id").cast("int").as("tier_id"),
      (col("id") * 40.0).as("lo"),
      (col("id") * 40.0 + 60.0).as("hi"))
    Relational.rangeJoin(
        Tables.events(s, d).select(col("event_id"), col("value")), "value",
        tiers, "lo", "hi", bucketWidth = 50.0)
      .groupBy("tier_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Skew-salted two-phase aggregation (8 salt buckets): per-type
    * event counts and DECIMAL value sums through
    * [[Relational.saltedAgg]]. The oracle states the plain groupBy —
    * the operator's contract is result-identity; only the shuffle
    * layout changes under a hot key.
    */
  private def saltedAggQ(s: SparkSession, d: String): DataFrame =
    Relational.saltedAgg(
      Tables.events(s, d)
        .select(col("event_type"), col("value").cast("decimal(18,2)").as("v")),
      Seq("event_type"), buckets = 8,
      partial = struct(count(lit(1)).as("n"), sum(col("v")).as("sv")).as("p"),
      fin = struct(sum(col("p.n")).as("n"), sum(col("p.sv")).as("sv")).as("f"))
      .select(col("event_type"),
        col("f.n").as("n"),
        col("f.sv").cast("double").as("sum_value"))

  /** Skew-salted fact⋈dim join (8 salt buckets) rolled up per
    * market segment. The oracle states the UNSALTED join — what's
    * checked is exactly the operator's contract: salting never
    * changes results, only the shuffle layout under a hot key.
    */
  private def saltedJoinQ(s: SparkSession, d: String): DataFrame =
    Relational.saltedJoin(
        Tables.events(s, d).select(col("user_id"), col("value")),
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        "user_id", "c_custkey", buckets = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Anti join: customers with no events (dimension rows without
    * facts — the orphan-key semantics of SURVEY §6).
    */
  private def antiJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ev = Tables.events(s, d).select(col("user_id"))
    cust.join(ev, cust("c_custkey") === ev("user_id"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Semi join: customers with at least one event. */
  private def semiJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ev = Tables.events(s, d).select(col("user_id"))
    cust.join(ev, cust("c_custkey") === ev("user_id"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Bloom-prefiltered selective semi join
    * ([[graft.operators.BloomJoin]]): lineitems restricted to a
    * ~2%-selective part subset, then aggregated. The bloom probe drops
    * non-matching lineitems at the scan (before the join exchange);
    * the exact semi join removes bloom false positives, so the result
    * is identical to the plain `IN` subquery the oracle runs.
    */
  private def bloomSemiJoinQ(s: SparkSession, d: String): DataFrame =
    graft.operators.BloomJoin.semiJoin(
        Tables.lineitem(s, d), col("l_partkey"),
        Tables.part(s, d).filter(col("p_size") === 1), col("p_partkey"),
        expectedItems = 1 << 16)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))

  /** Z-order (Morton) key over two event dimensions
    * ([[graft.operators.Layout]]): the exact integer bit-interleave
    * the clustered-layout writer sorts by, oracle-checked bit-for-bit
    * (the DuckDB expression is generated from the same loop).
    */
  private def zorderKeyQ(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      graft.operators.Layout.interleaveBits(
        Seq(pmod(col("user_id"), lit(1024L)), pmod(col("event_id"), lit(1024L))),
        bits = 10).as("zkey"))

  /** End-to-end layout + zone-map path: events z-ordered on
    * (user_id, value) ([[graft.operators.Layout.zorderBy]]), a
    * manifest built over the files, then a 2-D range read through
    * file-level pruning ([[graft.sources.Manifest.prunedRead]]) and
    * aggregated. The oracle is the plain range filter — pruning must
    * be invisible in the result.
    */
  private def manifestPrunedQ(s: SparkSession, d: String): DataFrame = {
    val dir = graft.streaming.Scratch.tmpDir("graft_zlayout")
    graft.operators.Layout.zorderBy(
        Tables.events(s, d).select("event_id", "user_id", "event_type", "value"),
        Seq("user_id", "value"), numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val manifest = graft.sources.Manifest.build(s, dir, Seq("user_id", "value"))
    graft.sources.Manifest.prunedRead(s, manifest, Map(
        "user_id" -> (lit(100L), lit(200L)),
        "value" -> (lit(50.0), lit(100.0))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
  }

  /** File-level bloom skipping ([[graft.sources.Manifest
    * .prunedReadEq]]): events hash-partitioned by user into 16 files
    * — the layout where zone maps are USELESS (every file's
    * user_id min/max spans the domain) but per-file blooms admit
    * only the file(s) that can hold the probed user. Result is the
    * plain equality filter, oracle-checked; the files-skipped payoff
    * is pinned in ManifestSpec.
    */
  private def manifestBloomQ(s: SparkSession, d: String): DataFrame = {
    val dir = graft.streaming.Scratch.tmpDir("graft_bloomlayout")
    Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
      .repartition(16, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val manifest = graft.sources.Manifest.buildWithBlooms(
      s, dir, cols = Seq("user_id"), bloomCols = Seq("user_id"),
      expectedPerFile = 4096L)
    graft.sources.Manifest.prunedReadEq(s, manifest, Map("user_id" -> 73L))
      .select("event_id", "event_type", "value")
  }

  /** IN-set bloom pruning ([[graft.sources.Manifest.prunedReadIn]]):
    * the multi-tenant point read — three users probed in one pass
    * over the hash-partitioned layout, each admitted file read once.
    * Oracle is the plain IN filter.
    */
  private def manifestInQ(s: SparkSession, d: String): DataFrame = {
    val dir = graft.streaming.Scratch.tmpDir("graft_bloomin")
    Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
      .repartition(16, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val manifest = graft.sources.Manifest.buildWithBlooms(
      s, dir, cols = Seq("user_id"), bloomCols = Seq("user_id"),
      expectedPerFile = 4096L)
    graft.sources.Manifest.prunedReadIn(s, manifest, "user_id",
        Seq(73L, 4L, 250L))
      .select("event_id", "user_id", "event_type", "value")
  }

  /** Mergeable-sketch serving path ([[graft.operators.Sketches]]):
    * per-(event_type, day) HLL partials — the table an ingest job
    * would persist — merged down to distinct users per event_type.
    * Datasketches register internals ≠ DuckDB's estimator, so the
    * driver check is tolerance-bounded (see [[approxDistinct]]): the
    * output carries the exact per-type distinct (DuckDB-reproducible)
    * plus a boolean attesting the MERGED estimate is within 10% of it
    * (lgK=12 ≈ 2% rel. err; deterministic given data). Merge ≡
    * direct-sketch equality stays spec-pinned in `SketchesSpec`.
    */
  private def hllMergeQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
    val est = graft.operators.Sketches.hllMerge(
      graft.operators.Sketches.hllPartials(
        ev, Seq("event_type"), "day", "user_id"),
      Seq("event_type"))
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_distinct").cast("long") - col("exact_users")) * lit(100L) <=
          lit(10L) * col("exact_users")).as("merge_within_10pct"))
  }

  /** Mergeable-histogram quantile serving
    * ([[graft.operators.Sketches]]): per-(event_type, day) equi-width
    * bin vectors merged per type, p50/p95/p99 read off the cumulative
    * histogram. Merge is element-wise addition — exact algebra — so
    * unlike HLL the whole path is oracle-checkable; [0, 512)×32 bins
    * keeps every edge dyadic (width 16.0), engine-exact.
    */
  private def histQuantileQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
    val merged = Sketches.histogramMerge(
      Sketches.histogramPartials(
        ev, Seq("event_type"), "day", "value", lo = 0.0, hi = 512.0, bins = 32),
      Seq("event_type"), bins = 32)
    merged.select(col("event_type"),
      Sketches.histogramQuantile(col("hist"), 0.0, 512.0, 32, 0.5).as("p50"),
      Sketches.histogramQuantile(col("hist"), 0.0, 512.0, 32, 0.95).as("p95"),
      Sketches.histogramQuantile(col("hist"), 0.0, 512.0, 32, 0.99).as("p99"))
  }

  /** Theta-sketch audience algebra ([[graft.operators.Sketches]]):
    * per-(event_type, day) theta partials — the persistable slice
    * table — answering "users who clicked AND purchased / clicked
    * only / purchased only" by sketch intersection/difference, with
    * NO join or re-scan of the raw history. The estimates have no
    * SQL twin, so the driver check is tolerance-bounded (see
    * [[approxDistinct]]): the output carries the three EXACT set
    * sizes (DuckDB: INTERSECT/EXCEPT counts) plus booleans attesting
    * each estimate is within 10% (or ±3 for near-empty sets — a
    * relative bound is vacuous at exact=0). lgK=12 ≈ 3% rel. err and
    * sketches below nominal capacity are exact, so the flags are
    * deterministic and stable. Estimate-vs-exact across the full
    * algebra stays spec-pinned in `SketchesSpec`.
    */
  private def thetaAudienceQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
    val est = Sketches.thetaOverlap(
      Sketches.thetaPartials(ev, Seq("event_type"), "day", "user_id"),
      "event_type", "click", "purchase")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id")).distinct()
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    val exact = clicks.intersect(purchases).agg(count(lit(1)).as("both_exact"))
      .crossJoin(clicks.except(purchases).agg(count(lit(1)).as("only_click_exact")))
      .crossJoin(purchases.except(clicks).agg(count(lit(1)).as("only_purchase_exact")))
    def ok(estC: Column, exC: Column): Column =
      abs(estC - exC) * lit(100L) <= lit(10L) * exC || abs(estC - exC) <= lit(3L)
    est.crossJoin(exact).select(
      col("both_exact"), col("only_click_exact"), col("only_purchase_exact"),
      ok(col("both"), col("both_exact")).as("both_ok"),
      ok(col("only_a"), col("only_click_exact")).as("only_click_ok"),
      ok(col("only_b"), col("only_purchase_exact")).as("only_purchase_ok"))
  }

  /** DISTINCT — partial/final hash aggregate, no sort. */
  private def distinctTypes(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("event_type").distinct()

  /** SURVEY §2 A5 — Q-line shape: the full per-group time series
    * (ordering is presentational; event_id gives a total order).
    */
  private def lineSeries(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select("event_type", "ts", "value", "event_id")
      .orderBy("event_type", "ts", "event_id")

  /** ROLLUP — hierarchical totals (region → nation → grand total),
    * one pass of partial/final aggregation over the expanded
    * grouping sets.
    */
  private def rollupRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "r_name", "n_name")
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(dims), ord("o_custkey") === dims("c_custkey"))
      .select(col("r_name"), col("n_name"), discounted.as("disc"))
      // `.rollup` on join-derived columns trips Spark's ambiguous-
      // self-join false positive (reproduced on a minimal
      // join+rollup); the SQL surface plans the identical Expand +
      // aggregate without it.
      .createOrReplaceTempView("graft_rollup_src")
    s.sql(
      """SELECT r_name, n_name,
        |  CAST(round(sum(disc), 2) AS DOUBLE) AS revenue
        |FROM graft_rollup_src GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
  }

  /** COUNT(DISTINCT) — Catalyst's expand + two-phase aggregation. */
  private def distinctCount(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("users"))

  /** PIVOT — wide per-user mean value by event type (fixed column
    * set so schema is static and oracle-comparable).
    */
  private def pivotAvg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(decAvg(col("value"), 2))

  /** As-of join ([[Relational.asofJoin]]): for every purchase, the
    * latest click by the same user at or before the purchase time —
    * the canonical event-attribution query Spark has no native
    * operator for. DuckDB's native ASOF JOIN is the oracle.
    */
  private def asofClickBeforePurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val build = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    Relational.asofJoin(probe, build,
        probeKey = "p_user", buildKey = "user_id",
        probeTs = "purchase_ts", buildTs = "ts",
        buildPayload = Seq("event_id", "ts", "value"),
        buildTieBreak = "event_id")
      .select(col("purchase_id"), col("p_user"), col("purchase_ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
  }

  /** TPC-H Q6 shape: highly selective range predicates, all pushed
    * into the scan, one global aggregate — the pushdown showcase.
    */
  private def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        && col("l_discount").between(0.02, 0.06)
        && col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * col("l_discount").cast(DecimalType(4, 2))), 2)
        .cast("double").as("revenue"))

  /** TPC-H Q17 shape — correlated per-group threshold: lineitems
    * whose quantity is below 20% of their part's average quantity.
    * The per-part average is a derived aggregate joined back (the
    * decorrelated plan Catalyst would produce for the correlated
    * subquery), computed exactly (decimal sum / count) so the
    * threshold compare is engine-portable.
    */
  private def smallQuantityRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val avgQty = li.groupBy(col("l_partkey").as("__pk"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("__avg_qty"))
    li.join(avgQty, col("l_partkey") === col("__pk"))
      .filter(col("l_quantity") < lit(0.2) * col("__avg_qty"))
      .agg(round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("yearly_loss"))
  }

  /** TPC-H Q7 shape — bidirectional two-nation trade volume: both
    * dimension chains (supplier→nation, customer→orders) filter to
    * the two nations BEFORE the fact join, so the broadcast inner
    * joins prune the lineitem stream early; the OR'd pair predicate
    * only runs on surviving rows.
    */
  private def nationVolume(s: SparkSession, d: String): DataFrame = {
    val nats = Seq("NATION_1", "NATION_2")
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(nats: _*))
    val cn = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(nats: _*))
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(discounted), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q2 shape — argmax-by-equality via decorrelated aggregate:
    * suppliers whose balance equals their nation's maximum. Unlike
    * top-1-per-group (which [[graft.plans.RewriteTopOnePerGroup]]
    * rewrites), equality-with-aggregate keeps ALL tied rows — the
    * exact semantics of Q2's `= (SELECT min(...))` correlated
    * subquery after Catalyst decorrelates it into this join.
    */
  private def topAcctbalSupplier(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
    val mx = sup.groupBy(col("s_nationkey").as("__nk"))
      .agg(max("s_acctbal").as("__mx"))
    sup.join(broadcast(mx),
        col("s_nationkey") === col("__nk") && col("s_acctbal") === col("__mx"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name", "s_acctbal")
  }

  /** TPC-H Q20 shape — IN over an aggregated-HAVING subquery:
    * suppliers that shipped >100 total quantity of some part. Plans
    * as aggregate → distinct keys → left-semi join; the semi side is
    * bounded by |suppliers| so it broadcasts.
    */
  private def heavySuppliers(s: SparkSession, d: String): DataFrame = {
    val heavy = Tables.lineitem(s, d)
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(dec(col("l_quantity"))).as("__qty"))
      .filter(col("__qty") > 100)
      .select("l_suppkey").distinct()
    val sup = Tables.supplier(s, d)
    sup.join(broadcast(heavy), sup("s_suppkey") === heavy("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }

  /** TPC-H Q10 shape — returned-item revenue ranking: selective
    * returnflag filter on the fact scan, grouped customer revenue,
    * bounded top-k (TakeOrderedAndProject — never a global sort).
    */
  private def returnedRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d).select("c_custkey", "c_name")
    val grouped = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum(discounted), 2).cast("double").as("revenue"))
    Relational.topK(grouped, 20, col("revenue").desc, col("c_custkey").asc)
      .select("c_custkey", "c_name", "revenue")
  }

  /** TPC-H Q14 shape — conditional-aggregate ratio over a broadcast
    * dimension join: promo revenue share. Both sums are exact
    * decimals; the single double division happens once at the end in
    * a fixed expression order (the oracle mirrors it token-for-token).
    */
  private def promoShare(s: SparkSession, d: String): DataFrame = {
    val pt = Tables.part(s, d).select("p_partkey", "p_type")
    Tables.lineitem(s, d)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .agg(Det.round(
        sum(when(col("p_type") === "PROMO", discounted)).cast("double") * 100.0 /
          sum(discounted).cast("double"), 4).as("promo_share"))
  }

  /** TPC-H Q19 shape — disjunctive multi-column predicates across a
    * join: each OR branch constrains both part (brand, size) and
    * lineitem (quantity) columns. Catalyst extracts the common
    * `p_size/l_quantity` bounds for scan-level pushdown and leaves
    * the residual OR above the broadcast hash join.
    */
  private def brandBuckets(s: SparkSession, d: String): DataFrame = {
    val pt = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(s, d)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
            && col("l_quantity").between(20, 30)))
      .agg(round(sum(discounted), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q4 shape — EXISTS as a left-semi join with a compound
    * (equi + range) condition: orders with at least one lineitem
    * shipped >365 days after the order date. The semi join probes
    * each order at most once regardless of how many lineitems match
    * — no fact-side blowup, no distinct.
    */
  private def priorityCheck(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey")
          && li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 365 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q9 shape — nation/year profit rollup where the part
    * predicate contributes no output columns, so it plans as a
    * broadcast left-semi filter on the fact scan instead of a full
    * join (half the build-side memory, same rows).
    */
  private def nationProfit(s: SparkSession, d: String): DataFrame = {
    val pt = Tables.part(s, d)
      .filter(col("p_name").contains("widget")).select("p_partkey")
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, d)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
      .agg(round(sum(discounted), 2).cast("double").as("profit"))
  }

  /** TPC-H Q8 shape — market share: one nation's fraction of regional
    * revenue per year. Two conditional sums in a single aggregation
    * pass; the region membership is a semi filter (no payload), the
    * supplier-nation tag a broadcast join.
    */
  private def marketShare(s: SparkSession, d: String): DataFrame = {
    val asiaCust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("c_custkey")
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(Det.round(
        sum(when(col("supp_nation") === "NATION_5", discounted)).cast("double") /
          sum(discounted).cast("double"), 4).as("mkt_share"))
  }

  /** TPC-H Q11 shape — scalar subquery in HAVING: parts whose revenue
    * exceeds 1/10000 of global revenue. The compare is pure decimal
    * (`part_sum * 10000 > total`) — no float threshold to diverge
    * between engines — and the one-row global total broadcasts.
    */
  private def importantParts(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val total = li.agg(sum(discounted).as("__tot"))
    li.groupBy("l_partkey")
      .agg(sum(discounted).as("__val"))
      .crossJoin(broadcast(total))
      .filter(col("__val") * 10000 > col("__tot"))
      .select(col("l_partkey"),
        round(col("__val"), 2).cast("double").as("part_value"))
  }

  /** TPC-H Q12 shape — two conditional counts in one pass over a
    * fact-fact equi-join (no second scan, no pivot shuffle).
    */
  private def priorityLineCounts(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        && col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q13 shape — order-count distribution: left outer join with
    * the selective predicate in the ON clause (a WHERE would silently
    * turn the join inner and drop zero-order customers), then a
    * second aggregation over the first's output.
    */
  private def custDistribution(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "P")
      .select("o_custkey", "o_orderkey")
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15 shape — argmax over an aggregated view: the quarter's
    * top-revenue supplier(s), ties kept. The revenue view is computed
    * once; the max is a one-row broadcast equality probe against it
    * (Catalyst reuses the exchange for both consumers).
    */
  private def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01 00:00:00").cast("timestamp_ntz")
        && col("l_shipdate") < lit("1999-04-01 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_suppkey")
      .agg(round(sum(discounted), 2).cast("double").as("total_revenue"))
    val mx = rev.agg(max("total_revenue").as("__mx"))
    Tables.supplier(s, d)
      .join(broadcast(rev), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx), col("total_revenue") === col("__mx"))
      .select("s_suppkey", "s_name", "total_revenue")
  }

  /** TPC-H Q16 shape — NOT IN as a left-anti join (safe here: the
    * subquery key is non-nullable) feeding a COUNT(DISTINCT) over
    * part attributes. The anti side is tiny and broadcasts.
    */
  private def partSupplierCounts(s: SparkSession, d: String): DataFrame = {
    val bad = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val pt = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1"
        && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q18 shape — IN over a grouped-HAVING subquery, then top-k:
    * orders whose total quantity clears a threshold. The heavy-order
    * set is the aggregate's output (bounded, broadcastable) and the
    * final ranking is TakeOrderedAndProject, never a global sort.
    */
  private def largeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("__q"))
      .filter(col("__q") > 300)
    val cust = Tables.customer(s, d).select("c_custkey", "c_name")
    val joined = Tables.orders(s, d)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("__q").cast("double").as("total_qty"))
    Relational.topK(joined, 100, col("o_totalprice").desc, col("o_orderkey").asc)
  }

  /** TPC-H Q21 shape — EXISTS + NOT EXISTS self-correlation: the sole
    * late supplier in multi-supplier finished orders, in ONE pass
    * over lineitem. The two correlated subqueries collapse into
    * per-order counts: a late supplier on order O qualifies iff O has
    * >1 distinct suppliers (EXISTS another) and exactly 1 late
    * supplier (NOT EXISTS another late — itself being the one).
    * Plan: lineitem⋈orders once, partial-agg to (order, supplier,
    * late), then per-order counts as a window over that aggregate —
    * one linear DAG, exactly one lineitem scan. A previous form
    * instantiated the lineitem⋈orders subtree three times (semi +
    * anti against dedup'd sets); the plan audit showed ReuseExchange
    * did NOT collapse them (7 scans), so at 100 TB this form does
    * 3× less scan + join work.
    *
    * `numwait` counts qualifying LINE ITEMS per supplier (not
    * orders), matching the previous semi/anti formulation and the
    * oracle SQL.
    */
  private def waitingSupplier(s: SparkSession, d: String): DataFrame = {
    val tagged = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"))
      .select("l_orderkey", "l_suppkey", "late")
    val perSupp = tagged
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("late"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late_lines"))
    // Per-order counts as an unordered window over the (order,
    // supplier) aggregate — a single linear DAG (referencing perSupp
    // twice would re-instantiate the scan subtree; ReuseExchange is
    // not guaranteed under AQE). Group sizes are per-order supplier
    // counts — bounded, no skew risk.
    val w = Window.partitionBy("l_orderkey")
    val cand = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp",
        sum(when(col("late"), 1L).otherwise(0L)).over(w))
      .filter(col("late") && col("n_supp") > 1 && col("n_late_supp") === 1)
    val grouped = cand
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("n_late_lines")).as("numwait"))
    Relational.topK(grouped, 100, col("numwait").desc, col("s_name").asc)
  }

  /** TPC-H Q22 shape — above-average balance AND no orders: the mean
    * compare is decimal-exact (`bal * n > total`, no float division),
    * the NOT EXISTS a shuffle-free-on-the-small-side anti join.
    */
  private def inactiveRich(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("__tot"), count(lit(1)).as("__cnt"))
    cust.crossJoin(broadcast(stats))
      .filter(dec(col("c_acctbal")) * col("__cnt") > col("__tot"))
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
  }

  /** HAVING — post-aggregation filter on the aggregate itself. */
  private def bigOrders(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("__qty"))
      .filter(col("__qty") > 120)
      .select(col("l_orderkey"), col("__qty").cast("double").as("total_qty"))

  /** Scalar subquery shape: customers whose spend exceeds the global
    * mean spend — the whole-input aggregate feeds a filter, computed
    * once and broadcast (same pattern as the retention window).
    */
  private def aboveAvgSpenders(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("spend"))
    val mean = spend.agg((sum("spend") / count(lit(1))).as("__mean"))
    spend.crossJoin(broadcast(mean))
      .filter(col("spend") > col("__mean"))
      .select("o_custkey", "spend")
  }

  /** Sessionization: group each user's events into sessions separated
    * by >30-minute gaps. Batch form: per-user `lag` flags session
    * starts, a running sum numbers them, one aggregation per session
    * — two window passes + one aggregation over the same (user, ts)
    * sort order, so Catalyst reuses a single shuffle+sort. The
    * streaming twin is [[graft.streaming.StreamOps]]' session_window.
    */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    def epUs(c: Column) = unix_micros(c.cast("timestamp"))
    val newSession = when(
      epUs(col("ts")) - epUs(lag(col("ts"), 1).over(byUser)) > 1800000000L
        || lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
    Tables.events(s, d)
      .withColumn("session_id",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Conversion funnel view → click → purchase over the events
    * stream ([[Relational.funnel]]): per user, the first-reach
    * timestamp of each stage (stage i+1 strictly after stage i) and
    * the stage count. The Spark side is the single-shuffle sorted
    * fold; the oracle states the equivalent min-cascade in SQL — two
    * genuinely different formulations that must agree cell-exactly.
    */
  private def funnelQ(s: SparkSession, d: String): DataFrame =
    Relational.funnel(Tables.events(s, d),
      "user_id", "ts", "event_type",
      stages = Seq("view", "click", "purchase"),
      tiebreakCol = "event_id")

  /** Contiguous sequence-pattern occurrences
    * ([[Relational.matchPattern]] — the CEP/MATCH_RECOGNIZE
    * contiguous case, vs [[funnelQ]]'s subsequence first-reach):
    * click → view → purchase as three CONSECUTIVE events within an
    * hour, all (overlapping) occurrences counted per user plus the
    * first match's span. Oracle: the identical lead-window
    * formulation with integer-microsecond span arithmetic.
    */
  private def matchPatternQ(s: SparkSession, d: String): DataFrame =
    Relational.matchPattern(Tables.events(s, d),
      "user_id", "ts", "event_type",
      pattern = Seq("click", "view", "purchase"),
      maxSpanSeconds = 3600L,
      tiebreakCol = "event_id")

  /** Quantified CEP ([[graft.operators.Relational.matchPatternPlus]]):
    * `click view+ purchase` — greedy one-label repetition over the
    * run-length-encoded per-user label stream, anchors at the last
    * `click` / first `purchase` events, 1 h anchor span. Oracle: the
    * identical RLE (lag-break + running sum), neighbor-run lag/lead,
    * and per-key aggregate in SQL.
    */
  private def matchPatternPlusQ(s: SparkSession, d: String): DataFrame =
    Relational.matchPatternPlus(Tables.events(s, d),
      "user_id", "ts", "event_type",
      first = "click", plus = "view", last = "purchase",
      maxSpanSeconds = 3600L,
      tiebreakCol = "event_id")

  /** Bounded + alternation CEP
    * ([[graft.operators.Relational.matchPatternBounded]], round 16):
    * `click (view|error){1,3} purchase` — the alternation set
    * collapses to one run class before the RLE, and the length bound
    * is a WHERE clause on the run frame; a maximal mixed view/error
    * run longer than 3 yields NO match (greedy-contiguous: the 4th
    * quantified event is an intruder between the bound and the
    * `purchase` anchor). Oracle: the identical class-RLE +
    * neighbor-run chain with the BETWEEN bound.
    */
  private def matchPatternBoundedQ(s: SparkSession, d: String): DataFrame =
    Relational.matchPatternBounded(Tables.events(s, d),
      "user_id", "ts", "event_type",
      first = "click", plus = Seq("view", "error"), minLen = 1, maxLen = 3,
      last = "purchase", maxSpanSeconds = 3600L,
      tiebreakCol = "event_id")

  /** Time-series subsequence similarity
    * ([[graft.operators.TimeSeries.similarSubsequences]]): the 20
    * per-user event-value windows (length 8) most correlated with a
    * spike-shaped query pattern — Pearson over integer-quantized
    * values (2-decimal telemetry → exact cents), one fixed-shape
    * double expression, IEEE-exact sqrt, Det-rounded. Oracle: the
    * identical windowed integer sums + correlation in SQL.
    */
  private def seriesSimilarQ(s: SparkSession, d: String): DataFrame =
    graft.operators.TimeSeries.similarSubsequences(
      Tables.events(s, d), "user_id", "ts", "value",
      query = Seq(1.0, 2.0, 4.0, 8.0, 8.0, 4.0, 2.0, 1.0),
      k = 20, tiebreakCol = "event_id", scale = 2)

  private[graft] val funnelSql =
    """WITH e AS (
      |  SELECT user_id, ts, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |s0 AS (SELECT user_id, min(ts) AS ts_view
      |       FROM e WHERE event_type = 'view' GROUP BY 1),
      |s1 AS (SELECT e.user_id, min(e.ts) AS ts_click
      |       FROM e JOIN s0 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s0.ts_view GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS ts_purchase
      |       FROM e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s1.ts_click GROUP BY 1)
      |SELECT u.user_id, s0.ts_view, s1.ts_click, s2.ts_purchase,
      |  CAST(CASE WHEN s2.user_id IS NOT NULL THEN 3
      |            WHEN s1.user_id IS NOT NULL THEN 2
      |            WHEN s0.user_id IS NOT NULL THEN 1
      |            ELSE 0 END AS INTEGER) AS stages_reached
      |FROM (SELECT DISTINCT user_id FROM e) u
      |LEFT JOIN s0 USING (user_id)
      |LEFT JOIN s1 USING (user_id)
      |LEFT JOIN s2 USING (user_id)""".stripMargin

  /** Exact percentiles (linear interpolation — same arithmetic as
    * DuckDB's `quantile_cont`, so hash-exact). Spark's `percentile`
    * is the exact sort-based form; `percentile_approx` (KLL-ish
    * sketch) is the scale path when exactness isn't required.
    */
  private def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        Det.round(expr("percentile(value, 0.5)"), 4).as("p50"),
        Det.round(expr("percentile(value, 0.9)"), 4).as("p90"))

  /** Equi-depth quantile binning ([[graft.operators.Binning]]):
    * per-event-type quartile boundaries (exact percentile ≡ DuckDB
    * quantile_cont, Det-rounded before comparison) assigned map-only
    * through a broadcast boundary table.
    */
  private def quantileBinsQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Binning.equiDepthBins(
      Tables.events(s, d).select("event_id", "event_type", "value"),
      groupCols = Seq("event_type"), valueCol = "value", nBins = 4)
      .select("event_id", "event_type", "value", "bin")

  /** HLL sketch distinct count — the 100 TB form of
    * [[distinctCount]]: mergeable fixed-size sketches instead of an
    * expanded exact-distinct shuffle. The estimate itself has no SQL
    * twin (HLL++ register state is Spark-internal), so the DRIVER
    * check is tolerance-bounded: the output carries the exact count
    * (which DuckDB reproduces) plus a boolean attesting the estimate
    * landed within 10% of it — rsd=0.02 puts 10% at 5 sigma, and the
    * estimate is deterministic given the data, so the flag is stable.
    * A drifting estimator flips the flag and the driver's hash
    * compare fails loudly on the exact row.
    */
  private def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count_distinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("__est"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("__est") - col("exact_users")) * lit(100L) <=
          lit(10L) * col("exact_users")).as("est_within_10pct"))

  /** GROUPING SETS via the SQL surface: arbitrary grouping lattice in
    * one Expand pass.
    */
  private def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("graft_gs_events")
    s.sql(
      """SELECT event_type, user_id,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM graft_gs_events
        |GROUP BY GROUPING SETS ((event_type), (user_id), ())""".stripMargin)
  }

  /** JSON scalar surface (SURVEY §2.8 — the reference's only JSON ops
    * are whole-record to/from_json): typed extraction from the
    * semi-structured `props` column.
    */
  private def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k_val"))

  /** VARIANT shredding ([[graft.operators.Variant.shred]]): a nested
    * JSON document (assembled deterministically in-plan from integer
    * and enum columns — `events.props` itself is flat) is parsed ONCE
    * into Spark 4's binary variant and three typed fields are
    * shredded from it: a nested string, a nested int, and an array
    * element — the parse-once/extract-many ingest shape. The oracle
    * rebuilds the identical document with `||` and extracts with
    * DuckDB's JSON functions.
    */
  private def variantShred(s: SparkSession, d: String): DataFrame = {
    val js = concat(
      lit("{\"meta\":{\"type\":\""), col("event_type"),
      lit("\",\"k\":"), get_json_object(col("props"), "$.k"),
      lit("},\"ids\":["), col("event_id").cast("string"),
      lit(","), col("user_id").cast("string"), lit("]}"))
    graft.operators.Variant.shred(
        Tables.events(s, d).withColumn("__js", js),
        col("__js"),
        Seq(("vtype", "$.meta.type", "string"),
          ("vk", "$.meta.k", "int"),
          ("vuser", "$.ids[1]", "bigint")))
      .select("event_id", "vtype", "vk", "vuser")
  }

  /** SURVEY §2 P11 — the typed `Dataset[T]` encoder boundary: object
    * filter/map through case-class encoders, back to a frame. (The
    * deserialize/serialize hop is the documented cost of typed ops —
    * used where compile-time field checks matter, not in hot paths.)
    */
  private def typedBoundary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select("event_id", "event_type", "value").as[Ev]
      .filter(_.value > 30.0)
      .map(e => Ev(e.event_id, e.event_type, e.value * 2))
      .toDF()
  }

  /** CDC merge — the reference's REPLACE-INTO re-ingest
    * (`DataIngesting.py:48-64`) as a set-oriented delta apply:
    * `events` plays the change log over the `customer` base (last
    * change per key wins; clicks delete, everything else upserts the
    * balance). See [[graft.operators.Cdc.applyChanges]] for the
    * one-full-outer-join scale shape.
    */
  private def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal")
    val changes = Tables.events(s, d).select(
      col("user_id").as("c_custkey"),
      col("ts"), col("event_id"),
      when(col("event_type") === "click", lit("D")).otherwise(lit("U")).as("op"),
      col("value").as("new_bal"))
    Cdc.applyChanges(base, changes,
        keyCols = Seq("c_custkey"), orderCols = Seq("ts", "event_id"),
        opCol = "op", updateCols = Map("c_acctbal" -> "new_bal"))
      .select(col("c_custkey"),
        coalesce(col("c_name"), lit("(new)")).as("name"),
        col("c_acctbal").as("bal"))
  }

  /** Snapshot reconciliation ([[graft.operators.Cdc.snapshotDiff]]):
    * a synthetic "yesterday" snapshot derived deterministically from
    * `orders` (every 7th key missing → reads as I, every 11th key
    * shifted past the domain → reads as D, every 5th key's price
    * nudged → reads as U) diffed against today's. Output is sized to
    * the drift; the oracle restates the same derivation over one
    * full-outer join.
    */
  private def snapshotDiffQ(s: SparkSession, d: String): DataFrame = {
    val cur = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val base = cur.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .union(cur.filter(pmod(col("o_orderkey"), lit(11)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    Cdc.snapshotDiff(base, cur, keyCols = Seq("o_orderkey"))
  }

  /** One-pass column profile ([[graft.operators.Profile.exact]]) over
    * five `orders` columns (bigint / varchar ×2 / timestamp / DOUBLE
    * — `o_totalprice` joins the oracle-checked set because `mean` is
    * built engine-portably: DECIMAL sum → correctly-rounded double →
    * one double division → Det.round; its min/max strings are money
    * values parsed from short decimals, which both engines print back
    * verbatim as the shortest round-trip repr). Timestamp casts print
    * identically in Spark and DuckDB at whole-second precision.
    */
  private def profileQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.exact(
      Tables.orders(s, d),
      Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate",
        "o_totalprice"))

  /** Dense surrogate ids ([[graft.sources.Warehouse.withDenseId]]):
    * SQLite AUTOINCREMENT parity under a declared total order —
    * ids 1..N with no single-partition window (range shuffle +
    * per-partition prefix offsets). Oracle: `row_number()` over the
    * same order.
    */
  private def denseIdsQ(s: SparkSession, d: String): DataFrame =
    graft.sources.Warehouse.withDenseId(
      Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_orderpriority"),
      "id", Seq(col("o_orderkey")))

  /** The BENCHED profile bound: [[graft.operators.Profile
    * .approxBounded]] over the same five columns — HLL estimates
    * cross-checked in-plan against the exact distincts, emitting
    * `(col_name, n_distinct, est_within_15pct)`. HLL cardinalities
    * are Spark-internal and not SQL-reproducible, so this is the
    * driver-BOUNDED form: DuckDB reproduces the exact count and the
    * TRUE flags, and an estimator drifting past 15% (rsd=0.05 → 3
    * sigma) flips a flag and fails the hash compare. The pure
    * no-Expand serving plan remains [[graft.operators
    * .Profile.approx]], spec-pinned in `ProfileSpec`.
    */
  private def profileApproxQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.approxBounded(
      Tables.orders(s, d),
      Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate",
        "o_totalprice"))

  /** The PRODUCTION profile serving plan ([[graft.operators.Profile
    * .approx]] — HLL distincts, NO exact-distinct Expand), restored
    * to the bench in round 12 and DRIVER-CHECKED since round 14
    * ([[graft.operators.Profile.approxAudited]]): the round-13
    * verdict flagged this as the one gate entry with no check of any
    * kind. The serving aggregate is unchanged; per column a
    * single-distinct two-phase aggregate (plain hash agg over a scan
    * pruned to that column — still NO Expand, plan-pinned in
    * `ProfileSpec`) supplies the exact count the HLL estimate is
    * flag-checked against in-plan. Every output column is
    * oracle-exact (the raw estimate is excluded from the
    * projection), so rows+schema+hash are all hard-gated while the
    * estimator drifting past 15% would flip a flag and fail the
    * hash.
    */
  private def profileServeQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.approxAudited(
      Tables.orders(s, d),
      Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate",
        "o_totalprice"))

  /** One-pass expectation checking
    * ([[graft.operators.Profile.checkExpectations]]): four assertion
    * rules over orders in a single aggregate; the high-price rule is
    * planted to have real violations.
    */
  private def expectationsQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.checkExpectations(
      Tables.orders(s, d), Seq(
        "positive_total" -> (col("o_totalprice") > 0),
        "status_known" -> col("o_orderstatus").isin("O", "F", "P"),
        "total_under_300k" -> (col("o_totalprice") < 300000.0),
        "custkey_nonnull" -> col("o_custkey").isNotNull))

  /** Keyed pseudonymization ([[graft.operators.TextAnalysis
    * .pseudonymize]]): user ids replaced by salted-md5 surrogates
    * before anything reaches a training corpus — stable under the
    * same salt, so per-user grouping still works on the scrubbed
    * frame (the query groups by the surrogate to prove it).
    */
  private def pseudonymizeQ(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(graft.operators.TextAnalysis
        .pseudonymize(col("user_id"), "graft-corpus-v1").as("user_token"))
      .groupBy("user_token")
      .agg(count(lit(1)).as("n_events"))

  /** Next-event training pairs ([[graft.operators.Examples
    * .nextEvent]]): per-user timelines become (3-event context,
    * next-event label) supervision rows — the log-to-training-set
    * last mile, built entirely in per-user bounded window frames.
    */
  private def nextEventQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Examples.nextEvent(
        Tables.events(s, d), "user_id",
        Seq(col("ts"), col("event_id")), "event_type", k = 3)
      .select("user_id", "event_id", "context", "label")

  /** Markov transition matrix
    * ([[graft.operators.Examples.transitionMatrix]]) over each user's
    * time-ordered event types — bounded |types|² output, integer
    * probabilities.
    */
  private def transitionMatrixQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Examples.transitionMatrix(
      Tables.events(s, d), "user_id",
      Seq(col("ts"), col("event_id")), "event_type")

  private val expectationsOracle =
    """SELECT 'positive_total' AS rule,
      |  CAST(count(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 END) AS BIGINT) AS n_violations,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM orders
      |UNION ALL
      |SELECT 'status_known',
      |  CAST(count(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'total_under_300k',
      |  CAST(count(CASE WHEN NOT COALESCE(o_totalprice < 300000.0, FALSE) THEN 1 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'custkey_nonnull',
      |  CAST(count(CASE WHEN NOT COALESCE(o_custkey IS NOT NULL, FALSE) THEN 1 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT)
      |FROM orders""".stripMargin

  /** Zero-extra-pass QC ([[graft.operators.Profile
    * .observeExpectations]]): the SAME four rules as
    * [[expectationsQ]], but accumulated as `observe` counters inside
    * a host action (here a noop-sink write standing in for the
    * pipeline's real write) instead of a dedicated aggregate pass.
    * The driver-visible metrics map is surfaced as the identical
    * `(rule, n_violations, n_rows)` shape, so the SAME oracle SQL
    * checks both formulations — observation ≡ aggregation is itself
    * the property under test.
    */
  private def observeQcQ(s: SparkSession, d: String): DataFrame = {
    val rules = Seq(
      "positive_total" -> (col("o_totalprice") > 0),
      "status_known" -> col("o_orderstatus").isin("O", "F", "P"),
      "total_under_300k" -> (col("o_totalprice") < 300000.0),
      "custkey_nonnull" -> col("o_custkey").isNotNull)
    val (instrumented, obs) =
      graft.operators.Profile.observeExpectations(Tables.orders(s, d), rules)
    instrumented.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val nRows = m("n_rows").asInstanceOf[Long]
    import s.implicits._
    rules.map { case (name, _) =>
      (name, m(name).asInstanceOf[Long], nRows)
    }.toDF("rule", "n_violations", "n_rows")
  }

  /** Referential-integrity audit
    * ([[graft.operators.Profile.fkOrphans]]): orphan counts for three
    * warehouse FK relationships in one result — the cross-table QC
    * row-local expectations cannot see. The driver corpus is
    * FK-clean, so the audit doubles as a regression trip-wire: any
    * nonzero orphan row means a loader broke a key.
    */
  private def fkOrphansQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Profile.fkOrphans
    fkOrphans(Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey", "lineitem.orderkey->orders")
      .unionAll(fkOrphans(Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", "orders.custkey->customer"))
      .unionAll(fkOrphans(Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey", "customer.nationkey->nation"))
  }

  /** Value-concentration profile
    * ([[graft.operators.Profile.giniImpurity]]): Gini impurity of two
    * categorical columns, engine-exact via integer frequency squares.
    */
  private def giniQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.giniImpurity(Tables.events(s, d), "event_type")
      .unionAll(graft.operators.Profile.giniImpurity(
        Tables.orders(s, d), "o_orderstatus"))

  /** Histogram drift ([[graft.operators.Profile.histogramDrift]]):
    * click-value vs purchase-value distributions over the shared
    * [0,512)×32 grid; summing `contrib` and halving gives exact
    * total-variation distance.
    */
  private def histDriftQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    graft.operators.Profile.histogramDrift(
      ev.filter(col("event_type") === "click").select("value"),
      ev.filter(col("event_type") === "purchase").select("value"),
      "value", lo = 0.0, hi = 512.0, bins = 32)
  }

  /** Pivot (wide crosstab — the inverse of `q_unpivot`): per-user
    * DECIMAL-exact value sums spread across fixed event-type columns.
    * Explicit pivot values keep the plan a single pass (no
    * distinct-values pre-query) — the 100 TB form.
    */
  private def pivotQ(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(sum(dec(col("value"))).cast("double"))

  /** Quantile winsorization ([[graft.operators.Binning.winsorize]]):
    * per-type values clamped into [p01, p99].
    */
  private def winsorizeQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Binning.winsorize(
        Tables.events(s, d).select("event_id", "event_type", "value"),
        Seq("event_type"), "value", loQ = 0.01, hiQ = 0.99)
      .select("event_id", "event_type", "value", "value_w")

  /** Group-mean imputation ([[Relational.imputeByGroupMean]]): every
    * 10th event's value nulled, then refilled from its type's
    * non-null mean.
    */
  private def imputeQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      when(pmod(col("event_id"), lit(10)) === 0, lit(null))
        .otherwise(col("value")).as("value"))
    Relational.imputeByGroupMean(ev, Seq("event_type"), "value", scale = 2)
      .select("event_id", "event_type", "value", "value_filled")
  }

  /** The q-gram-filter fuzzy join ([[Relational.fuzzyJoinGrams]]) on
    * the same pairs as `q_fuzzy_join` — part names straddle the
    * 9-char lemma cutoff at maxDist 2, so BOTH routes (gram count and
    * short-string length buckets) execute; the oracle is the same
    * plain all-pairs definition.
    */
  private def fuzzyJoinGramsQ(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d).select("p_name").distinct()
    Relational.fuzzyJoinGrams(
        names.select(col("p_name").as("name_a")), "name_a",
        names.select(col("p_name").as("name_b")), "name_b",
        maxDist = 2)
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("dist").cast("int").as("dist"))
  }

  /** The prefix-filtered fuzzy join ([[Relational.fuzzyJoinPrefix]])
    * on the same pairs — only each name's rarest `maxDist·q+1` grams
    * reach the shuffle; same plain all-pairs oracle.
    */
  private def fuzzyJoinPrefixQ(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d).select("p_name").distinct()
    Relational.fuzzyJoinPrefix(
        names.select(col("p_name").as("name_a")), "name_a",
        names.select(col("p_name").as("name_b")), "name_b",
        maxDist = 2)
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("dist").cast("int").as("dist"))
  }

  /** SCD-2 dimension build ([[graft.operators.Cdc.scd2]]): the event
    * log as a change history — per user, validity intervals from each
    * change to the next, open-ended on the current row.
    */
  private def scd2Q(s: SparkSession, d: String): DataFrame =
    Cdc.scd2(
        Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
        keyCols = Seq("user_id"), tsCol = "ts", tieCols = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("valid_from"), col("valid_to"),
        col("is_current").cast("int").as("is_current"))

  /** OHLC downsampling ([[Relational.ohlcBars]]): hourly bars per
    * event type — open/close via min_by/max_by partials, no window.
    */
  private def ohlcBarsQ(s: SparkSession, d: String): DataFrame =
    Relational.ohlcBars(
      Tables.events(s, d), Seq("event_type"), "ts", "event_id", "value", "hour")

  /** Rolling-window anomaly flags ([[Relational.rollingAnomaly]]):
    * value vs 2× the mean of the previous 5, stated multiplicatively
    * in DECIMAL so both engines compare identical cells.
    */
  private def rollingAnomalyQ(s: SparkSession, d: String): DataFrame =
    Relational.rollingAnomaly(
        Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
        keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        valueCol = "value", k = 5, factor = 2)
      .select(col("user_id"), col("event_id"),
        col("roll_sum").cast("double").as("roll_sum"),
        col("roll_n"), col("is_anomaly"))

  /** Bucketed co-located join
    * ([[graft.sources.Warehouse.writeBucketed]]): both fact tables
    * land pre-hash-partitioned (and sorted) on the join key, so the
    * sort-merge join plans with NO exchange and no per-query sort —
    * the write-once / join-forever layout (`BucketingSpec` pins the
    * exchange-free plan; this query gates the saveAsTable round-trip's
    * correctness). The oracle is the plain join — bucketing must be
    * invisible in the result.
    */
  private def bucketedJoinQ(s: SparkSession, d: String): DataFrame = {
    graft.sources.Warehouse.writeBucketed(
      Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
      "graft_bkt_orders", Seq("o_orderkey"), 8, Seq("o_orderkey"))
    graft.sources.Warehouse.writeBucketed(
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag"),
      "graft_bkt_lineitem", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    s.table("graft_bkt_lineitem").hint("merge")
      .join(s.table("graft_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
  }

  /** Edit-distance join ([[Relational.fuzzyJoin]]): near-matching
    * part-name pairs within Levenshtein 2 via sound length-bucket
    * blocking. The oracle states the plain all-pairs definition —
    * blocking must be invisible in the result.
    */
  private def fuzzyJoinQ(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d).select("p_name").distinct()
    Relational.fuzzyJoin(
        names.select(col("p_name").as("name_a")), "name_a",
        names.select(col("p_name").as("name_b")), "name_b",
        maxDist = 2)
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("dist").cast("int").as("dist"))
  }

  /** Gap-filled daily series: per-user daily mean, resampled to every
    * day in range with forward fill ([[Relational.gapFillDays]]).
    */
  private def gapFill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(decAvg(col("value"), 2).as("avg_value"))
    // DATE columns hash differently across engines (date32 vs
    // timestamp) — serve the day as a timestamp like every other
    // temporal output in the catalog.
    Relational.gapFillDays(daily, Seq("user_id"), "day", "avg_value")
      .withColumn("day", col("day").cast("timestamp_ntz"))
  }

  /** Top-3 events by value per type via the bounded-heap aggregate
    * ([[Relational.topKPerGroup]]) — ships ≤3 pairs per partition per
    * group instead of window-sorting every event.
    */
  private def topKPerGroupQ(s: SparkSession, d: String): DataFrame =
    Relational.topKPerGroup(Tables.events(s, d),
        groupCols = Seq("event_type"),
        scoreCol = col("value"), idCol = col("event_id"), k = 3)
      .withColumnRenamed("rank", "rk")
      .withColumnRenamed("id", "event_id")
      .withColumnRenamed("score", "value")

  /** Wide-to-long unpivot (melt) — the inverse of [[pivotAvg]]'s
    * pivot; Spark's native `unpivot` plans a single Expand (one pass,
    * no join/union of N scans).
    */
  private def unpivotQ(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_retailprice").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("retailprice"), col("size")), "measure", "val")

  private val latestSql =
    """SELECT user_id, event_type, event_id, ts, value FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_bar_avg", barAvg, Some(
      """SELECT event_type,
        |  floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_value
        |FROM events GROUP BY event_type""".stripMargin),
      headline = true),
    QueryDef("q_max_ts", maxTs, Some(
      "SELECT max(ts) AS max_ts FROM events")),
    QueryDef("q_latest_per_group", latestPerGroup, Some(latestSql), headline = true),
    QueryDef("q_first_per_group", firstPerGroup, Some(
      """SELECT user_id, event_id, event_type, ts FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin)),
    QueryDef("q_string_agg", stringAgg, Some(
      """SELECT user_id,
        |  string_agg(event_type || ': ' || CAST(value AS VARCHAR), '<br>'
        |             ORDER BY event_type || ': ' || CAST(value AS VARCHAR)) AS infos
        |FROM events GROUP BY user_id""".stripMargin)),
    QueryDef("q_flagship_profile", flagshipProfile, Some(
      """WITH latest AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1)
        |SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  string_agg(
        |    CASE WHEN l.value IS NOT NULL
        |         THEN l.event_type || ': ' || CAST(l.value AS VARCHAR) ELSE '' END,
        |    '<br>' ORDER BY
        |    CASE WHEN l.value IS NOT NULL
        |         THEN l.event_type || ': ' || CAST(l.value AS VARCHAR) ELSE '' END
        |  ) AS events_info
        |FROM customer c LEFT JOIN latest l ON c.c_custkey = l.user_id
        |GROUP BY c.c_custkey, c.c_name, c.c_mktsegment""".stripMargin),
      headline = true),
    QueryDef("q_retention_window", retention, Some(
      """SELECT event_id, user_id, event_type, value, ts FROM events
        |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY""".stripMargin)),
    QueryDef("q_watermark_gate", watermark, Some(
      "SELECT event_id, ts FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'")),
    QueryDef("q_conditional_projection", conditionalProjection, Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O'
        |       THEN o_orderstatus || '/' || o_orderpriority
        |       ELSE o_orderstatus END AS status_info
        |FROM orders""".stripMargin)),
    QueryDef("q_zero_filter", zeroFilter, Some(
      """SELECT l_orderkey, l_linenumber, l_discount,
        |  CAST(l_quantity AS INTEGER) AS qty_int
        |FROM lineitem WHERE l_discount <> 0""".stripMargin)),
    QueryDef("q_ts_roundtrip", tsRoundtrip, Some(
      """SELECT event_id,
        |  strftime(ts, '%d/%m/%Y %H:%M:%S') AS ts_str,
        |  strptime(strftime(ts, '%d/%m/%Y %H:%M:%S'), '%d/%m/%Y %H:%M:%S') AS ts_trunc
        |FROM events""".stripMargin)),
    QueryDef("q_top_orders", topOrders, Some(
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),
    QueryDef("q1_pricing_summary", pricingSummary, Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
        |  floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),
    QueryDef("q3_shipping_priority", shippingPriority, Some(
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin),
      headline = true),
    QueryDef("q5_region_revenue", regionRevenue, Some(
      """SELECT r_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM region, nation, customer, orders, lineitem
        |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY r_name""".stripMargin),
      headline = true),
    QueryDef("q_except_users", exceptUsers, Some(
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),
    QueryDef("q_intersect_users", intersectUsers, Some(
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),
    QueryDef("q_running_sum", runningSum, Some(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin),
      headline = true),
    QueryDef("q_lag_delta", lagDelta, Some(
      """SELECT event_id, user_id, event_type,
        |  floor((value - lag(value, 1) OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id)) * 100.0 + 0.5) / 100.0 AS delta
        |FROM events""".stripMargin)),
    QueryDef("q_window_ranks", windowRanks, Some(
      """SELECT event_id, event_type, user_id,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(value) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS first_user_value
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin)),
    QueryDef("q_salted_agg", saltedAggQ, Some(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q_salted_join", saltedJoinQ, Some(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q_range_join", rangeJoinQ, Some(
      """WITH tiers AS (
        |  SELECT CAST(i AS INTEGER) AS tier_id, i * 40.0 AS lo, i * 40.0 + 60.0 AS hi
        |  FROM range(0, 12) t(i))
        |SELECT tier_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN tiers ON value >= lo AND value < hi
        |GROUP BY tier_id""".stripMargin),
      headline = true),
    QueryDef("q_anti_join", antiJoin, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)""".stripMargin)),
    QueryDef("q_semi_join", semiJoin, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)""".stripMargin)),
    QueryDef("q_zorder_key", zorderKeyQ, Some(
      // ((x % m) + m) % m mirrors Spark's pmod (DuckDB % follows the
      // dividend's sign; ids are non-negative today, but the mirror
      // must not depend on that).
      s"""SELECT event_id,
         |  ${graft.operators.Layout.interleaveBitsSql(
               Seq("((user_id % 1024) + 1024) % 1024",
                 "((event_id % 1024) + 1024) % 1024"), bits = 10)} AS zkey
         |FROM events""".stripMargin)),
    QueryDef("q_hll_merge", hllMergeQ, Some(
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS merge_within_10pct
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q_theta_audience", thetaAudienceQ, Some(
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT
        |  CAST((SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS BIGINT) AS both_exact,
        |  CAST((SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p)) AS BIGINT) AS only_click_exact,
        |  CAST((SELECT count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM c)) AS BIGINT) AS only_purchase_exact,
        |  TRUE AS both_ok, TRUE AS only_click_ok, TRUE AS only_purchase_ok""".stripMargin)),
    QueryDef("q_hist_quantile", histQuantileQ, Some {
      // total=0 guard mirrors Spark's histogramQuantile NULL (without
      // it, cum=0 >= ceil(q*0)=0 matches bin 0 and yields 16.0).
      def p(q: String) =
        s"""CASE WHEN max(total) = 0 THEN NULL
           |       ELSE (min(CASE WHEN cum >= ceil($q * total) THEN bin END) + 1) * 16.0 END""".stripMargin
      s"""WITH binned AS (
         |  SELECT event_type,
         |    least(greatest(CAST(floor((value - 0.0) / 512.0 * 32) AS INTEGER), 0), 31) AS bin
         |  FROM events),
         |counts AS (SELECT event_type, bin, count(*) AS n FROM binned GROUP BY 1, 2),
         |grid AS (
         |  SELECT event_type, CAST(i AS INTEGER) AS bin
         |  FROM (SELECT DISTINCT event_type FROM events)
         |  CROSS JOIN (SELECT unnest(range(32)) AS i)),
         |hist AS (
         |  SELECT g.event_type, g.bin, COALESCE(c.n, 0) AS n
         |  FROM grid g LEFT JOIN counts c USING (event_type, bin)),
         |cum AS (
         |  SELECT event_type, bin,
         |    sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         |    sum(n) OVER (PARTITION BY event_type) AS total
         |  FROM hist)
         |SELECT event_type,
         |  0.0 + ${p("0.5")} AS p50,
         |  0.0 + ${p("0.95")} AS p95,
         |  0.0 + ${p("0.99")} AS p99
         |FROM cum GROUP BY event_type""".stripMargin
    }),
    QueryDef("q_manifest_pruned", manifestPrunedQ, Some(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 100 AND 200 AND value BETWEEN 50.0 AND 100.0
        |GROUP BY event_type""".stripMargin),
      headline = true),
    QueryDef("q_manifest_bloom", manifestBloomQ, Some(
      "SELECT event_id, event_type, value FROM events WHERE user_id = 73")),
    QueryDef("q_manifest_in", manifestInQ, Some(
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE user_id IN (73, 4, 250)""".stripMargin)),
    QueryDef("q_bloom_semi_join", bloomSemiJoinQ, Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
        |GROUP BY l_returnflag""".stripMargin),
      headline = true),
    QueryDef("q_distinct_types", distinctTypes, Some(
      "SELECT DISTINCT event_type FROM events")),
    QueryDef("q_line_series", lineSeries, Some(
      "SELECT event_type, ts, value, event_id FROM events ORDER BY event_type, ts, event_id")),
    QueryDef("q_rollup_revenue", rollupRevenue, Some(
      """SELECT r_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM region, nation, customer, orders, lineitem
        |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)),
    QueryDef("q_distinct_count", distinctCount, Some(
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q_pivot_avg", pivotAvg, Some {
      val cell = (t: String) =>
        s"""floor(CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
           |        / count(CASE WHEN event_type = '$t' THEN 1 END) * 100.0 + 0.5) / 100.0 AS "$t"""".stripMargin
      s"""SELECT user_id,
         |  ${Seq("click", "error", "purchase", "signup", "view").map(cell).mkString(",\n  ")}
         |FROM events GROUP BY user_id""".stripMargin
    }),
    QueryDef("q_asof_join", asofClickBeforePurchase, Some(
      """SELECT p.event_id AS purchase_id, p.user_id AS p_user, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin),
      headline = true),
    QueryDef("q_typed_boundary", typedBoundary, Some(
      "SELECT event_id, event_type, value * 2 AS value FROM events WHERE value > 30.0")),
    QueryDef("q6_forecast_revenue", forecastRevenue, Some(
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin)),
    QueryDef("q17_small_quantity", smallQuantityRevenue, Some(
      """WITH a AS (
        |  SELECT l_partkey AS pk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS yearly_loss
        |FROM lineitem JOIN a ON l_partkey = a.pk
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin)),
    QueryDef("q7_nation_volume", nationVolume, Some(
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin)),
    QueryDef("q2_top_acctbal_supplier", topAcctbalSupplier, Some(
      """WITH m AS (
        |  SELECT s_nationkey AS nk, max(s_acctbal) AS mx
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT s_suppkey, s_name, n_name, s_acctbal
        |FROM supplier
        |JOIN m ON s_nationkey = nk AND s_acctbal = mx
        |JOIN nation ON n_nationkey = s_nationkey""".stripMargin)),
    QueryDef("q20_heavy_suppliers", heavySuppliers, Some(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100)""".stripMargin)),
    QueryDef("q10_returned_revenue", returnedRevenue, Some(
      """SELECT c.c_custkey, c.c_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer c ON o_custkey = c.c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin)),
    QueryDef("q14_promo_share", promoShare, Some(
      """SELECT floor(
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) END) AS DOUBLE)
        |    * 100.0
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
        |    * 10000.0 + 0.5) / 10000.0 AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)),
    QueryDef("q19_brand_buckets", brandBuckets, Some(
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),
    QueryDef("q4_priority_check", priorityCheck, Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 365 DAY)
        |GROUP BY 1""".stripMargin)),
    QueryDef("q9_nation_profit", nationProfit, Some(
      """SELECT n_name, year(l_shipdate) AS o_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |GROUP BY 1, 2""".stripMargin),
      headline = true),
    QueryDef("q8_market_share", marketShare, Some(
      """SELECT year(o_orderdate) AS o_year,
        |  floor(
        |    CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
        |             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
        |    * 10000.0 + 0.5) / 10000.0 AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |GROUP BY 1""".stripMargin)),
    QueryDef("q11_important_parts", importantParts, Some(
      """SELECT l_partkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS part_value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) * 10000 >
        |  (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) FROM lineitem)""".stripMargin)),
    QueryDef("q12_priority_line_counts", priorityLineCounts, Some(
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1""".stripMargin)),
    QueryDef("q13_cust_distribution", custDistribution, Some(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey) t
        |GROUP BY 1""".stripMargin),
      headline = true),
    QueryDef("q15_top_supplier", topSupplier, Some(
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin)),
    QueryDef("q16_part_supplier_counts", partSupplierCounts, Some(
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin)),
    QueryDef("q18_large_orders", largeOrders, Some(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(q AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      headline = true),
    QueryDef("q21_waiting_supplier", waitingSupplier, Some(
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
      headline = true),
    QueryDef("q22_inactive_rich", inactiveRich, Some(
      """WITH s AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, count(*) AS cnt
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, s
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > tot
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin)),
    QueryDef("q_having_big_orders", bigOrders, Some(
      """SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_orderkey
        |HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120""".stripMargin)),
    QueryDef("q_scalar_subquery", aboveAvgSpenders, Some(
      """WITH spend AS (
        |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, spend FROM spend
        |WHERE spend > (SELECT sum(spend) / count(*) FROM spend)""".stripMargin)),
    QueryDef("q_sessionize", sessionize, Some(
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY user_id, session_id""".stripMargin),
      headline = true),
    QueryDef("q_funnel", funnelQ, Some(funnelSql), headline = true),
    QueryDef("q_series_similar", seriesSimilarQ, Some(
      s"""WITH ts_src AS (
         |  SELECT user_id AS key, ts AS start_ts, event_id AS tie,
         |    CAST(round(value * 100) AS BIGINT) AS v10
         |  FROM events),
         |${graft.operators.TimeSeries.similarDuckSql(
             "ts_src",
             query = Seq(1.0, 2.0, 4.0, 8.0, 8.0, 4.0, 2.0, 1.0),
             k = 20, scale = 2)}""".stripMargin)),
    QueryDef("q_match_pattern", matchPatternQ, Some(
      """WITH mp AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2,
        |    lead(ts, 2) OVER w AS e
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |hits AS (
        |  SELECT user_id, ts, event_id, e FROM mp
        |  WHERE event_type = 'click' AND t1 = 'view' AND t2 = 'purchase'
        |    AND epoch_us(e) - epoch_us(ts) <= CAST(3600 AS BIGINT) * 1000000),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
        |    min(ts) AS first_start
        |  FROM hits GROUP BY user_id),
        |firsts AS (
        |  SELECT user_id, e,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM hits)
        |SELECT a.user_id, a.n_matches, a.first_start, f.e AS first_end
        |FROM agg a JOIN firsts f ON f.user_id = a.user_id AND f.rn = 1""".stripMargin)),
    QueryDef("q_match_pattern_plus", matchPatternPlusQ, Some(
      """WITH mq_brk AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |              OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |mq_run AS (
        |  SELECT user_id, ts, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM mq_brk),
        |mq_runs AS (
        |  SELECT user_id, run, min(event_type) AS label,
        |    count(*) AS len, min(ts) AS first_ts, max(ts) AS last_ts
        |  FROM mq_run GROUP BY user_id, run),
        |mq_nb AS (
        |  SELECT user_id, run, label, len,
        |    lag(label) OVER w2 AS pl, lag(last_ts) OVER w2 AS pend,
        |    lead(label) OVER w2 AS nl, lead(first_ts) OVER w2 AS nstart
        |  FROM mq_runs
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY run)),
        |mq_hits AS (
        |  SELECT user_id, run, len, pend, nstart FROM mq_nb
        |  WHERE label = 'view' AND pl = 'click' AND nl = 'purchase'
        |    AND epoch_us(nstart) - epoch_us(pend)
        |        <= CAST(3600 AS BIGINT) * 1000000),
        |mq_agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
        |    min(pend) AS first_start
        |  FROM mq_hits GROUP BY user_id),
        |mq_first AS (
        |  SELECT user_id, nstart, len,
        |    row_number() OVER (PARTITION BY user_id ORDER BY run) AS rn
        |  FROM mq_hits)
        |SELECT a.user_id, a.n_matches, a.first_start,
        |  f.nstart AS first_end, CAST(f.len AS BIGINT) AS first_plus_len
        |FROM mq_agg a JOIN mq_first f ON f.user_id = a.user_id AND f.rn = 1""".stripMargin)),
    QueryDef("q_match_pattern_bounded", matchPatternBoundedQ, Some(
      """WITH mb_brk AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('view', 'error')
        |         THEN 'mb+' ELSE event_type END AS rk,
        |    CASE WHEN lag(CASE WHEN event_type IN ('view', 'error')
        |                       THEN 'mb+' ELSE event_type END) OVER w IS NULL
        |              OR lag(CASE WHEN event_type IN ('view', 'error')
        |                          THEN 'mb+' ELSE event_type END) OVER w
        |                 <> CASE WHEN event_type IN ('view', 'error')
        |                         THEN 'mb+' ELSE event_type END
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |mb_run AS (
        |  SELECT user_id, ts, rk,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM mb_brk),
        |mb_runs AS (
        |  SELECT user_id, run, min(rk) AS label,
        |    count(*) AS len, min(ts) AS first_ts, max(ts) AS last_ts
        |  FROM mb_run GROUP BY user_id, run),
        |mb_nb AS (
        |  SELECT user_id, run, label, len,
        |    lag(label) OVER w2 AS pl, lag(last_ts) OVER w2 AS pend,
        |    lead(label) OVER w2 AS nl, lead(first_ts) OVER w2 AS nstart
        |  FROM mb_runs
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY run)),
        |mb_hits AS (
        |  SELECT user_id, run, len, pend, nstart FROM mb_nb
        |  WHERE label = 'mb+' AND len BETWEEN 1 AND 3
        |    AND pl = 'click' AND nl = 'purchase'
        |    AND epoch_us(nstart) - epoch_us(pend)
        |        <= CAST(3600 AS BIGINT) * 1000000),
        |mb_agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
        |    min(pend) AS first_start
        |  FROM mb_hits GROUP BY user_id),
        |mb_first AS (
        |  SELECT user_id, nstart, len,
        |    row_number() OVER (PARTITION BY user_id ORDER BY run) AS rn
        |  FROM mb_hits)
        |SELECT a.user_id, a.n_matches, a.first_start,
        |  f.nstart AS first_end, CAST(f.len AS BIGINT) AS first_plus_len
        |FROM mb_agg a JOIN mb_first f ON f.user_id = a.user_id AND f.rn = 1""".stripMargin)),
    QueryDef("q_quantile_bins", quantileBinsQ, headline = true, oracle = Some(
      """WITH b AS (
        |  SELECT event_type,
        |    list_transform(quantile_cont(value, [0.25, 0.5, 0.75]),
        |      x -> floor(x * 10000.0 + 0.5) / 10000.0) AS bounds
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  CAST(len(list_filter(b.bounds, x -> e.value > x)) AS INTEGER) AS bin
        |FROM events e JOIN b USING (event_type)""".stripMargin)),
    QueryDef("q_approx_distinct", approxDistinct, Some(
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS est_within_10pct
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q_percentiles", percentiles, Some(
      """SELECT event_type,
        |  floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q_grouping_sets", groupingSets, Some(
      """SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id), ())""".stripMargin)),
    QueryDef("q_json_extract", jsonExtract, Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events""".stripMargin)),
    QueryDef("q_variant_shred", variantShred, Some(
      """WITH j AS (
        |  SELECT event_id,
        |    '{"meta":{"type":"' || event_type
        |      || '","k":' || json_extract_string(props, '$.k')
        |      || '},"ids":[' || event_id || ',' || user_id || ']}' AS js
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(js, '$.meta.type') AS vtype,
        |  CAST(json_extract(js, '$.meta.k') AS INTEGER) AS vk,
        |  CAST(json_extract(js, '$.ids[1]') AS BIGINT) AS vuser
        |FROM j""".stripMargin),
      headline = true),
    QueryDef("q_merge_upsert", mergeUpsert, Some(
      """WITH latest AS (
        |  SELECT user_id, op, new_bal FROM (
        |    SELECT user_id,
        |      CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op,
        |      value AS new_bal,
        |      row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1)
        |SELECT COALESCE(c.c_custkey, l.user_id) AS c_custkey,
        |  COALESCE(c.c_name, '(new)') AS name,
        |  CASE WHEN l.user_id IS NOT NULL THEN l.new_bal ELSE c.c_acctbal END AS bal
        |FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.user_id
        |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin),
      headline = true),
    QueryDef("q_expectations", expectationsQ, Some(expectationsOracle)),
    // the SAME oracle checks the observe-counter formulation —
    // observation ≡ aggregation is the property under test
    QueryDef("q_observe_qc", observeQcQ, Some(expectationsOracle)),
    QueryDef("q_transition_matrix", transitionMatrixQ, Some(
      """WITH tm_pairs AS (
        |  SELECT event_type AS from_label,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS to_label
        |  FROM events),
        |tm_n AS (
        |  SELECT from_label, to_label, CAST(count(*) AS BIGINT) AS n
        |  FROM tm_pairs WHERE to_label IS NOT NULL GROUP BY 1, 2),
        |tm_t AS (
        |  SELECT from_label, sum(n) AS tot FROM tm_n GROUP BY 1)
        |SELECT from_label, to_label, n,
        |  CAST(n * 1000000 // tot AS BIGINT) AS p_ppm
        |FROM tm_n JOIN tm_t USING (from_label)""".stripMargin)),
    QueryDef("q_fk_orphans", fkOrphansQ, Some {
      def rel(name: String, child: String, ck: String, parent: String,
          pk: String) =
        s"""SELECT '$name' AS relation,
           |  CAST(count(*) AS BIGINT) AS n_child,
           |  CAST(count(c.$ck) AS BIGINT) AS n_nonnull,
           |  CAST(sum(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           |  CASE WHEN count(c.$ck) = 0 THEN NULL
           |       ELSE CAST(sum(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL
           |         THEN 1 ELSE 0 END) * 1000000 // count(c.$ck) AS BIGINT)
           |  END AS orphan_ppm
           |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
           |  ON p.$pk = c.$ck""".stripMargin
      rel("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey") +
        "\nUNION ALL\n" +
        rel("orders.custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey") +
        "\nUNION ALL\n" +
        rel("customer.nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey")
    }),
    QueryDef("q_next_event", nextEventQ, Some(
      """SELECT user_id, event_id,
        |  lag(event_type, 3) OVER w || ' ' || lag(event_type, 2) OVER w
        |    || ' ' || lag(event_type, 1) OVER w AS context,
        |  event_type AS label
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |QUALIFY lag(event_type, 3) OVER w IS NOT NULL""".stripMargin)),
    QueryDef("q_pseudonymize", pseudonymizeQ, Some(
      s"""SELECT ${graft.operators.TextAnalysis
            .pseudonymizeDuckSql("user_id", "graft-corpus-v1")} AS user_token,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM events GROUP BY 1""".stripMargin)),
    QueryDef("q_gini", giniQ, Some(
      """WITH fa AS (SELECT event_type, count(*) AS f FROM events GROUP BY 1),
        |ga AS (
        |  SELECT 'event_type' AS col_name,
        |    CAST(sum(f) AS BIGINT) AS n_rows,
        |    floor((1.0 - CAST(sum(f * f) AS DOUBLE)
        |      / (CAST(sum(f) AS DOUBLE) * sum(f))) * 1000000.0 + 0.5)
        |      / 1000000.0 AS gini
        |  FROM fa),
        |fb AS (SELECT o_orderstatus, count(*) AS f FROM orders GROUP BY 1),
        |gb AS (
        |  SELECT 'o_orderstatus' AS col_name,
        |    CAST(sum(f) AS BIGINT) AS n_rows,
        |    floor((1.0 - CAST(sum(f * f) AS DOUBLE)
        |      / (CAST(sum(f) AS DOUBLE) * sum(f))) * 1000000.0 + 0.5)
        |      / 1000000.0 AS gini
        |  FROM fb)
        |SELECT * FROM ga UNION ALL SELECT * FROM gb""".stripMargin)),
    QueryDef("q_hist_drift", histDriftQ, Some(
      """WITH u AS (
        |  SELECT value, 'a' AS s FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT value, 'b' FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT least(greatest(CAST(floor((value - 0.0) / 512.0 * 32) AS INTEGER), 0), 31) AS bin,
        |    CAST(count(CASE WHEN s = 'a' THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(count(CASE WHEN s = 'b' THEN 1 END) AS BIGINT) AS n_b
        |  FROM u GROUP BY 1),
        |g AS (SELECT CAST(unnest(range(32)) AS INTEGER) AS bin),
        |j AS (
        |  SELECT g.bin, COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        |  FROM g LEFT JOIN c USING (bin)),
        |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j)
        |SELECT bin, n_a, n_b,
        |  floor(abs(CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
        |    * 100000000.0 + 0.5) / 100000000.0 AS contrib
        |FROM j CROSS JOIN t""".stripMargin)),
    QueryDef("q_pivot", pivotQ, Some(
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase
        |FROM events GROUP BY user_id""".stripMargin)),
    QueryDef("q_winsorize", winsorizeQ, Some(
      """WITH caps AS (
        |  SELECT event_type,
        |    floor(quantile_cont(value, 0.01) * 10000.0 + 0.5) / 10000.0 AS lo,
        |    floor(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0 AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type, value,
        |  least(greatest(value, lo), hi) AS value_w
        |FROM events e JOIN caps USING (event_type)""".stripMargin)),
    QueryDef("q_impute", imputeQ, Some(
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value
        |  FROM events),
        |f AS (
        |  SELECT event_type,
        |    CASE WHEN count(value) > 0 THEN
        |      floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(value) * 100.0 + 0.5) / 100.0
        |    END AS fill
        |  FROM ev GROUP BY 1)
        |SELECT event_id, e.event_type, value,
        |  COALESCE(value, fill) AS value_filled
        |FROM ev e JOIN f USING (event_type)""".stripMargin)),
    QueryDef("q_scd2", scd2Q, Some(
      """SELECT user_id, event_id, value,
        |  ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),
    QueryDef("q_ohlc_bars", ohlcBarsQ, Some(
      """WITH b AS (
        |  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
        |    ts, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM b)
        |SELECT event_type, bucket,
        |  min(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  min(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM r GROUP BY 1, 2""".stripMargin)),
    QueryDef("q_rolling_anomaly", rollingAnomalyQ, Some(
      """WITH w AS (
        |  SELECT user_id, event_id,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    sum(CAST(value AS DECIMAL(18,2))) OVER win AS roll_sum,
        |    CAST(count(value) OVER win AS BIGINT) AS roll_n
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id,
        |  CAST(roll_sum AS DOUBLE) AS roll_sum, roll_n,
        |  CASE WHEN roll_n = 0 THEN 0
        |       WHEN v * roll_n > roll_sum * 2 THEN 1 ELSE 0 END AS is_anomaly
        |FROM w""".stripMargin)),
    QueryDef("q_bucketed_join", bucketedJoinQ, Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag""".stripMargin)),
    QueryDef("q_fuzzy_join_prefix", fuzzyJoinPrefixQ, Some(
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin), headline = true),
    QueryDef("q_fuzzy_join_grams", fuzzyJoinGramsQ, Some(
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin), headline = true),
    QueryDef("q_fuzzy_join", fuzzyJoinQ, Some(
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin), headline = true),
    QueryDef("q_snapshot_diff", snapshotDiffQ, Some(
      """WITH cur AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM cur WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM cur WHERE o_orderkey % 11 = 0),
        |diff AS (
        |  SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'I'
        |         WHEN c.o_orderkey IS NULL THEN 'D'
        |         WHEN b.o_custkey IS DISTINCT FROM c.o_custkey
        |           OR b.o_orderstatus IS DISTINCT FROM c.o_orderstatus
        |           OR b.o_totalprice IS DISTINCT FROM c.o_totalprice THEN 'U'
        |    END AS change,
        |    concat_ws(',',
        |      CASE WHEN b.o_custkey IS DISTINCT FROM c.o_custkey THEN 'o_custkey' END,
        |      CASE WHEN b.o_orderstatus IS DISTINCT FROM c.o_orderstatus THEN 'o_orderstatus' END,
        |      CASE WHEN b.o_totalprice IS DISTINCT FROM c.o_totalprice THEN 'o_totalprice' END
        |    ) AS diffcols
        |  FROM base b FULL OUTER JOIN cur c ON b.o_orderkey = c.o_orderkey)
        |SELECT o_orderkey, change,
        |  CASE WHEN change = 'U' THEN diffcols ELSE '' END AS changed_cols
        |FROM diff WHERE change IS NOT NULL""".stripMargin),
      headline = true),
    QueryDef("q_profile", profileQ, Some {
      def mean(c: String) = graft.functions.Det.roundSql(
        s"CAST(sum(CAST($c AS DECIMAL(38,4))) AS DOUBLE) / CAST(count($c) AS DOUBLE)", 4)
      s"""SELECT 'o_custkey' AS col_name,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_s,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_s,
        |  CAST(NULL AS BIGINT) AS sum_len,
        |  ${mean("o_custkey")} AS mean
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  min(o_orderstatus), max(o_orderstatus),
        |  CAST(sum(length(o_orderstatus)) AS BIGINT),
        |  CAST(NULL AS DOUBLE)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderpriority) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  min(o_orderpriority), max(o_orderpriority),
        |  CAST(sum(length(o_orderpriority)) AS BIGINT),
        |  CAST(NULL AS DOUBLE)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderdate) AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |  CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR),
        |  CAST(NULL AS BIGINT),
        |  CAST(NULL AS DOUBLE)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_totalprice) AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |  CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR),
        |  CAST(NULL AS BIGINT),
        |  ${mean("o_totalprice")} AS mean
        |FROM orders""".stripMargin
    }),
    QueryDef("q_profile_approx", profileApproxQ, Some(
      Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate",
          "o_totalprice")
        .map(c =>
          s"""SELECT '$c' AS col_name,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  TRUE AS est_within_15pct
             |FROM orders""".stripMargin)
        .mkString("\nUNION ALL\n")), headline = true),
    QueryDef("q_profile_serve", profileServeQ, Some {
      // the q_profile exact stats per column, plus the TRUE flag the
      // Spark side computes in-plan from its (excluded) HLL estimate
      def mean(c: String) = graft.functions.Det.roundSql(
        s"CAST(sum(CAST($c AS DECIMAL(38,4))) AS DOUBLE) / CAST(count($c) AS DOUBLE)", 4)
      val specs = Seq( // (col, cast min/max, string sum_len, numeric mean)
        ("o_custkey", true, false, true),
        ("o_orderstatus", false, true, false),
        ("o_orderpriority", false, true, false),
        ("o_orderdate", true, false, false),
        ("o_totalprice", true, false, true))
      specs.map { case (c, castMm, strLen, num) =>
        val mm =
          if (castMm) s"CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s"
          else s"min($c) AS min_s, max($c) AS max_s"
        val sl = if (strLen) s"CAST(sum(length($c)) AS BIGINT)"
                 else "CAST(NULL AS BIGINT)"
        val mn = if (num) mean(c) else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS col_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $mm,
           |  $sl AS sum_len,
           |  $mn AS mean,
           |  TRUE AS est_within_15pct
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    }, headline = true),
    QueryDef("q_dense_ids", denseIdsQ, Some(
      """SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS id,
        |  o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders""".stripMargin)),
    QueryDef("q_gap_fill", gapFill, Some(
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |spine AS (
        |  SELECT user_id, day
        |  FROM (SELECT DISTINCT user_id FROM daily) CROSS JOIN days)
        |SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
        |  last_value(d.avg_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin),
      headline = true),
    QueryDef("q_topk_per_group", topKPerGroupQ, Some(
      """SELECT event_type, CAST(rn AS INTEGER) AS rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (
        |      PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |  FROM events) t WHERE rn <= 3""".stripMargin),
      headline = true),
    QueryDef("q_unpivot", unpivotQ, Some(
      """SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part""".stripMargin)))
}

/** Typed row for the `Dataset[T]` encoder-boundary query (P11). */
final case class Ev(event_id: Long, event_type: String, value: Double)
