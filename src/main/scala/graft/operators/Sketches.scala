package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch pattern for distinct counting at warehouse scale.
  *
  * The 100 TB problem: "distinct users per X" dashboards re-scan the
  * full history on every refresh. The sketch answer: aggregate each
  * ingest slice ONCE into a per-(group, slice) HLL sketch — a few KB
  * regardless of slice size — persist the sketches as a table, and
  * answer queries by merging sketches (milliseconds over the tiny
  * sketch table, no history re-scan). Union of HLL sketches is exact
  * sketch algebra: merging slice sketches yields byte-wise the same
  * estimator state as sketching the whole history directly, so the
  * serving path loses nothing vs the direct aggregate.
  *
  * Built on Spark's Datasketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`) — codegen-registered
  * aggregates with mergeable partials, the same machinery that makes
  * them associative across partitions.
  */
object Sketches {

  /** One HLL sketch per (groupCols..., sliceCol) cell — the build
    * pass to run per ingest slice (or once over history, grouped by
    * slice) and persist. `lgK` trades size for accuracy (default 12 ≈
    * 2% rel. err, ~4 KB per dense sketch).
    */
  def hllPartials(
      df: DataFrame,
      groupCols: Seq[String],
      sliceCol: String,
      valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge persisted partials down to per-group estimates: the
    * serving-path query. Scans only sketches.
    */
  def hllMerge(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))
}
