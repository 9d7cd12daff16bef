package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical layout optimization: Z-order (Morton) clustering for
  * multi-dimensional data skipping.
  *
  * Why it matters at 100 TB: parquet readers skip row groups whose
  * column min/max excludes the predicate — but min/max is only tight
  * when the data is CLUSTERED on the filtered column. Sorting by one
  * column gives perfect skipping on it and none on any other; mapping
  * rows onto the Z-order curve interleaves the bits of several
  * columns, so rows close in ANY filtered dimension land close in the
  * layout and a 2-D range predicate prunes most files and row groups.
  * This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * expressed as plain Spark: a codegen'd key expression +
  * `repartitionByRange` + in-partition sort.
  *
  * The key math is pure integer bit arithmetic — deterministic and
  * exactly mirrorable in the DuckDB oracle.
  */
object Layout {

  /** Morton interleave: bit `i` of input `j` lands at output bit
    * `i·d + j` (d = number of inputs). Inputs must already be
    * non-negative ints below `2^bits` (see [[scaleToBits]]);
    * `bits · d ≤ 63` keeps the key in a signed long. The expansion is
    * `bits × d` shift/mask/or terms — all codegen'd integer ops, no
    * UDF.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleaveBits needs at least one column")
    require(bits * cols.size <= 63,
      s"zkey would overflow a long: $bits bits x ${cols.size} cols")
    val d = cols.size
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB mirror of [[interleaveBits]] over SQL column exprs —
    * generated from the same loop so the bit positions cannot drift.
    */
  def interleaveBitsSql(cols: Seq[String], bits: Int): String = {
    val d = cols.size
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map(i => s"(((($c) >> $i) & 1) << ${i * d + j})")
    }.mkString(" | ")
  }

  /** Linear-scale a numeric column into `[0, 2^bits)` given its
    * domain bounds — the normalization step before interleaving.
    * Degenerate domain (lo == hi) maps to 0.
    */
  def scaleToBits(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val top = (1L << bits) - 1
    when(span <= 0, lit(0L)).otherwise(
      least(
        floor((c.cast("double") - lo.cast("double")) / span * (top + 1))
          .cast("long"),
        lit(top)))
  }

  /** Cluster `df` on the Z-order curve over `zCols`: one stats pass
    * for per-column bounds (a bounded 2·|zCols|-scalar collect), then
    * range-partition + sort by the Morton key. Write the result to
    * parquet and a conjunctive range predicate over any subset of
    * `zCols` prunes at file AND row-group granularity (parquet
    * min/max on the original columns is tight because the layout
    * clusters them).
    *
    * The range exchange samples the key to pick balanced boundaries —
    * the standard Spark mechanism, no single-task sort anywhere.
    */
  def zorderBy(
      df: DataFrame,
      zCols: Seq[String],
      numPartitions: Int,
      bits: Int = 16): DataFrame = {
    require(zCols.nonEmpty, "zorderBy needs at least one column")
    val stats = df.agg(
      array(zCols.map(c => min(col(c)).cast("double")): _*).as("lo"),
      array(zCols.map(c => max(col(c)).cast("double")): _*).as("hi")).head()
    // No rows (or an all-null column) → no bounds → nothing to
    // cluster; return the input unchanged.
    if (stats.getSeq[Any](0).contains(null)) return df
    val lo = stats.getSeq[Double](0)
    val hi = stats.getSeq[Double](1)
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      scaleToBits(col(c), lit(lo(i)), lit(hi(i)), bits)
    }
    df.withColumn("__zkey", interleaveBits(scaled, bits))
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
