package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Mergeable HLL sketches: merge-vs-direct equivalence (the property
  * that makes persisted partials lossless), accuracy vs exact
  * distinct, and bounded sketch size.
  */
class SketchesSpec extends SparkSpecBase {

  import spark.implicits._

  // 5 groups x 20 slices, overlapping member sets across slices.
  private def df = (1L to 20000L).map { i =>
    (s"g${i % 5}", (i % 20).toInt, i % 1777)
  }.toDF("grp", "slice", "member")

  test("merging slice sketches equals sketching the history directly") {
    val merged = Sketches.hllMerge(
      Sketches.hllPartials(df, Seq("grp"), "slice", "member"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val direct = df.groupBy("grp")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("member"), lit(12)))
        .as("approx_distinct"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
    assert(merged.size === 5)
  }

  test("estimates land within HLL error of the exact distinct counts") {
    val est = Sketches.hllMerge(
      Sketches.hllPartials(df, Seq("grp"), "slice", "member"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("grp").agg(count_distinct(col("member")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.05,
        s"$g: est ${est(g)} vs exact $n")
    }
  }

  test("a partial sketch is KBs regardless of slice row count") {
    val sizes = Sketches.hllPartials(df, Seq("grp"), "slice", "member")
      .select(length(col("sketch")).as("len")).as[Int].collect()
    // dense lgK=12 HLL serializes at ~4.1 KB, row count notwithstanding
    assert(sizes.nonEmpty && sizes.forall(_ <= 8192))
  }
}
