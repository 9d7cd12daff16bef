package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: Morton key math (pinned bit-for-bit), scaling
  * edges, and the payoff — a 2-D range predicate over a z-clustered
  * parquet layout touches fewer files than over a hash layout.
  */
class LayoutSpec extends SparkSpecBase {

  import spark.implicits._

  private def key2(a: Long, b: Long, bits: Int): Long =
    Seq((a, b)).toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), bits).as("z"))
      .head.getLong(0)

  test("Morton interleave: pinned small values") {
    // bit i of input j lands at i*2 + j
    assert(key2(0L, 0L, 4) === 0L)
    assert(key2(1L, 0L, 4) === 1L)
    assert(key2(0L, 1L, 4) === 2L)
    assert(key2(1L, 1L, 4) === 3L)
    assert(key2(2L, 0L, 4) === 4L)
    assert(key2(3L, 3L, 4) === 15L)
    assert(key2(15L, 15L, 4) === 255L)
  }

  test("interleave is a bijection on the bits x d grid") {
    val keys = (0L until 32L).flatMap(a => (0L until 32L).map(b => (a, b)))
      .toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), 5).as("z"))
      .as[Long].collect()
    assert(keys.distinct.length === 1024)
    assert(keys.min === 0L && keys.max === 1023L)
  }

  test("overflow guard rejects keys wider than a long") {
    intercept[IllegalArgumentException] {
      Layout.interleaveBits(Seq(col("a"), col("b")), 32)
    }
  }

  test("scaleToBits maps domain ends to 0 and 2^bits-1; degenerate to 0") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
    val scaled = df.select(
      Layout.scaleToBits(col("v"), lit(0.0), lit(100.0), 4).as("s"))
      .as[Long].collect().toSeq
    assert(scaled === Seq(0L, 8L, 15L))
    val degen = df.select(
      Layout.scaleToBits(col("v"), lit(7.0), lit(7.0), 4).as("s"))
      .as[Long].collect().toSet
    assert(degen === Set(0L))
  }

  test("zorderBy on empty input is a no-op, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Layout.zorderBy(empty, Seq("a", "b"), 4).count() === 0L)
  }

  test("2-D range query touches fewer files on z-order than hash layout") {
    // 64x64 uniform grid, 16 files per layout.
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("layout_z").toString
    val hDir = java.nio.file.Files.createTempDirectory("layout_h").toString
    Layout.zorderBy(grid, Seq("a", "b"), numPartitions = 16, bits = 6)
      .write.mode("overwrite").parquet(zDir)
    grid.repartition(16).write.mode("overwrite").parquet(hDir)

    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("a").between(8, 15) && col("b").between(16, 23))
        .select(input_file_name()).distinct().count()

    val (fz, fh) = (filesTouched(zDir), filesTouched(hDir))
    // An 8x8 box is 1/64 of the grid: the z-layout confines it to a
    // couple of curve segments; hash scatters it across ~all files.
    assert(fz < fh, s"z-order touched $fz files, hash touched $fh")
    assert(fh >= 12L) // hash really does scatter
    assert(fz <= 4L)  // z really does cluster
  }
}
