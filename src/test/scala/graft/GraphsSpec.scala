package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Link-graph analytics: degree correctness, PageRank mass
  * conservation (incl. dangling redistribution), structural ranking,
  * and bit-determinism of the DECIMAL arithmetic under repartition.
  */
class GraphsSpec extends SparkSpecBase {

  import spark.implicits._

  test("degrees: in/out per node, zero-filled across the full outer") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graphs.degrees(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((2L, 0L)),  // pure source
      2L -> ((1L, 1L)),
      3L -> ((0L, 2L)))) // pure sink
  }

  test("pageRank: cycle converges to uniform; mass sums to ~1") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(cycle, iterations = 10)
      .select(col("node"), col("rank").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, got))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: star center outranks leaves; dangling center mass is redistributed") {
    // leaves 1..4 all point at 5; 5 has no out-edges (dangling)
    val star = (1L to 4L).map(_ -> 5L).toDF("src", "dst")
    val got = Graphs.pageRank(star, iterations = 8)
      .select(col("node"), col("rank").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(5L) > got(1L) * 3)
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // nothing leaked
  }

  test("pageRank: DECIMAL mass is bit-identical under different partitioning") {
    val edges = (1L to 200L)
      .flatMap(i => Seq(i -> ((i * 7 + 1) % 50), i -> ((i * 13 + 3) % 50)))
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graphs.pageRank(df, iterations = 4)
        .select(col("node"), col("rank").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(edges) === run(edges.repartition(13)))
  }
}
