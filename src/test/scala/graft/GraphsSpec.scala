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

  test("triangleCount: known tiny graphs — triangle, square+diagonal, star has none") {
    // K3: every node in exactly 1 triangle
    val k3 = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L).toDF("src", "dst")
    assert(Graphs.triangleCount(k3).as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // square + one diagonal: two triangles sharing the diagonal
    val sq = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L).toDF("src", "dst")
    assert(Graphs.triangleCount(sq).as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    // star: no closure anywhere — all zero (zero-fill pins the rows exist)
    val star = (2L to 6L).map(1L -> _).toDF("src", "dst")
    assert(Graphs.triangleCount(star).as[(Long, Long)].collect().toMap ===
      (1L to 6L).map(_ -> 0L).toMap)
  }

  test("triangleCount: direction, multiplicity, and self-loops don't change the count") {
    val messy = Seq(
      1L -> 2L, 2L -> 1L,          // both directions
      2L -> 3L, 2L -> 3L,          // duplicate
      3L -> 1L,
      2L -> 2L)                    // self-loop
      .toDF("src", "dst")
    assert(Graphs.triangleCount(messy).as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCount: K5 counts C(4,2)=6 per node; plan stays equi-joins") {
    val k5 = (for { i <- 1L to 5L; j <- 1L to 5L if i < j } yield i -> j)
      .toDF("src", "dst")
    val out = Graphs.triangleCount(k5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge/closure joins must stay equi-joins:\n${plan.take(800)}")
    assert(out.as[(Long, Long)].collect().toMap === (1L to 5L).map(_ -> 6L).toMap)
  }

  test("pageRank: exact scale-18 values on a dangling graph (oracle-chain pin)") {
    // Node 4 is dangling (dst-only) — every iteration redistributes its
    // mass, exercising the (d·m)/n rounding chain the testdata graph
    // never hits (all 500 doc-ids cover the mod-97 targets, so the
    // driver-gate corpus has no dangling node). Expected values are the
    // exact scale-18 integers from the fixed-point replay of Spark's
    // decimal semantics (divide at scale 39 HALF_UP, round to the
    // result-type scale, cast to 18) that pageRankDuckSql encodes —
    // itself verified against BigDecimal ground truth on 50 random
    // graphs. Agreement here pins the Spark plan to that same chain.
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L, 5L -> 1L)
      .toDF("src", "dst")
    val got = Graphs.pageRank(edges, iterations = 5)
      .select(col("node"), col("rank").cast("decimal(19,18)"))
      .collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).unscaledValue.toString).toMap
    assert(got === Map(
      1L -> "179347256240000000",
      2L -> "168224716390000000",
      3L -> "168224716390000000",
      4L -> "392008077940000000",
      5L -> "92195233040000000"))
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
