package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-graph analytics over an edge list — the authority half of a
  * crawl pipeline: [[TextAnalysis.extractLinks]] +
  * [[Urls.normalizeUrl]] produce the edges; these operators turn them
  * into per-page quality signals (in/out degree, PageRank) of the
  * kind web-corpus curation uses alongside the text-level gates.
  *
  * All arithmetic is DECIMAL: rank mass is exact under any
  * partition/merge order (a double PageRank differs run to run in the
  * low bits — unacceptable for a reproducible curation signal), so
  * the fixed-iteration result is bit-deterministic, spec-pinnable,
  * and stable across reruns at any parallelism.
  */
object Graphs {

  /** In/out degree per node from an edge list `(src, dst)` — two
    * count aggregates outer-joined on the node. Zero-degree sides
    * read as 0, so every node that appears anywhere gets a row.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Per-node triangle counts via DEGREE-ORIENTED wedge joins — the
    * classic scale-safe formulation (Cohen's MapReduce triangle
    * counting / Schank-Wagner forward algorithm): orient every
    * undirected edge from its lower-(degree, id) endpoint to the
    * higher, then a triangle `{a,b,c}` is counted EXACTLY ONCE as a
    * wedge `a→b, a→c` closed by the oriented edge `b→c`.
    *
    * Why orientation matters at scale: the naive wedge join explodes
    * on hubs — a degree-d node yields d² wedges, and real graphs'
    * heavy tails make that the whole job. Orienting by degree caps
    * every node's OUT-degree at O(√|E|) (a node with out-degree k has
    * k higher-degree neighbors, each of degree ≥ k, so k² ≤ 2|E|),
    * which bounds the wedge count at O(|E|^1.5) — the theoretical
    * optimum — with plain equi-joins, no special-casing.
    *
    * Input `(src, dst)`; self-loops dropped, direction and
    * multiplicity ignored. Output `(node, triangles)` zero-filled
    * over every endpoint. Ties in degree break by id so the
    * orientation (and the plan) is deterministic.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // Canonical undirected edge set: (lo, hi) by id, distinct.
    val und = Materialize(edges
      .filter(col("src") =!= col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct())
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orient u→v when (deg, id) of u < (deg, id) of v — struct
    // comparison gives the lexicographic (degree, id) order directly.
    // The HIGH endpoint's degree rides along (`db`): wedge pairs then
    // order their two far endpoints by the SAME (deg, id) key the
    // orientation used, which makes the closing edge's direction
    // known in advance — the closure below stays a pure equi-join
    // (an order-free OR match would plan a nested loop).
    val oriented = Materialize(und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
            struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"), col("du").as("db"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), col("e.db").as("db")))
    // Wedges from each low endpoint; far endpoints (x, y) ordered by
    // (deg, id), so the closing oriented edge is exactly x→y.
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
        struct(col("e1.db"), col("e1.b")) < struct(col("e2.db"), col("e2.b")))
      .select(col("e1.a").as("a"), col("e1.b").as("x"), col("e2.b").as("y"))
    val tris = Materialize(wedges.as("w").join(oriented.as("c"),
        col("c.a") === col("w.x") && col("c.b") === col("w.y"))
      .select(col("w.a").as("a"), col("w.x").as("x"), col("w.y").as("y")))
    val perNode = tris.select(col("a").as("node"))
      .unionAll(tris.select(col("x").as("node")))
      .unionAll(tris.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.select(col("node")).join(perNode, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  // Precision 19, scale 18 (ranks live in [0, 1]): a wider type would
  // trip Spark's precision-loss adjustment on division — at
  // DECIMAL(38,18) any quotient's scale collapses to 6, which is why
  // every arithmetic step below re-casts its result to RankType (the
  // cast is a deterministic HALF_UP at scale 18; with operand
  // precision this small no intermediate ever truncates below it).
  private val RankType = DecimalType(19, 18)

  /** Fixed-iteration PageRank with damping `d` (as a 2-dp DECIMAL
    * fraction `dNum/100`) and dangling-mass redistribution. Output:
    * `(node, rank)` with rank a DECIMAL(38,18); ranks sum to ~1
    * (exact up to division-rounding dust — spec-pinned).
    *
    * Scale shape per iteration: one equi-join of the rank frame onto
    * the degree-annotated edge list (both hash on src — the edge
    * frame is materialized ONCE up front, so the join re-reads a cut
    * plan, not the raw source), one aggregate shuffling (dst,
    * contribution) pairs with map-side partial sums (a hub page's
    * in-links combine per partition), and two 1-row aggregates
    * (dangling mass — broadcast back as a scalar). The iteration
    * frame is re-materialized and its predecessor released, exactly
    * the [[Dedup.connectedComponents]] loop discipline, so lineage
    * stays O(1) in the iteration count.
    *
    * Dangling nodes (no out-edges) redistribute their mass uniformly
    * — without this, total rank decays and the signal skews toward
    * well-linked clusters.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int,
      dNum: Int = 85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dNum >= 0 && dNum <= 100, "damping numerator in [0,100]")
    val spark = edges.sparkSession
    val d = lit(new java.math.BigDecimal(dNum).movePointLeft(2)).cast(RankType)
    val oneMinusD =
      lit(new java.math.BigDecimal(100 - dNum).movePointLeft(2)).cast(RankType)

    val nodes = Materialize(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list — no nodes to rank " +
      "(the 1/N init would divide by zero)")
    // node-count-sized; read every iteration by the dangling anti-join
    val outDeg = Materialize(edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg")))
    // (src, dst, out_deg) — the loop-invariant frame, computed once.
    val linked = Materialize(
      edges.join(outDeg, edges("src") === outDeg("node"))
        .select(col("src"), col("dst"), col("out_deg")))

    val init = (lit(1).cast(RankType) / lit(n)).cast(RankType)
    val base = (oneMinusD / lit(n)).cast(RankType)
    var ranks = Materialize(nodes.withColumn("rank", init))
    var i = 0
    while (i < iterations) {
      val contribs = linked
        .join(ranks, linked("src") === ranks("node"))
        .select(col("dst").as("node"),
          (col("rank") / col("out_deg")).cast(RankType).as("contrib"))
        .groupBy("node")
        .agg(sum(col("contrib")).cast(RankType).as("inbound"))
      // dangling mass: rank held by nodes with no out-edges
      val dangling = ranks.join(outDeg.select(col("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0).cast(RankType)).cast(RankType).as("m"))
        .head.getDecimal(0)
      val redistributed = (d * lit(dangling).cast(RankType) / lit(n))
        .cast(RankType)
      val prev = ranks
      ranks = Materialize(nodes
        .join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (base
            + (d * coalesce(col("inbound"), lit(0).cast(RankType))).cast(RankType)
            + redistributed).cast(RankType).as("rank")))
      Materialize.release(prev)
      i += 1
    }
    Materialize.release(nodes)
    Materialize.release(linked)
    Materialize.release(outDeg)
    ranks
  }
}
