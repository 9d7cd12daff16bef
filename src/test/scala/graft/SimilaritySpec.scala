package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Cosine/KNN semantics: known-value cosine, top-k ordering, self
  * exclusion, LSH bucket locality.
  */
class SimilaritySpec extends SparkSpecBase {

  import spark.implicits._

  test("cosine: known values (orthogonal=0, identical=1, opposite=-1)") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0),
      (Seq(3f, 4f), Seq(4f, 3f), 24.0 / 25.0))
      .toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("cos"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("bruteForceKnn: correct neighbors, ranked, self excluded") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.9f, 0.1f, 0f)), // closest to 0
      (2L, Seq(0.5f, 0.5f, 0f)),
      (3L, Seq(0f, 0f, 1f)))     // orthogonal to 0
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceKnn(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "vec_id",
      "embedding", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L))
    assert(got.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
    assert(got.head.getAs[Double]("sim") > 0.99)
  }

  test("knn on corpus: k rows per query, sims within [-1,1], descending per query") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val knn = Similarity.bruteForceKnn(
      em.filter(col("vec_id") < 5), em, "vec_id", "vec_id",
      "embedding", "embedding", k = 5).cache()
    assert(knn.count() === 25)
    assert(knn.filter(col("sim") > 1.0 || col("sim") < -1.0).count() === 0)
    val perQuery = knn.groupBy("query_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).toSet
    assert(perQuery === Set(5L))
  }

  test("rhp bucket: identical vectors share a bucket, opposite vectors never do") {
    val df = Seq(
      (1L, Seq.fill(8)(1f)),
      (2L, Seq.fill(8)(1f)),
      (3L, Seq.fill(8)(-1f)))
      .toDF("vec_id", "v")
    val b = df.select(col("vec_id"), Similarity.rhpBucket(col("v"), 8, 16).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // all 16 sign bits flip for the negated vector
  }

  test("lshKnn (ANN scale path): high recall where true near-neighbors exist") {
    // Clustered corpus: 40 centers x 8 members with small noise —
    // members of a cluster sit at cos ~0.95+ of each other. (On
    // uniform-random vectors the honest recall of ANY sublinear ANN
    // is poor because 'nearest' neighbors are nearly orthogonal;
    // recall is measured where the concept is meaningful.)
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(40)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 40)
      (i.toLong, unit(c.map(x => x + 0.15 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") < 40)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    val lsh = pairs(Similarity.lshKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, dim = 16, nBits = 8, probeHamming = 1))
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("lshKnn multi-probe ladder: recall monotone in probeHamming; rung 2 reaches past rung 1") {
    val rnd = new scala.util.Random(29)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(40)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 40)
      (i.toLong, unit(c.map(x => x + 0.25 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") < 40)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    def rung(h: Int) = pairs(Similarity.lshKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, dim = 16, nBits = 10, probeHamming = h))
    val r = (0 to 2).map(h => (bf & rung(h)).size.toDouble / bf.size)
    assert(r(0) <= r(1) + 1e-9 && r(1) <= r(2) + 1e-9,
      s"recall ladder must be monotone: $r")
    assert(r(2) > r(0), s"rung 2 must reach neighbors rung 0 misses: $r")
    assert(r(2) >= 0.8, s"rung-2 recall=${r(2)}")
  }

  test("lshKnnMultiTable: more tables, more recall (vs single-table, same bits)") {
    val rnd = new scala.util.Random(13)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(30)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 240).map { i =>
      val c = centers(i % 30)
      (i.toLong, unit(c.map(x => x + 0.2 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") < 30)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    val one = pairs(Similarity.lshKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, dim = 16, nBits = 10, probeHamming = 0))
    val multi = pairs(Similarity.lshKnnMultiTable(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, dim = 16, nBits = 10, nTables = 6))
    val rOne = (bf & one).size.toDouble / bf.size
    val rMulti = (bf & multi).size.toDouble / bf.size
    assert(rMulti >= rOne, s"multi=$rMulti single=$rOne")
    assert(rMulti >= 0.7, s"multi=$rMulti")
  }

  test("ivfKnn (IVF scale path): high recall on clustered data, bounded probe cost") {
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 20)
      (i.toLong, unit(c.map(x => x + 0.12 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (index, centroids) = Similarity.ivfIndex(df, "vec_id", "embedding",
      nCentroids = 20, lloydIters = 2)
    assert(index.count() === 200)
    assert(index.select("vec_id").distinct().count() === 200)
    val qs = df.filter(col("vec_id") < 30)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    val ivf = pairs(Similarity.ivfKnn(qs, index, centroids, df,
      "vec_id", "vec_id", "embedding", "embedding", k = 5, nProbe = 3))
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("pqKnn (PQ scale path): codes compress to m small ints, re-ranked recall high") {
    val rnd = new scala.util.Random(17)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 20)
      (i.toLong, unit(c.map(x => x + 0.12 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (dim, m, ksub) = (16, 4, 16)
    val cb = Similarity.pqCodebook(df, "vec_id", "embedding", dim, m, ksub, lloydIters = 3)
    assert(cb.count() === (m * ksub).toLong)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb, dim, m)
    assert(codes.count() === 200)
    val shape = codes.select(size(col("codes")).as("n"),
      array_max(col("codes")).as("mx"), array_min(col("codes")).as("mn")).collect()
    assert(shape.forall(r => r.getInt(0) === m && r.getInt(1) < ksub && r.getInt(2) >= 0))

    val qs = df.filter(col("vec_id") < 30)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    val pq = pairs(Similarity.pqKnn(qs, codes, cb, df,
      "vec_id", "vec_id", "embedding", "embedding",
      dim, m, ksub, k = 5, shortlist = 20))
    val recall = (bf & pq).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")
    // re-ranked sims are EXACT cosines: every returned pair scores
    // identically to the brute-force value for that pair
    val bfSims = Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.pqKnn(qs, codes, cb, df, "vec_id", "vec_id",
      "embedding", "embedding", dim, m, ksub, k = 5, shortlist = 20)
      .collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        bfSims.get(key).foreach(s => assert(r.getDouble(2) === s))
      }
  }

  test("ivfPqKnn (IVF-PQ composed path): recall holds through both pruning levers") {
    val rnd = new scala.util.Random(23)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 20)
      (i.toLong, unit(c.map(x => x + 0.12 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (dim, m, ksub) = (16, 4, 16)
    val (index, cents) = Similarity.ivfIndex(df, "vec_id", "embedding",
      nCentroids = 20, lloydIters = 2)
    val cb = Similarity.pqCodebook(df, "vec_id", "embedding", dim, m, ksub, lloydIters = 2)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb, dim, m)
    val qs = df.filter(col("vec_id") < 30)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    val got = Similarity.ivfPqKnn(qs, index, cents, codes, cb, df,
      "vec_id", "vec_id", "embedding", "embedding",
      dim, m, ksub, k = 5, nProbe = 4, shortlist = 20)
    val recall = (bf & pairs(got)).size.toDouble / bf.size
    assert(recall >= 0.7, s"recall=$recall") // two pruning levers stacked
    // returned sims are EXACT: every pair also found by brute force
    // scores identically (the re-rank contract survives composition)
    val bfSims2 = Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.collect().foreach { r =>
      bfSims2.get((r.getLong(0), r.getLong(1)))
        .foreach(s => assert(r.getDouble(2) === s))
    }
    // deterministic under repartitioning (the quantizers are engine-exact)
    val again = Similarity.ivfPqKnn(qs.repartition(7), index, cents, codes, cb,
      df.repartition(5), "vec_id", "vec_id", "embedding", "embedding",
      dim, m, ksub, k = 5, nProbe = 4, shortlist = 20)
    assert(got.orderBy("query_id", "rank").collect().toSeq ===
      again.orderBy("query_id", "rank").collect().toSeq)
  }

  test("cosineNearDupPairs respects blocking and threshold") {
    val df = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.99f, 0.01f), 0),  // same block, near-dup of 1
      (3L, Seq(1f, 0f), 1),        // identical to 1 but different block
      (4L, Seq(0f, 1f), 0))        // same block, orthogonal
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", col("label"), 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("cosineNearDupPairs fails loudly on a hot block past maxBlockSize") {
    // 6 rows in block 0, 1 in block 1; cap at 4 → block 0 must trip
    // the guard BEFORE the quadratic self-join runs.
    val df = (0L to 6L).map(i => (i, Seq(1f, i.toFloat), if (i < 6) 0 else 1))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding", col("label"),
        0.95, maxBlockSize = 4).collect()
    }
    // the in-plan assert surfaces wrapped in task-failure layers
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("maxBlockSize=4"))
    assert(chain(e).contains("block '0'"))
    // same data under the cap is fine
    Similarity.cosineNearDupPairs(df, "vec_id", "embedding", col("label"),
      0.95, maxBlockSize = 6).collect()
  }

  test("cosineNearDupPairsAuto: hot block sub-blocks and produces pairs where the strict form asserts") {
    // One caller block of 24 spread-out vectors plus two planted
    // IDENTICAL-vector dup pairs, cap at 8: cosineNearDupPairs throws;
    // the auto form quantizer-splits the block and still surfaces both
    // planted pairs (identical vectors score identically against every
    // seed, so they co-locate deterministically).
    val spread = (0 until 24).map { i =>
      val a = i * 0.26
      (100L + i, Seq(math.cos(a).toFloat, math.sin(a).toFloat), 0)
    }
    val dups = Seq(
      (1L, Seq(0.6f, 0.8f), 0), (2L, Seq(0.6f, 0.8f), 0),
      (3L, Seq(-0.8f, 0.6f), 0), (4L, Seq(-0.8f, 0.6f), 0))
    val df = (spread ++ dups).toDF("vec_id", "embedding", "label")
    intercept[Exception] {
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding", col("label"),
        0.999, maxBlockSize = 8).collect()
    }
    val got = Similarity.cosineNearDupPairsAuto(df, "vec_id", "embedding",
        col("label"), 0.999, maxBlockSize = 8, fanout = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)),
      s"planted identical pairs must survive sub-blocking, got $got")
    // deterministic under repartitioning
    val again = Similarity.cosineNearDupPairsAuto(df.repartition(7), "vec_id",
        "embedding", col("label"), 0.999, maxBlockSize = 8, fanout = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === got)
  }

  test("cosineNearDupPairsAuto: degenerate identical-vector block stays ONE component via hub chain") {
    // 40 identical vectors — no similarity quantizer can split them, so
    // the terminal hash split + hub chain must keep the duplicate group
    // connected while never producing the 780-pair quadratic list.
    val df = (0L until 40L).map(i => (i, Seq(0.6f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cosineNearDupPairsAuto(df, "vec_id", "embedding",
      col("label"), 0.99, maxBlockSize = 8, fanout = 4, maxDepth = 2)
    val comp = graft.operators.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet === (0L until 40L).toSet,
      "every member of the degenerate block must appear in some pair")
    assert(comp.values.toSet === Set(0L),
      s"the duplicate group must collapse to one component, got ${comp.values.toSet}")
    assert(pairs.count() < 780L, "the quadratic pair list must not be materialized")
  }

  test("cosineNearDupPairsAuto: hub star survives hash-EMPTY buckets (round-13 fix)") {
    // Terminal hash split at a small cap: pmod of a hash makes no
    // occupancy promise, so some bucket indices are empty. The old
    // adjacent-index hub chain (`__bkt + 1`) silently broke at every
    // gap, splitting the degenerate duplicate group into several
    // components; the star to the min-bucket hub must not.
    val n = 40
    val cap = 4L // nb = ceil(40 * 2 / 4) = 20 buckets for 40 ids
    val df = (0L until n.toLong).map(i => (i, Seq(0.6f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
    // Precondition: the planted shape actually HAS a gap (otherwise
    // this spec would no longer cover the regression). The terminal
    // split buckets ids by pmod(xxhash64(idString), 20) — replay it.
    val occupied = spark.range(n)
      .select(pmod(xxhash64(col("id").cast("string")), lit(20L)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(occupied.size < 20,
      s"planted ids occupy all 20 buckets — regrow the fixture (got $occupied)")
    val pairs = Similarity.cosineNearDupPairsAuto(df, "vec_id", "embedding",
      col("label"), 0.99, maxBlockSize = cap, fanout = 4, maxDepth = 1)
    val comp = graft.operators.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet === (0L until n.toLong).toSet)
    assert(comp.values.toSet === Set(0L),
      s"group must stay ONE component across empty buckets, got ${comp.values.toSet}")
  }

  test("cosineNearDupPairsAuto: caller blocks containing '#'/'/' never merge with synthesized sub-blocks") {
    // Old naming appended "#<bkt>" / "/<seed>" directly, so a caller
    // block literally named like a synthesized child (here "b#0",
    // with vectors IDENTICAL to block b's) merged into b's bucket-0
    // sub-block and produced cross-block pairs. Names are now
    // derivation-injective (entry marker + length-delimited parents):
    // no pair may straddle the two caller blocks.
    val hot = (0L until 24L).map(i => (i, Seq(0.6f, 0.8f), "b"))
    val decoy = Seq((100L, Seq(0.6f, 0.8f), "b#0"), (101L, Seq(0.6f, 0.8f), "b#0"))
    val df = (hot ++ decoy).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cosineNearDupPairsAuto(df, "vec_id", "embedding",
        col("label"), 0.99, maxBlockSize = 8, fanout = 4, maxDepth = 1)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = pairs.filter { case (a, b) => (a < 100L) != (b < 100L) }
    assert(cross.isEmpty, s"caller blocks must never merge, got cross pairs $cross")
    // both blocks still dedup internally
    assert(pairs.contains((100L, 101L)))
    assert(pairs.exists { case (a, b) => a < 100L && b < 100L })
  }

  test("semDedup: planted near-duplicate groups collapse to min id; singletons survive") {
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    // 3 well-separated cluster centers; each contributes one
    // near-duplicate pair (tiny jitter) and one genuinely distinct
    // member (large jitter, below the 0.995 duplicate threshold).
    val centers = Array.fill(3)(Array.fill(16)(rnd.nextGaussian()))
    val rows = centers.zipWithIndex.flatMap { case (c, ci) =>
      val base = 10L * ci
      Seq(
        (base + 0, unit(c.map(x => x + 0.001 * rnd.nextGaussian()))),
        (base + 1, unit(c.map(x => x + 0.001 * rnd.nextGaussian()))), // dup of base+0
        (base + 2, unit(c.map(x => x + 0.8 * rnd.nextGaussian()))))   // distinct
    }.toSeq
    val df = rows.toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, "vec_id", "embedding",
        nClusters = 3, threshold = 0.995)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // each group's min id (0, 10, 20) survives; its jittered twin
    // (1, 11, 21) drops; the distinct member (2, 12, 22) survives.
    assert(kept === Set(0L, 2L, 10L, 12L, 20L, 22L), s"kept=$kept")
    // dropped ids really do have a kept near-duplicate: recompute
    val dropped = rows.map(_._1).toSet -- kept
    assert(dropped === Set(1L, 11L, 21L))
  }

  test("knnClassify: majority label wins; vote ties break by label asc") {
    import graft.operators.Similarity
    // query 0 at origin-ish; labels: two 1s very close, three 2s farther
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 9),   // the query (own label ignored)
      (1L, Seq(0.99f, 0.1f, 0f, 0f), 1),
      (2L, Seq(0.98f, 0.15f, 0f, 0f), 1),
      (3L, Seq(0.9f, 0.4f, 0f, 0f), 2),
      (4L, Seq(0.88f, 0.45f, 0f, 0f), 2),
      (5L, Seq(0.85f, 0.5f, 0f, 0f), 2),
      (6L, Seq(-1f, 0f, 0f, 0f), 3))  // far — outside k=5
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(
      rows.filter(col("vec_id") === 0L), rows.filter(col("vec_id") =!= 0L),
      "vec_id", "vec_id", "embedding", "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // k=5 nearest = ids 1..5 → labels 1×2 votes, 2×3 votes → label 2
    assert(got.toSeq === Seq((0L, 2, 3L)))
    // tie case: k=4 → 2 votes each → smaller label wins
    val tied = Similarity.knnClassify(
      rows.filter(col("vec_id") === 0L), rows.filter(col("vec_id").isin(1L, 2L, 3L, 4L)),
      "vec_id", "vec_id", "embedding", "embedding", "label", k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(tied.toSeq === Seq((1, 2L)))
  }

  test("knnClassify: string labels are legal and tie-break lexicographically") {
    import graft.operators.Similarity
    // two votes each for "spam" and "ham" → "ham" wins (label asc); a
    // string label must not fail analysis (tie-break negates only the
    // numeric vote count, never the label).
    val rows = Seq(
      (0L, Seq(1f, 0f), "?"),
      (1L, Seq(0.99f, 0.1f), "spam"),
      (2L, Seq(0.98f, 0.15f), "ham"),
      (3L, Seq(0.9f, 0.4f), "spam"),
      (4L, Seq(0.88f, 0.45f), "ham"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(
      rows.filter(col("vec_id") === 0L), rows.filter(col("vec_id") =!= 0L),
      "vec_id", "vec_id", "embedding", "embedding", "label", k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, "ham", 2L)))
  }

  test("randomProject: linear, bit-deterministic, sign-balanced") {
    import graft.operators.Embeddings
    val a = Seq.tabulate(32)(i => (i % 7) - 3)
    val b = Seq.tabulate(32)(i => (i % 5) - 2)
    val df = Seq(
      (1L, a), (2L, b),
      (3L, a.zip(b).map { case (x, y) => x + y }), // a + b
      (4L, a.map(-_)))                             // -a
      .toDF("id", "q")
    def proj(rep: Int) = df.repartition(rep)
      .select(col("id"), Embeddings.randomProject(col("q"), 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val p = proj(1)
    // linearity: proj(a+b) = proj(a)+proj(b); proj(-a) = -proj(a)
    assert(p(3L) === p(1L).zip(p(2L)).map { case (x, y) => x + y })
    assert(p(4L) === p(1L).map(-_))
    // bit-identical under different partitioning (exact integers)
    assert(proj(7) === p)
    // the sign hash is not degenerate: components differ
    assert(p(1L).distinct.size > 4, p(1L).mkString(","))
  }

  test("signBits64: known bit patterns; short arrays leave high bits clear") {
    import graft.operators.Embeddings
    val allPos = Seq.fill(64)(1.0f)
    val allNeg = Seq.fill(64)(-1.0f)
    val onlyBit0 = 1.0f +: Seq.fill(63)(-1.0f)
    val short2 = Seq(1.0f, -1.0f) // bits 2..63 missing -> clear
    val df = Seq((1L, allPos), (2L, allNeg), (3L, onlyBit0), (4L, short2))
      .toDF("id", "v")
    val got = df.select(col("id"), Embeddings.signBits64(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === -1L)        // all 64 bits set
    assert(got(2L) === 0L)
    assert(got(3L) === 1L)
    assert(got(4L) === 1L)
  }

  test("binaryKnn: identical vector ranks first; high recall on clustered data") {
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(40)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 40)
      (i.toLong, unit(c.map(x => x + 0.15 * rnd.nextGaussian())))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") < 40)
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5))
    val bin = Similarity.binaryKnn(qs, df, "vec_id", "vec_id",
      "embedding", "embedding", k = 5, shortlist = 32)
    val recall = (bf & pairs(bin)).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")

    // a planted exact duplicate of query 0 must be its rank-1 hit:
    // Hamming 0 survives any shortlist cut, cosine 1.0 wins re-rank
    val dup = Seq((999L, vecs(0)._2)).toDF("vec_id", "embedding")
    val withDup = df.union(dup)
    val top = Similarity.binaryKnn(
      withDup.filter(col("vec_id") === 0L), withDup,
      "vec_id", "vec_id", "embedding", "embedding", k = 1)
      .collect().head
    assert(top.getAs[Long]("neighbor_id") === 999L)
    assert(top.getAs[Double]("sim") === 1.0)
  }

  test("binaryKnn: bit-identical under repartitioning; no cartesian in the plan") {
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) = Similarity.binaryKnn(
      d.filter(col("vec_id") < 10), d,
      "vec_id", "vec_id", "embedding", "embedding", k = 5, shortlist = 32)
    val a = run(em).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    val b = run(em.repartition(17)).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    // the shortlist pass is a broadcast of tiny query signatures
    // against the corpus scan; the re-rank joins are broadcasts of
    // the bounded shortlist — a CartesianProduct anywhere means the
    // vectors got pair-joined, which cannot scale
    val plan = run(em).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // serving from a prebuilt sigIndex64 is the same query, bit-exact
    val idx = Similarity.sigIndex64(em, "vec_id", "embedding")
    val c = Similarity.binaryKnn(
      em.filter(col("vec_id") < 10), em,
      "vec_id", "vec_id", "embedding", "embedding", k = 5, shortlist = 32,
      corpusSigs = Some(idx))
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(c === a)
  }

  test("embedding sign-sigs stream through Hamming64Gate: later duplicate rejected") {
    import graft.operators.Embeddings
    val rnd = new scala.util.Random(23)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = (0 until 20).map(i =>
      (i.toLong, unit(Array.fill(64)(rnd.nextGaussian()))))
    // vec 21 duplicates vec 0 exactly (Hamming 0) but arrives in the
    // odd batch — the gate must reject it against batch-0 state
    val rows = (base :+ (21L, base(0)._2)).toDF("vec_id", "embedding")
    val sigs = rows.select(col("vec_id").as("doc_id"),
      Embeddings.signBits64(col("embedding")).as("sig"))
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_ebgate_spec").toString
    val a0 = graft.streaming.Hamming64Gate.acceptBatch(
      sigs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "sig", stateDir,
      maxHamming = 6)
    val a1 = graft.streaming.Hamming64Gate.acceptBatch(
      sigs.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "sig", stateDir,
      maxHamming = 6)
    val acc0 = a0.select("doc_id").collect().map(_.getLong(0)).toSet
    val acc1 = a1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acc0.contains(0L))
    assert(!acc1.contains(21L), s"duplicate accepted: $acc1")
  }
}
