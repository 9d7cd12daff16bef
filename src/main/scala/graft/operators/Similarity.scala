package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set against the corpus, so the corpus never shuffles for the
  * scoring pass. Scale path: LSH / IVF bucketing so only a fraction
  * of the corpus is scored per query.
  */
object Similarity {

  /** Cosine similarity of two equal-length vectors, computed in
    * double with ascending element order — sequential order makes the
    * result bit-reproducible across engines and partitionings.
    * Runs in the native [[graft.functions.CosineSimExpr]] (one
    * generated-code pass for dot + both norms; the composed
    * `aggregate(zip_with(...))` form costs three traversals with
    * boxed lambda dispatch).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineExpr.cosine(a, b)

  /** Brute-force cosine top-k: for each query vector, the `k` nearest
    * corpus vectors. The query side is broadcast (it must be small —
    * that is the contract of brute force); scoring happens inside the
    * corpus scan stage. Ranking uses rounded similarity (6 dp) with
    * id tiebreak so results are engine- and partitioning-stable.
    *
    * The per-query top-k is a window `row_number`; the shuffle it
    * costs carries only (query_id, corpus_id, sim) triples, never
    * vectors.
    */
  def bruteForceKnn(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      queryVec: String,
      corpusVec: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val joined = c.crossJoin(broadcast(q))
    val scored = (if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id")) else joined)
      .select(col("query_id"), col("neighbor_id"),
        Det.round(cosine(col("__qv"), col("__cv")), 6).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Per-query top-k via the bounded-heap aggregate
    * ([[graft.functions.TopKExpr]]): partial aggregation ships at
    * most k pairs per (partition, query) — a window `row_number`
    * would shuffle and sort every scored pair. Output order/ties are
    * identical to `Window.orderBy(sim.desc, id.asc)`.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKExpr.topK(col("sim"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col("query_id"), col("__t.id").as("neighbor_id"),
        col("__t.score").as("sim"), (col("__pos") + 1).cast("int").as("rank"))

  /** Random-hyperplane LSH bucket for a vector: `nBits` sign bits of
    * dot products with deterministic pseudo-random hyperplanes
    * (splitmix64-derived ±1 components — cheap, no stored planes).
    * Vectors in the same bucket are near-duplicate candidates.
    */
  def rhpBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val planes = rhpPlanes(dim, nBits)
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val comps = array(plane.map(s => lit(s.toDouble)): _*)
      val dot = aggregate(
        zip_with(vec, comps, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic ±1 hyperplane components (splitmix64; `seed`
    * selects the hash table — each LSH table uses independent planes).
    */
  private[graft] def rhpPlanes(dim: Int, nBits: Int, seed: Long = 0x243F6A8885A308D3L): Seq[Seq[Int]] = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Seq.fill(nBits)(Seq.fill(dim)(if (next() >= 0) 1 else -1))
  }

  /** Seeded variant of [[rhpBucket]] for multi-table LSH. */
  def rhpBucketSeeded(vec: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val planes = rhpPlanes(dim, nBits, seed)
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val comps = array(plane.map(s => lit(s.toDouble)): _*)
      val dot = aggregate(
        zip_with(vec, comps, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table LSH top-k — the standard recall lever: `nTables`
    * independent hash tables; a corpus vector is a candidate if it
    * collides with the query in ANY table (collision prob
    * `1-(1-p^nBits)^nTables`). Candidate generation stays an
    * equi-join on (table, bucket) with the query probes broadcast;
    * pairs dedup before scoring so each candidate is scored once.
    */
  def lshKnnMultiTable(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      queryVec: String,
      corpusVec: String,
      k: Int,
      dim: Int,
      nBits: Int = 8,
      nTables: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    def buckets(vec: Column) = array((0 until nTables).map { t =>
      struct(lit(t).as("t"),
        rhpBucketSeeded(vec, dim, nBits, 0x9E3779B97F4A7C15L * (t + 1)).as("b"))
    }: _*)
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .withColumn("__tb", explode(buckets(col("__cv"))))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("__tb", explode(buckets(col("__qv"))))
    val joined = c.join(broadcast(q), Seq("__tb")).drop("__tb")
    val cand = (if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id")) else joined)
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      Det.round(cosine(col("__qv"), col("__cv")), 6).as("sim"))
    topKPerQuery(scored, k)
  }

  /** The ANN scale path: LSH-bucketed top-k. The corpus is bucketed
    * once by [[rhpBucket]]; each query probes its own bucket plus all
    * buckets within Hamming distance `probeHamming` (bit flips), so
    * only ~`(1+nBits)/2^nBits` of the corpus is scored per query
    * instead of all of it. Candidate generation is an equi-join on
    * the bucket id — at 100 TB the corpus bucketing is a one-off
    * (and persistable); per-query work is bounded by bucket size.
    *
    * Trades recall for cost like any ANN index; [[bruteForceKnn]] is
    * the exact baseline the recall is measured against in the specs.
    */
  def lshKnn(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      queryVec: String,
      corpusVec: String,
      k: Int,
      dim: Int,
      nBits: Int = 8,
      probeHamming: Int = 1,
      excludeSelf: Boolean = true): DataFrame = {
    require(probeHamming <= 1, "multi-probe beyond Hamming 1 not implemented")
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .withColumn("__bucket", rhpBucket(col("__cv"), dim, nBits))
    val q0 = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("__b0", rhpBucket(col("__qv"), dim, nBits))
    val probes =
      if (probeHamming == 0) q0.withColumn("__bucket", col("__b0"))
      else q0.withColumn("__bucket",
        explode(concat(array(col("__b0")),
          transform(sequence(lit(0), lit(nBits - 1)),
            i => col("__b0").bitwiseXOR(call_function("shiftleft", lit(1L), i))))))
    val joined = c.join(broadcast(probes.drop("__b0")), Seq("__bucket"))
    val scored = (if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id")) else joined)
      .select(col("query_id"), col("neighbor_id"),
        Det.round(cosine(col("__qv"), col("__cv")), 6).as("sim"))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) index: a coarse quantizer of `nCentroids`
    * cluster centers (deterministic pseudo-random init: the k corpus
    * vectors with the smallest `xxhash64(vec_id)` — a distributed
    * TakeOrdered, bounded k per partition, no global window — refined
    * by `lloydIters` rounds of Lloyd's algorithm: each round is one
    * broadcast-scored assignment plus one element-wise mean
    * aggregation), and the corpus partitioned by nearest centroid.
    * Centroid ids are the seed vectors' own ids (unique, not dense —
    * they are only ever used as join/group keys). Build is a one-off,
    * persistable at scale.
    */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      lloydIters: Int = 2): (DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    var centroids = c
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id").as("centroid_id"),
        transform(col("v"), x => x.cast("double")).as("cv"))
    var iter = 0
    while (iter < lloydIters) {
      val assigned = assign(c, centroids)
      // Element-wise mean per cluster: explode positions, average,
      // rebuild the array ordered by position.
      centroids = assigned
        .join(c, "vec_id")
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"), transform(col("pm"), p => p.getField("m")).as("cv"))
      iter += 1
    }
    (assign(c, centroids), centroids)
  }

  /** Persist / load an IVF index (assignments + centroids) — the
    * build is a one-off at scale; queries reuse the stored cells.
    */
  def saveIvfIndex(index: DataFrame, centroids: DataFrame, path: String): Unit = {
    index.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/assignments")
    centroids.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/centroids")
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/assignments"), spark.read.parquet(s"$path/centroids"))

  /** Nearest centroid per corpus vector (broadcast-scored). */
  private def assign(c: DataFrame, centroids: DataFrame): DataFrame =
    c.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"), cosine(col("v"), col("cv")).as("s"))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"), struct(col("s"), -col("centroid_id"))).as("centroid_id"))

  /** IVF-probed top-k: score each query against the centroids, keep
    * the `nProbe` best cells, then score only corpus vectors assigned
    * to those cells — candidate generation is an equi-join on
    * centroid_id, per-query work bounded by the probed cells' sizes.
    */
  def ivfKnn(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      queryVec: String,
      corpusVec: String,
      k: Int,
      nProbe: Int = 3,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("__qv"), col("centroid_id"),
        cosine(col("__qv"), col("cv")).as("cs"))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cs").desc, col("centroid_id"))))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    val cand = index.join(broadcast(probes), Seq("centroid_id"))
      .join(corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("__cv")), Seq("vec_id"))
    val scored = (if (excludeSelf) cand.filter(col("query_id") =!= col("vec_id")) else cand)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Det.round(cosine(col("__qv"), col("__cv")), 6).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Semantic dedup (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings, then drop
    * near-duplicates WITHIN each cluster — the clustering bounds the
    * pairwise stage to cluster-sized blocks, so the corpus never
    * self-joins globally (the same blocking discipline as every other
    * dedup path here; cluster count is the block-size knob).
    *
    * Keeper semantics match the engine's text dedup
    * ([[Dedup.dropNearDuplicates]]): cosine-≥-threshold pairs feed
    * [[Dedup.connectedComponents]] and each component keeps its
    * minimum id — deterministic given the (deterministic) Lloyd
    * clustering, and consistent with the rest of the dedup family
    * rather than the paper's random-keeper choice.
    *
    * Returns the kept rows of `corpus` (schema unchanged).
    */
  def semDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      threshold: Double,
      lloydIters: Int = 2): DataFrame = {
    val (assignments, _) = ivfIndex(corpus, idCol, vecCol, nClusters, lloydIters)
    val clustered = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(assignments, "vec_id")
    val pairs = cosineNearDupPairs(clustered, "vec_id", "v", col("centroid_id"), threshold)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
    corpus.join(losers, corpus(idCol) === losers("id"), "left_anti")
  }

  /** Embedding near-duplicate pairs: LSH-bucket (or any blocking
    * column) then exact cosine ≥ threshold within buckets — the
    * equi-join-on-bucket discipline again: no global cross product.
    */
  def cosineNearDupPairs(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: Column,
      threshold: Double): DataFrame = {
    // Deliberately NOT checkpointed (unlike the Dedup self-joins):
    // the per-side work here is just a scan + a cheap block column,
    // and materializing a full copy of the vector corpus costs about
    // what the second scan does — measured neutral-to-negative.
    val v = vecs.select(col(idCol).as("vec_id"), col(vecCol).as("v"), blockCol.as("block"))
    v.as("a").join(v.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Det.round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
