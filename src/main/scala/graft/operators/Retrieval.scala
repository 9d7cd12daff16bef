package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: independently-ranked candidate lists (lexical
  * BM25, vector KNN, ...) fused with Reciprocal Rank Fusion — the
  * serving-path shape RAG and retrieval pipelines actually run
  * (Cormack et al., SIGIR'09: `score(d) = Σ_lists 1/(k0 + rank_d)`;
  * rank fusion needs no score calibration between retrievers, which
  * is why it wins over weighted score sums in practice).
  *
  * Scale shape: the RETRIEVERS are the distributed heavy path (BM25's
  * aggregates, KNN's bounded-heap top-k); what reaches fusion is one
  * n-row ranked list per retriever, so the outer joins and the rank
  * arithmetic are O(n·lists) regardless of corpus size.
  */
object Retrieval {

  /** Global top-n of a scored frame as an explicit ranked list
    * `(..., rank)` with rank 1-based by (`scoreCol` DESC, `idCol`
    * ASC — the deterministic tie-break every oracle needs).
    *
    * The cut happens FIRST via `orderBy(...).limit(n)` — Spark plans
    * that as `TakeOrderedAndProject` (per-partition partial top-n,
    * driver merge of n-row heads), NOT a full sort. Only the n
    * surviving rows pass through the rank-assigning window, so the
    * single-partition `WindowExec` is bounded by n, never by the
    * corpus (the unbounded-window anti-pattern the dedup plan pins
    * guard against does not apply to an n-row frame).
    */
  def topRanked(df: DataFrame, idCol: String, scoreCol: String, n: Int): DataFrame = {
    require(n >= 1, "topRanked: n must be positive")
    df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(n)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col(scoreCol).desc, col(idCol).asc))
        .cast("int"))
  }

  /** Reciprocal Rank Fusion over named ranked lists. Each input must
    * carry `(idCol, rank)`; output is one row per id seen in ANY list
    * with `<name>_rank` columns (null where absent) and
    * `rrf_score = Σ 1/(k0 + rank)` over the lists that ranked it.
    *
    * Determinism (and the DuckDB twin's exactness) comes from FIXED
    * summation order: the score is a left-fold of
    * `coalesce(1/(k0+rank), 0)` in LIST order, so the double
    * additions associate identically on every run, partitioning, and
    * engine — the same reason `Similarity.cosine` folds sequentially.
    * `1/(k0+rank)` is one correctly-rounded IEEE division of exact
    * integers, so both engines produce bit-identical addends.
    */
  def rrfFuse(
      lists: Seq[(String, DataFrame)],
      idCol: String,
      k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no ranked lists to fuse")
    require(lists.map(_._1).distinct.size == lists.size,
      "rrfFuse: list names must be distinct (they become rank columns)")
    val renamed = lists.map { case (nm, df) =>
      df.select(col(idCol), col("rank").as(s"${nm}_rank"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.map { case (nm, _) =>
      coalesce(lit(1.0) / (lit(k0) + col(s"${nm}_rank")), lit(0.0))
    }.reduce(_ + _) // left fold — fixed association in list order
    joined.withColumn("rrf_score", score)
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
    * greedily re-rank a BOUNDED retrieval shortlist trading relevance
    * against redundancy — pick argmax of
    * `λ·rel(i) − (1−λ)·max_{j∈selected} sim(i, j)` until `k` chosen.
    * The de-duplicating re-rank RAG serving stacks run between
    * retrieval and the context window.
    *
    * Division of labor at scale: producing the shortlist is the
    * distributed work ([[graft.operators.Similarity.binaryKnn]],
    * [[Keywords.bm25]], ...); MMR itself is O(k·n) SEQUENTIAL by
    * definition, so it runs on the n-row shortlist — the pairwise
    * sims are still computed distributed (n² bounded rows, rounded
    * through [[graft.functions.Det]]), and only `(id, rel)` pairs
    * plus the rounded sim triples reach the driver (never vectors).
    *
    * Engine-exact by construction: `rel` and `sim` arrive 6-dp
    * rounded, and with `lambda = 0.5` (the default) both products are
    * exact IEEE halvings, so every greedy comparison is reproducible
    * bit-for-bit in SQL — `q_mmr`'s recursive-CTE oracle replays the
    * loop selection for selection. Ties break to the smaller id.
    */
  def mmr(
      candidates: DataFrame,
      idCol: String,
      relCol: String,
      vecCol: String,
      k: Int,
      lambda: Double = 0.5,
      maxCandidates: Int = 1024): DataFrame = {
    require(k >= 1, "mmr: k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "mmr: lambda must be in [0, 1]")
    val spark = candidates.sparkSession
    val base = candidates.select(
      col(idCol).cast("long").as("id"), col(relCol).cast("double").as("rel"),
      col(vecCol).as("__v"))
    val n = base.count()
    require(n <= maxCandidates,
      s"mmr re-ranks a bounded shortlist; got $n rows > $maxCandidates — cut with the retriever first")
    val a = base.select(col("id").as("ia"), col("__v").as("va"))
    val b = base.select(col("id").as("ib"), col("__v").as("vb"))
    val sims = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        graft.functions.Det.round(
          graft.operators.Similarity.cosine(col("va"), col("vb")), 6).as("sim"))
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
          (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    val rels = base.select("id", "rel").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    var selected = Vector.empty[Long]
    var remaining = rels.toMap
    while (selected.size < math.min(k, rels.length)) {
      val pick = remaining.toSeq.map { case (id, rel) =>
        val redundancy =
          if (selected.isEmpty) 0.0
          else selected.map(s => sims((id, s))).max
        (id, lambda * rel - (1.0 - lambda) * redundancy)
      }.minBy[(Double, Long)] { case (id, score) => (-score, id) }._1
      selected :+= pick
      remaining -= pick
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case (id, i) => (id, i + 1) }
      .toDF(idCol, "mmr_rank")
  }

  /** Hard-negative mining for contrastive retrieval training: for
    * each query document, the corpus documents that score highest
    * under the query's OWN top-`m` TF-IDF keywords but are not the
    * query itself — lexically confusable non-positives, the negatives
    * that actually teach an embedding model (random negatives are too
    * easy; BM25-hard negatives are the standard mining recipe, e.g.
    * DPR, Karpukhin et al. 2020).
    *
    * Scale shape, stage by stage:
    *  - keyword selection: one corpus-wide TF-IDF pass
    *    ([[Keywords.tfIdfTopK]] — per-doc bounded window), filtered
    *    to the query set;
    *  - candidate scoring: the corpus token pass is SEMI-JOINED to
    *    the bounded query-term vocabulary (≤ |queries|·m tokens)
    *    before any aggregation, so only matching (doc, term) pairs
    *    survive the shuffle — the corpus never fans out by query;
    *  - per-term BM25 partials are Det-rounded into `DECIMAL(18,6)`
    *    so the per-(query, doc) sum is partition-order-independent;
    *  - the final cut is the bounded-heap top-k per query
    *    (ships ≤ k pairs per partition), never a corpus-wide window.
    *
    * Queries with no extractable keywords (empty text) emit no rows.
    * Output: `(query_id, neg_id, score, rank)`.
    */
  def hardNegatives(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryFilter: org.apache.spark.sql.Column,
      m: Int = 3,
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(m >= 1 && k >= 1, "hardNegatives: m and k must be positive")
    val qterms = Keywords.tfIdfTopK(docs, idCol, textCol, m)
      .filter(queryFilter)
      .select(col(idCol).as("query_id"), col("token"))
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val corpus = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("__t"))).as("total_dl")) // 1 row — broadcast
    val vocab = qterms.select("token").distinct() // bounded: ≤ |queries|·m
    val tf = toks
      .select(col("doc_id"), size(col("__t")).as("dl"),
        explode(col("__t")).as("token"))
      .join(broadcast(vocab), Seq("token")) // semi-join bound BEFORE the shuffle
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val perTerm = qterms
      .join(tf, Seq("token"))
      .join(broadcast(dfq), Seq("token"))
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs"))
      .withColumn("score_t", graft.functions.Det.round(
        col("n_docs").cast("double") / col("df") *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
        6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    val scores = perTerm
      .filter(col("query_id") =!= col("doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("score_t")).cast("double").as("score"))
    scores.groupBy("query_id")
      .agg(graft.functions.TopKExpr.topK(col("score"), col("doc_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__x")))
      .select(col("query_id"), col("__x.id").as("neg_id"),
        col("__x.score").as("score"), (col("__pos") + 1).cast("int").as("rank"))
  }
}
