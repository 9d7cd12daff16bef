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
    val base = mmrGuardedBase(candidates, idCol, relCol, vecCol, maxCandidates)
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

  /** [[mmr]]'s shortlist frame with its bound folded INTO the plan
    * (the hot-block-guard discipline, round 12): a 1-row in-plan
    * count crossJoined back with an `assert_true` row predicate, so
    * no separate driver-side count job runs before the real work (the
    * old `base.count()` require was one extra job per call). The
    * count side prunes to the id column only. Package-private so the
    * spec can pin the guard's plan shape.
    */
  private[graft] def mmrGuardedBase(
      candidates: DataFrame,
      idCol: String,
      relCol: String,
      vecCol: String,
      maxCandidates: Int): DataFrame = {
    val raw = candidates.select(
      col(idCol).cast("long").as("id"), col(relCol).cast("double").as("rel"),
      col(vecCol).as("__v"))
    raw
      .crossJoin(broadcast(raw.select("id").agg(count(lit(1)).as("__n"))))
      .filter(assert_true(col("__n") <= lit(maxCandidates.toLong),
        concat(lit("mmr re-ranks a bounded shortlist; got "),
          col("__n").cast("string"),
          lit(s" rows > maxCandidates=$maxCandidates — cut with the" +
            " retriever first"))).isNull)
      .drop("__n")
  }

  /** The rank-`i` nDCG discount weights `1/log2(i+1)` for `i` in
    * `1..k`, and their prefix sums (the ideal DCGs for `1..k`
    * relevant documents). Computed ONCE on the driver and injected
    * into both the Spark plan and the DuckDB oracle as the SAME
    * double literals — the only transcendental (`log`) never runs
    * inside either engine, which is what makes nDCG oracle-exact
    * (libm log2 is not bit-portable across engines; a shared literal
    * is).
    */
  private[graft] def dcgWeights(k: Int): (Seq[Double], Seq[Double]) = {
    val w = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    (w, w.scanLeft(0.0)(_ + _).tail) // prefix sums: fixed-order exact
  }

  /** Retrieval-quality evaluation — the metrics a training pipeline
    * runs after every retriever/embedding change: per query,
    * `hits`@k, `rel_total`, precision@k, recall@k, reciprocal rank,
    * and nDCG@k (binary gains).
    *
    * `run` is a ranked result list `(queryIdCol, docIdCol, rankCol)`
    * (rank 1-based; rows with rank > k are ignored); `qrels` the
    * relevance judgments `(queryIdCol, docIdCol)`. Every query that
    * retrieved at least one row is evaluated.
    *
    * Engine-exact by construction — every metric is reproducible
    * bit-for-bit in SQL:
    *  - the per-query hit set is folded into ONE integer bitmask
    *    `Σ 2^(rank-1)` (order-independent integer aggregate — no
    *    partition-order-dependent double sum ever happens);
    *  - DCG re-expands the bitmask in a FIXED-ORDER projection
    *    `Σ bit_i · w_i` with the `w_i` shared literals from
    *    [[dcgWeights]] (left-fold association, exact 0/1 products);
    *  - ideal DCG is a CASE lookup of the precomputed prefix sums —
    *    never a second summation;
    *  - precision/recall/RR/nDCG are each ONE correctly-rounded IEEE
    *    division, then [[graft.functions.Det.round]].
    *
    * Scale shape: the run is bounded (|queries|·k rows) but qrels can
    * be corpus-sized — the join is a plain equi-join followed by two
    * hash aggregates with map-side partials; nothing is collected,
    * nothing windows over the corpus.
    */
  def rankEval(
      run: DataFrame,
      qrels: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 62, s"rankEval: k=$k outside [1, 62] (bitmask is one BIGINT)")
    val (w, idcgs) = dcgWeights(k)
    val r = run.select(col(queryIdCol).as("query_id"),
      col(docIdCol).as("__doc"), col(rankCol).cast("int").as("__rank"))
      .filter(col("__rank") <= k)
    val rel = qrels.select(col(queryIdCol).as("query_id"),
      col(docIdCol).as("__doc")).distinct()
    val marked = r.join(rel.withColumn("__rel", lit(1)),
      Seq("query_id", "__doc"), "left")
    val perQ = marked.groupBy("query_id").agg(
      sum(when(col("__rel").isNotNull,
        expr("shiftleft(CAST(1 AS BIGINT), __rank - 1)")).otherwise(lit(0L))).as("hitmask"),
      min(when(col("__rel").isNotNull, col("__rank"))).as("__first"))
    val relTotals = rel.groupBy("query_id")
      .agg(count(lit(1)).as("rel_total"))
    val dcg = (1 to k).foldLeft(lit(0.0)) { (acc, i) =>
      acc + (shiftright(col("hitmask"), i - 1).bitwiseAND(lit(1L)))
        .cast("double") * lit(w(i - 1))
    }
    val idcg = (1 to k).foldLeft(when(lit(false), 0.0)) { (acc, i) =>
      if (i < k) acc.when(least(col("rel_total"), lit(k.toLong)) === i, lit(idcgs(i - 1)))
      else acc.otherwise(lit(idcgs(i - 1)))
    }
    val det = graft.functions.Det
    perQ.join(relTotals, Seq("query_id"), "left")
      .withColumn("rel_total", coalesce(col("rel_total"), lit(0L)))
      .select(
        col("query_id"),
        bit_count(col("hitmask")).cast("int").as("hits"),
        col("rel_total"),
        det.round(bit_count(col("hitmask")).cast("double") / lit(k.toDouble), 6)
          .as("precision_k"),
        when(col("rel_total") === 0, lit(null).cast("double"))
          .otherwise(det.round(
            bit_count(col("hitmask")).cast("double") / col("rel_total").cast("double"), 6))
          .as("recall_k"),
        when(col("__first").isNull, lit(0.0))
          .otherwise(det.round(lit(1.0) / col("__first").cast("double"), 6))
          .as("rr"),
        when(col("rel_total") === 0, lit(null).cast("double"))
          .otherwise(det.round(dcg / idcg, 6)).as("ndcg_k"))
  }

  /** Macro-average of a [[rankEval]] table — the single-row summary a
    * retrieval dashboard tracks per embedding/retriever build. Means
    * are over the queries where the metric is DEFINED (recall/nDCG
    * skip zero-qrel queries — standard macro-averaging over evaluable
    * queries); `n_queries` counts all evaluated queries.
    *
    * Engine-exact mean discipline (the `Profile.exact` DOUBLE-mean
    * pattern): each 6-dp-rounded metric is cast to `DECIMAL(18,6)` and
    * summed in DECIMAL (partition-order-independent), the sum converts
    * once to double, ONE double division by the count, then
    * [[graft.functions.Det.round]].
    */
  def rankEvalMacro(perQuery: DataFrame): DataFrame = {
    val det = graft.functions.Det
    def mean(c: String) = det.round(
      sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double") /
        count(col(c)).cast("double"), 6).as(s"mean_$c")
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      mean("precision_k"), mean("recall_k"), mean("rr"), mean("ndcg_k"))
  }

  /** The DuckDB twin of [[rankEvalMacro]] over the `re_eval` CTE
    * emitted by [[rankEvalDuckSql]] — keep in lockstep. */
  def rankEvalMacroDuckSql: String = {
    val det = graft.functions.Det
    def mean(c: String) =
      det.roundSql(
        s"CAST(sum(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / CAST(count($c) AS DOUBLE)",
        6) + s" AS mean_$c"
    s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  ${mean("precision_k")},
       |  ${mean("recall_k")},
       |  ${mean("rr")},
       |  ${mean("ndcg_k")}
       |FROM re_eval""".stripMargin
  }

  /** The DuckDB twin of [[rankEval]] — keep in lockstep. `runCte`
    * must expose `(query_id, doc_id, rank)` (rank 1-based, ≤ k rows
    * per query beyond-k rows tolerated), `qrelsCte` must expose
    * DISTINCT `(query_id, doc_id)`. The nDCG weights are the SAME
    * driver-computed literals the Spark plan carries (shortest-repr
    * doubles round-trip to identical bits in any IEEE engine).
    */
  def rankEvalDuckSql(runCte: String, qrelsCte: String, k: Int): String = {
    require(k >= 1 && k <= 62, s"rankEvalDuckSql: k=$k outside [1, 62]")
    val (w, idcgs) = dcgWeights(k)
    val det = graft.functions.Det
    val dcg = (1 to k).map(i =>
      s"CAST((re_q.hitmask >> ${i - 1}) & 1 AS DOUBLE) * ${w(i - 1)}")
      .mkString("(0.0 + ", " + ", ")") // left-assoc, same fold as the plan
    val idcg = "CASE least(re_q.rel_total, " + k + ") " +
      (1 to k).map(i => s"WHEN $i THEN ${idcgs(i - 1)}").mkString(" ") + " END"
    s"""re_marked AS (
       |  SELECT r.query_id, r.rank,
       |    CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
       |  FROM $runCte r LEFT JOIN $qrelsCte q
       |    ON q.query_id = r.query_id AND q.doc_id = r.doc_id
       |  WHERE r.rank <= $k),
       |re_rel_totals AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS rel_total
       |  FROM $qrelsCte GROUP BY 1),
       |re_q AS (
       |  SELECT m.query_id,
       |    CAST(sum(CASE WHEN m.rel = 1
       |      THEN (CAST(1 AS BIGINT) << (m.rank - 1)) ELSE 0 END) AS BIGINT) AS hitmask,
       |    min(CASE WHEN m.rel = 1 THEN m.rank END) AS first_rel,
       |    COALESCE(any_value(t.rel_total), 0) AS rel_total
       |  FROM re_marked m LEFT JOIN re_rel_totals t USING (query_id)
       |  GROUP BY 1),
       |re_eval AS (
       |  SELECT query_id,
       |    CAST(bit_count(hitmask) AS INTEGER) AS hits,
       |    rel_total,
       |    ${det.roundSql(s"CAST(bit_count(re_q.hitmask) AS DOUBLE) / ${k.toDouble}", 6)} AS precision_k,
       |    CASE WHEN rel_total = 0 THEN NULL ELSE
       |      ${det.roundSql("CAST(bit_count(re_q.hitmask) AS DOUBLE) / CAST(re_q.rel_total AS DOUBLE)", 6)}
       |    END AS recall_k,
       |    CASE WHEN first_rel IS NULL THEN 0.0 ELSE
       |      ${det.roundSql("1.0 / CAST(re_q.first_rel AS DOUBLE)", 6)} END AS rr,
       |    CASE WHEN rel_total = 0 THEN NULL ELSE
       |      ${det.roundSql(s"($dcg) / ($idcg)", 6)} END AS ndcg_k
       |  FROM re_q)""".stripMargin
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

  /** Late-interaction re-ranking (MaxSim over binary token
    * signatures — the quantized form of ColBERT scoring, Khattab &
    * Zaharia, SIGIR '20): every DISTINCT token of query and document
    * embeds as its 64-bit [[TextAnalysis.tokenHash64]] signature, a
    * token-pair similarity is the ±1-component dot product — which
    * for sign vectors is exactly `64 − 2·hamming` — and
    * `score(q, d) = Σ_{t∈q} max_{u∈d} (64 − 2·ham(t, u)) / (64·|q|)`
    * ∈ [−1, 1]. Integer end-to-end until one final double division,
    * so the whole path is engine-exact (the DuckDB twin replays it
    * hash-exactly — no float dot products anywhere).
    *
    * Two stages, the shape late-interaction serving actually deploys
    * (coarse candidate generation, token-level interaction only on
    * the survivors):
    *
    *  1. '''Shortlist''': document-level [[Dedup.simhash64]]
    *     signatures, Hamming-ranked per query. The query signature
    *     set is broadcast (caller-bounded — the serving contract,
    *     like [[mmr]]'s shortlist) against a linear scan of corpus
    *     signatures; the `shortlist` closest per query survive via
    *     the bounded-heap [[graft.functions.TopKExpr]] (score
    *     `64 − hamming` makes TopK's (score desc, id asc) order
    *     (hamming asc, id asc) — partials ship ≤ `shortlist` ids per
    *     partition, no corpus-wide window).
    *  2. '''MaxSim''': the shortlist joins back to per-token
    *     signatures; interaction work is bounded by
    *     |queries| · `shortlist` · |q-tokens| · |d-tokens| — the
    *     caller's knobs, never corpus-quadratic. The per-query-token
    *     maximum and the per-pair sum are two keyed aggregates
    *     (map-side partials absorb token skew); the final cut is the
    *     same bounded heap.
    *
    * Query docs never match themselves (id equality excluded, as in
    * the KNN family); docs with no tokens drop from both sides (no
    * interaction to score). Output: `(query_id, doc_id, maxsim 6-dp,
    * rank ≤ topK by maxsim DESC then doc_id)`.
    */
  def maxSimRerank(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qIdCol: String,
      qTextCol: String,
      shortlist: Int = 32,
      topK: Int = 5): DataFrame = {
    require(shortlist >= topK,
      s"maxSimRerank: shortlist ($shortlist) must be >= topK ($topK)")
    def prep(df: DataFrame, id: String, text: String, out: String) =
      Materialize(df
        .select(col(id).as(out),
          array_distinct(TextAnalysis.tokens(col(text))).as("__toks"),
          Dedup.simhash64(col(text)).as("__sig"))
        .filter(size(col("__toks")) > 0))
    val d = prep(corpus, idCol, textCol, "doc_id")
    val q = prep(queries, qIdCol, qTextCol, "query_id")

    val short = d.select(col("doc_id"), col("__sig"))
      .crossJoin(broadcast(q.select(col("query_id"), col("__sig").as("__qsig"))))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        (lit(64) - bit_count(col("__sig").bitwiseXOR(col("__qsig"))))
          .cast("double").as("__bscore"))
      .groupBy("query_id")
      .agg(graft.functions.TopKExpr.topK(
        col("__bscore"), col("doc_id"), shortlist).as("__top"))
      .select(col("query_id"), explode(col("__top.id")).as("doc_id"))

    val dTok = d.select(col("doc_id"), explode(col("__toks")).as("__t"))
      .select(col("doc_id"), TextAnalysis.tokenHash64(col("__t")).as("__th"))
    val qTok = q.select(col("query_id"), size(col("__toks")).as("__nq"),
        explode(col("__toks")).as("__t"))
      .select(col("query_id"), col("__nq"),
        TextAnalysis.tokenHash64(col("__t")).as("__qh"))

    val scored = short
      .join(dTok, Seq("doc_id"))
      .join(qTok, Seq("query_id"))
      .groupBy(col("query_id"), col("doc_id"), col("__nq"), col("__qh"))
      .agg(max(lit(64) - lit(2) *
        bit_count(col("__th").bitwiseXOR(col("__qh")))).as("__m"))
      .groupBy(col("query_id"), col("doc_id"), col("__nq"))
      .agg(sum(col("__m")).as("__s"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.Det.round(
          col("__s").cast("double") / (col("__nq") * lit(64)).cast("double"),
          6).as("maxsim"))
    scored.groupBy("query_id")
      .agg(graft.functions.TopKExpr.topK(
        col("maxsim"), col("doc_id"), topK).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__x")))
      .select(col("query_id"), col("__x.id").as("doc_id"),
        col("__x.score").as("maxsim"),
        (col("__pos") + 1).cast("int").as("rank"))
  }
}
