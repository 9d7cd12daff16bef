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
}
