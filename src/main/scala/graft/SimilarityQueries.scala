package graft

/** Similarity-search query surface over `embeddings` — filled in
  * alongside `graft.operators.Similarity`.
  */
object SimilarityQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
