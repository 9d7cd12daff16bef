package graft

/** Text-analysis / dedup query surface over `documents` — filled in
  * alongside `graft.operators.{TextAnalysis, Dedup}`.
  */
object TextQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
