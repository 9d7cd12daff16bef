package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation over the
  * testdata tables plus (where SQL-expressible) a DuckDB oracle that
  * must hash-match it. `headline` marks queries timed by [[Bench]].
  *
  * Column names are part of the contract: the driver sorts columns by
  * name before hashing, so every computed column is aliased
  * identically in the Spark plan and the oracle SQL.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Aggregates every query family exposed through [[SparkEntry]]. */
object QueryCatalog {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ TextQueries.defs ++ SimilarityQueries.defs ++
      StreamingQueries.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
