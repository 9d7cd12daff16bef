package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * Every table is a single parquet file under `dir`. Reads go through
  * the DataSource V2 parquet scan, so Catalyst pushes filters and
  * prunes columns into the scan for free — callers should express
  * selection/projection declaratively and never pre-materialize.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is stored as parquet INT64 TIMESTAMP(NANOS,false),
    * which Spark's µs timestamp type cannot represent; with
    * `spark.sql.legacy.parquet.nanosAsLong` (set by [[GraftSession]])
    * it arrives as a long of epoch-nanos. Truncate to microseconds
    * (the corpus has none beyond µs) and expose a naive timestamp,
    * matching what DuckDB/pyarrow see.
    */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
