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
  /** `events.ts` has shipped in two physical encodings across driver
    * testdata generations: INT64 TIMESTAMP(NANOS,false) — which
    * Spark's µs timestamp type cannot represent, so with
    * `spark.sql.legacy.parquet.nanosAsLong` (set by [[GraftSession]])
    * it arrives as a long of epoch-nanos — and plain TIMESTAMP(MICROS)
    * which arrives as a timestamp already. Normalize BY SCHEMA, not by
    * generation: longs truncate nanos→µs (the corpus has none beyond
    * µs), timestamps pass through; either way callers see one
    * `timestamp_ntz` column matching what DuckDB/pyarrow see.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    raw.withColumn("ts", ts.cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
