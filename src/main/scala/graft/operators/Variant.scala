package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured ingest through Spark 4's VARIANT type — the scale
  * path for JSON columns: `parse_json` ONCE into Spark's internal
  * binary-variant encoding, then shred any number of typed fields
  * with `variant_get`, each a cheap offset walk over the parsed
  * encoding instead of a fresh string parse. A 100 TB JSONL ingest
  * pays the parser exactly once per row however many fields the
  * pipeline extracts — with per-path `get_json_object` the parse cost
  * multiplies by the number of extracted columns.
  *
  * The parsed variant is STAGED as its own projection and referenced
  * by every shred branch; `CollapseProject` will not inline a
  * non-cheap expression into multiple references, so the
  * parse-once shape survives optimization (asserted in
  * `VariantSpec`'s plan pin).
  */
object Variant {

  /** `paths`: `(outputColumn, variantPath, sqlType)` triples, e.g.
    * `("k", "$.meta.k", "int")`. Appends one typed column per triple
    * to `df`; a malformed document (`try_parse_json`), a missing
    * path, or a value that cannot cast to the requested type all
    * surface as NULL (`try_variant_get` semantics — ingest must not
    * abort on one malformed record).
    */
  def shred(
      df: DataFrame,
      jsonCol: Column,
      paths: Seq[(String, String, String)]): DataFrame = {
    require(paths.nonEmpty, "shred: at least one path required")
    val staged = df.withColumn("__variant", try_parse_json(jsonCol))
    paths.foldLeft(staged) { case (acc, (name, path, typ)) =>
      acc.withColumn(name, try_variant_get(col("__variant"), path, typ))
    }.drop("__variant")
  }
}
