package graft

import org.apache.spark.sql.functions._

import graft.operators.Variant

/** VARIANT shredding semantics: typed extraction, null on
  * missing/mismatched/malformed, and the parse-once plan shape.
  */
class VariantSpec extends SparkSpecBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, """{"meta":{"type":"click","k":7},"ids":[10,20]}"""),
    (2L, """{"meta":{"type":"view"},"ids":[30]}"""),     // k missing, ids[1] missing
    (3L, """{"meta":{"type":"buy","k":"NaNish"},"ids":[1,2]}"""), // k not an int
    (4L, """not json at all"""),                          // malformed
    (5L, null.asInstanceOf[String]))                      // null doc
    .toDF("id", "js")

  private def shredded = Variant.shred(docs, col("js"), Seq(
    ("vtype", "$.meta.type", "string"),
    ("vk", "$.meta.k", "int"),
    ("vsecond", "$.ids[1]", "bigint")))

  test("shred: typed values out; missing/mismatched/malformed are NULL, not errors") {
    val got = shredded.collect()
      .map(r => r.getLong(0) -> (r.get(2), r.get(3), r.get(4))).toMap
    assert(got(1L) === (("click", 7, 20L)))
    assert(got(2L) === (("view", null, null)))
    assert(got(3L) === (("buy", null, 2L)))   // "NaNish" cannot cast to int
    assert(got(4L) === ((null, null, null)))
    assert(got(5L) === ((null, null, null)))
  }

  test("shred parses once: a single parse in the optimized plan, one per-path get") {
    // parquet-backed input: a literal LocalRelation would be folded
    // away whole by ConvertToLocalRelation, leaving nothing to pin
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("props"))
    val plan = Variant.shred(ev, col("props"), Seq(
        ("vtype", "$.meta.type", "string"),
        ("vk", "$.meta.k", "int"),
        ("vsecond", "$.ids[1]", "bigint")))
      .queryExecution.optimizedPlan.toString
    // CollapseProject must NOT have inlined the staged parse into the
    // three shred branches — that would re-parse the document per
    // extracted column, the cost VARIANT exists to avoid. (The parse
    // prints as `static_invoke(VariantExpressionEvalUtils.parseJson`
    // in the optimized plan, not as the `parse_json` surface name.)
    val parses = "parseJson".r.findAllIn(plan).size
    assert(parses === 1, s"expected one parseJson, plan:\n$plan")
    assert("try_variant_get".r.findAllIn(plan).size === 3, plan)
  }
}
