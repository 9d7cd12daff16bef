package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the text-canonicalization step a corpus pipeline runs
  * BEFORE anything hash-based: the same visible text in composed vs
  * decomposed form ("é" as U+00E9 vs e+U+0301) produces different
  * bytes, so un-normalized corpora silently miss exact-dup groups,
  * fingerprints, and vocabulary merges. Spark ships no normalizer
  * builtin; this wraps `java.text.Normalizer` in the repo's native
  * Expression pattern (no UDF — generated code calls the static
  * helper).
  *
  * Scale shape: map-only, one pass per row; the overwhelmingly common
  * already-normalized case is detected with `Normalizer.isNormalized`
  * (a scan, no allocation) and returns the INPUT UTF8String unchanged
  * — at 100 TB the normalizer mostly verifies, rarely rewrites.
  *
  * Cross-engine note: NFC is the only form DuckDB exposes
  * (`nfc_normalize`), so NFC results are oracle-checkable; the
  * compatibility forms (NFKC/NFKD — ligature/width folding, the
  * aggressive cleanup LLM pipelines often want) are spec-pinned
  * against known codepoints instead.
  */
case class NormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  require(NormalizeExpr.Forms.contains(form),
    s"normalizeUnicode: form must be one of ${NormalizeExpr.Forms.mkString("/")}, got '$form'")

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeExpr.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NormalizeExpr.compute($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpr {
  private[graft] val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def compute(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
