package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over `array<float>` / `array<double>`
  * vectors: one generated-code pass accumulating dot product and both
  * norms, ascending element order — numerically identical to the
  * composed `aggregate(zip_with(...))` folds it replaces (same
  * accumulation order, float→double conversion exact) but without
  * three array traversals, lambda dispatch, or boxing. This is the
  * scoring kernel of [[graft.operators.Similarity]]'s KNN and
  * near-dup operators.
  *
  * Returns null if either input is null; element nulls are not
  * expected (embedding vectors are dense).
  */
object CosineExpr {
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(a), Bridge.expression(b)))
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"cosine over $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(
      a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.CosineSimExpr.compute(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)});""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // Norms must cover the full vectors even on length mismatch
    // (matches the composed form, which folds each norm separately).
    var j = n
    while (j < a.numElements()) {
      val x = if (aFloat) a.getFloat(j).toDouble else a.getDouble(j)
      na += x * x
      j += 1
    }
    j = n
    while (j < b.numElements()) {
      val y = if (bFloat) b.getFloat(j).toDouble else b.getDouble(j)
      nb += y * y
      j += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
