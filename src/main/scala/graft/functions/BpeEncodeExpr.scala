package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding as a native expression: whitespace-split the input,
  * then per word greedily fuse the adjacent symbol pair with the
  * LOWEST merge rank until no learned pair remains (the standard
  * apply order — rank = training order). The merge table rides along
  * as a reference object into generated code (the
  * [[MinHashSigExpr]] pattern), so encoding stays map-only,
  * shuffle-free, and inside whole-stage codegen.
  */
object BpeEncodeExpr {

  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // " " is a safe separator: symbols come from whitespace-split
      // words, so no symbol ever contains a space
      ranks.putIfAbsent(a + " " + b, i)
    }
    Bridge.column(BpeEncodeExpr(Bridge.expression(text), ranks))
  }

  def compute(text: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val words = text.toString.trim.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = scala.collection.mutable.ArrayBuffer.empty[String]
        w.foreach(c => syms += c.toString)
        var done = false
        while (!done && syms.length > 1) {
          // lowest-rank adjacent pair
          var bestRank = Int.MaxValue
          var bestAt = -1
          var j = 0
          while (j + 1 < syms.length) {
            val r = ranks.get(syms(j) + " " + syms(j + 1))
            if (r != null && r < bestRank) { bestRank = r; bestAt = j }
            j += 1
          }
          if (bestAt < 0) done = true
          else {
            // fuse every occurrence of the chosen pair, left to right
            val a = syms(bestAt); val b = syms(bestAt + 1)
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < syms.length) {
              if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) {
                next += a + b
                k += 2
              } else {
                next += syms(k)
                k += 1
              }
            }
            syms = next
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class BpeEncodeExpr(child: Expression, ranks: java.util.HashMap[String, Integer])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.compute(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeExpr.compute($c, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
