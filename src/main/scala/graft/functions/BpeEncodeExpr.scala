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

  def encode(text: Column, merges: Seq[(String, String)], endOfWord: String = ""): Column = {
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // " " is a safe separator: symbols come from whitespace-split
      // words, so no symbol ever contains a space
      ranks.putIfAbsent(a + " " + b, i)
    }
    Bridge.column(BpeEncodeExpr(Bridge.expression(text), ranks, endOfWord))
  }

  def compute(text: UTF8String, ranks: java.util.HashMap[String, Integer],
      eow: UTF8String): ArrayData = {
    val marker = if (eow == null) "" else eow.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val words = text.toString.trim.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = scala.collection.mutable.ArrayBuffer.empty[String]
        w.foreach(c => syms += c.toString)
        // standard Sennrich end-of-word marker: the last symbol carries
        // it through every merge, so word boundaries survive into the
        // flat token stream and decode is exact
        if (marker.nonEmpty) syms(syms.length - 1) = syms.last + marker
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

case class BpeEncodeExpr(child: Expression, ranks: java.util.HashMap[String, Integer],
    endOfWord: String = "")
    extends UnaryExpression {

  private val eow: UTF8String = UTF8String.fromString(endOfWord)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.compute(input.asInstanceOf[UTF8String], ranks, eow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    val m = ctx.addReferenceObj("eow", eow, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeExpr.compute($c, $r, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
