package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (Viterbi) encoding as a native expression: whitespace-
  * split the input, then segment each word into the vocab pieces
  * maximizing the single integer key
  *
  *   dpkey = Σ (1024·score(piece) − 1)
  *
  * — lexicographic (max Σscore, min piece count) as one BIGINT max,
  * the exact objective [[graft.operators.Unigram.unigramTokensDuckSql]]
  * replays in SQL (cross-engine exact because the committed scores
  * are integers). An absent single character scores
  * [[graft.operators.Unigram.UnkScore]] and emits itself. Tie-break
  * for the emitted piece STRINGS (never for counts — one dpkey pins
  * the count): among equal-key options the LONGEST piece wins at each
  * boundary, backtracking from the word end. The vocab rides along as
  * a reference object into generated code (the [[BpeEncodeExpr]]
  * pattern), so encoding stays map-only and inside codegen.
  */
object UnigramEncodeExpr {

  def encode(text: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column = {
    require(maxPieceLen >= 1, "UnigramEncodeExpr: maxPieceLen must be >= 1")
    val scores = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, s) => scores.putIfAbsent(p, s) }
    Bridge.column(
      UnigramEncodeExpr(Bridge.expression(text), scores, maxPieceLen))
  }

  def compute(text: UTF8String, scores: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    // No .trim: Java trim strips ALL chars <= 0x20, but the repo's tokens()
    // convention strips only 0x20 — split + the w.nonEmpty guard below keeps
    // the word list bit-identical to tokens() even with control-char edges.
    val words = text.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val n = w.length
        val dp = new Array[Long](n + 1)
        val bestK = new Array[Int](n + 1)
        var j = 1
        while (j <= n) {
          var best = Long.MinValue
          var bk = 0
          var k = 1
          while (k <= maxLen && k <= j) {
            val piece = w.substring(j - k, j)
            val s: java.lang.Long =
              if (k == 1) {
                val v = scores.get(piece)
                if (v == null) graft.operators.Unigram.UnkScore else v
              } else scores.get(piece)
            if (s != null) {
              val cand = dp(j - k) + 1024L * s - 1L
              // >= so the LONGEST equal-key piece wins the boundary
              if (cand >= best) { best = cand; bk = k }
            }
            k += 1
          }
          dp(j) = best
          bestK(j) = bk
          j += 1
        }
        // backtrack from the end; reverse in place into the output
        val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = n
        while (pos > 0) {
          val k = bestK(pos)
          pieces += w.substring(pos - k, pos)
          pos -= k
        }
        var pi = pieces.length - 1
        while (pi >= 0) { out += UTF8String.fromString(pieces(pi)); pi -= 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class UnigramEncodeExpr(
    child: Expression,
    scores: java.util.HashMap[String, java.lang.Long],
    maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    UnigramEncodeExpr.compute(input.asInstanceOf[UTF8String], scores, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("scores", scores, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramEncodeExpr.compute($c, $s, $maxPieceLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
