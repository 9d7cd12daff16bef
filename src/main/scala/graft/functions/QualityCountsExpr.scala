package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused quality-signal counts: ONE code-point scan computing every
  * integer the Gopher-style gate's five signals derive from (round 18
  * — the 5M probe moved the curate chain's bottleneck to the gate
  * stage once the dedup stages fused; the composed form paid an
  * interpreted higher-order `transform`+`aggregate` for mean token
  * length, an interpreted `filter` with a linear `array_contains`
  * scan per token for stopwords, a whole-text regex extract-all that
  * MATERIALIZES every punctuation match, and an `array_distinct` —
  * four-plus passes with per-token interpreted dispatch).
  *
  * Output struct (all exact integers; callers keep the ratio /
  * `Det.round` arithmetic in ordinary columns so every downstream
  * value — and every DuckDB oracle — is bit-identical to the
  * composed form):
  *
  *  - `n_chars`  — code points of the whole text (`length(text)`);
  *  - `n_tok`    — whitespace tokens (`size(tokens(text))` — maximal
  *    runs of non-`\s` code points; Java `\s` is the six ASCII
  *    whitespace chars, which is exactly what the composed
  *    `split(trim(text), "\\s+")` + empty-filter chain yields);
  *  - `tok_len_sum` — Σ per-token code-point lengths
  *    (`aggregate(transform(toks, length), 0, +)`);
  *  - `n_punct`  — code points outside `[A-Za-z0-9\s]`
  *    (`size(regexp_extract_all(text, "[^A-Za-z0-9\\s]"))` — NON-ASCII
  *    letters count, exactly like the regex);
  *  - `n_stop`   — token instances in the stopword set
  *    (`size(filter(toks, array_contains(stopwords, t)))`);
  *  - `n_dup`    — tokens repeating an earlier token
  *    (`size(toks) - size(array_distinct(toks))`).
  *
  * Parity with the composed forms is spec-pinned
  * (`QualityCountsParitySpec`).
  */
object QualityCountsExpr {

  val outType: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_dup", IntegerType, nullable = false)))

  def counts(text: Column, stopwords: Seq[String]): Column = {
    val set = new java.util.HashSet[String]()
    stopwords.foreach(set.add)
    Bridge.column(QualityCountsExpr(Bridge.expression(text), set))
  }

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'

  @inline private def isAsciiAlnum(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= '0' && cp <= '9')

  def compute(text: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val s = text.toString
    val n = s.length
    var nChars = 0
    var nTok = 0
    var sumLen = 0L
    var nPunct = 0
    var nStop = 0
    var nDup = 0
    val seen = new java.util.HashSet[String]()
    var i = 0
    var tokStart = -1 // UTF-16 index of the current token's first unit
    var tokChars = 0
    def endToken(endExclusive: Int): Unit = {
      if (tokStart >= 0) {
        nTok += 1
        sumLen += tokChars
        val tok = s.substring(tokStart, endExclusive)
        if (stop.contains(tok)) nStop += 1
        if (!seen.add(tok)) nDup += 1
        tokStart = -1
        tokChars = 0
      }
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isWs(cp)) endToken(i)
      else {
        if (tokStart < 0) tokStart = i
        tokChars += 1
        if (!isAsciiAlnum(cp)) nPunct += 1
      }
      i += Character.charCount(cp)
    }
    endToken(n)
    new GenericInternalRow(Array[Any](nChars, nTok, sumLen, nPunct, nStop, nDup))
  }
}

case class QualityCountsExpr(
    child: Expression,
    stopwords: java.util.HashSet[String])
    extends UnaryExpression {

  override def dataType: DataType = QualityCountsExpr.outType
  override def nullSafeEval(input: Any): Any =
    QualityCountsExpr.compute(input.asInstanceOf[UTF8String], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("stopwords", stopwords, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.QualityCountsExpr.compute($c, $sw);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
