package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused Gopher-repetition counts: every within-document repetition
  * signal in ONE code-point scan (round 18). The explode/aggregate
  * formulation existed because COLUMN-level in-array occurrence
  * counting is O(n²) per doc — but the counts are all PER-DOCUMENT,
  * so a native expression computes them in O(n) with per-row hash
  * maps and the whole signal suite becomes map-only: at the 5M-doc
  * probe the exploded form shuffled ~2 n-gram rows per token plus a
  * row per line through a two-level aggregate, an exchange this
  * expression deletes outright.
  *
  * Output struct (exact integers; the ppm arithmetic stays
  * column-side so every value and oracle is bit-identical to the
  * explode/aggregate form):
  *
  *  - `n_lines`    — non-blank lines (`size(lines(text))`: split on
  *    `\n`, kept iff `trim(l)` is non-empty — Spark `trim` strips
  *    ASCII 0x20 ONLY, so a tab-only line is KEPT, exactly like the
  *    composed chain);
  *  - `n_toks`     — whitespace tokens (`size(tokens(text))`);
  *  - `n_dup_lines` — Σ (c−1) over line values = `n_lines −
  *    size(array_distinct(lines))`;
  *  - `dup_chars`  — Σ (c−1)·len(line value) over duplicated line
  *    values (repeats-only convention; len in code points);
  *  - `chars`      — Σ len over all kept lines;
  *  - `c2`/`c3`    — max occurrence count of any space-joined
  *    word 2-/3-gram (0 when the doc has fewer than n tokens).
  */
object RepetitionCountsExpr {

  val outType: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_toks", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("c2", LongType, nullable = false),
    StructField("c3", LongType, nullable = false)))

  def counts(text: Column): Column =
    Bridge.column(RepetitionCountsExpr(Bridge.expression(text)))

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
      cp == '\r'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    // ---- lines: split on '\n', keep iff any char != ' '
    var nLines = 0L
    var chars = 0L
    var dupLines = 0L
    var dupChars = 0L
    val lineCounts = new java.util.HashMap[String, Integer]()
    var ls = 0
    var i = 0
    val n = s.length
    def endLine(endExclusive: Int): Unit = {
      val line = s.substring(ls, endExclusive)
      var keep = false
      var k = 0
      while (!keep && k < line.length) {
        if (line.charAt(k) != ' ') keep = true
        k += 1
      }
      if (keep) {
        nLines += 1
        val len = line.codePointCount(0, line.length)
        chars += len
        val prev = lineCounts.get(line)
        if (prev == null) lineCounts.put(line, 1)
        else {
          lineCounts.put(line, prev + 1)
          dupLines += 1
          dupChars += len
        }
      }
    }
    while (i < n) {
      if (s.charAt(i) == '\n') { endLine(i); ls = i + 1 }
      i += 1
    }
    endLine(n)
    // ---- tokens + n-gram max occupancy
    var nToks = 0L
    var c2 = 0L
    var c3 = 0L
    val g2 = new java.util.HashMap[String, Integer]()
    val g3 = new java.util.HashMap[String, Integer]()
    var prev1: String = null // token i-1
    var prev2: String = null // token i-2
    def bump(m: java.util.HashMap[String, Integer], key: String): Long = {
      val p = m.get(key)
      val c = if (p == null) 1 else p + 1
      m.put(key, c)
      c.toLong
    }
    i = 0
    var ts = -1
    def endTok(endExclusive: Int): Unit = {
      if (ts >= 0) {
        nToks += 1
        val tok = s.substring(ts, endExclusive)
        if (prev1 != null) {
          val cc2 = bump(g2, prev1 + " " + tok)
          if (cc2 > c2) c2 = cc2
          if (prev2 != null) {
            val cc3 = bump(g3, prev2 + " " + prev1 + " " + tok)
            if (cc3 > c3) c3 = cc3
          }
        }
        prev2 = prev1
        prev1 = tok
        ts = -1
      }
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) endTok(i)
      else if (ts < 0) ts = i
      i += Character.charCount(cp)
    }
    endTok(n)
    new GenericInternalRow(
      Array[Any](nLines, nToks, dupLines, dupChars, chars, c2, c3))
  }
}

case class RepetitionCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionCountsExpr.outType
  override def nullSafeEval(input: Any): Any =
    RepetitionCountsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.RepetitionCountsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
