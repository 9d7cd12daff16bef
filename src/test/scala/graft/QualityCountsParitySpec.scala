package graft

import org.apache.spark.sql.functions._

import graft.functions.{Det, QualityCountsExpr}
import graft.operators.TextAnalysis

/** Bit-parity of the fused quality-counts scan
  * ([[graft.functions.QualityCountsExpr]]) against the composed
  * builtin chains it replaces — the `TokenHashesParitySpec`
  * discipline: any divergence in ANY count on any input shape would
  * silently move the Gopher gate's verdicts, so the zoo covers the
  * whitespace/UTF-8 edges the byte/code-point scan must share with
  * `split`/`regexp_extract_all`/`array_contains`/`array_distinct`.
  */
class QualityCountsParitySpec extends SparkSpecBase {

  import spark.implicits._

  private val zoo = Seq(
    "the quick brown fox",
    "",
    " ",
    "   \t\n  ",
    "one",
    "the the the the",
    "a an and of to in is it for the",           // all stopwords
    "punct!!! ... ???",
    "tabs\tand\nnewlines\randvtff",
    "unicode café naïve 中文 中文", // non-ASCII = punct per the regex
    "emoji 😀 pair 😀",       // supplementary code points
    "  leading and trailing  ",
    "x".repeat(500) + " " + "y z " + "x".repeat(500),
    "MiXeD CaSe The THE the",
    "digits 123 456 123 !@# $%^",
    "nbsp is not java ws",                   //   is NOT \s: one token
    null)

  test("fused counts ≡ composed chains on the zoo + real docs") {
    val docs = zoo.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .union(Tables.documents(spark, "/root/testdata/sf0.01")
        .select(col("doc_id").as("id"), col("text")).limit(200))
    val txt = coalesce(col("text"), lit(""))
    val t = col("__toks")
    val sw = array(TextAnalysis.englishStopwords.map(lit): _*)
    val composed = docs.withColumn("__toks", TextAnalysis.tokens(txt)).select(
      col("id"),
      length(txt).as("n_chars"),
      size(t).as("n_tok"),
      aggregate(transform(t, x => length(x)), lit(0), (acc, x) => acc + x)
        .cast("long").as("tok_len_sum"),
      size(regexp_extract_all(txt, lit("[^A-Za-z0-9\\s]"), lit(0)))
        .as("n_punct"),
      size(filter(t, x => array_contains(sw, x))).as("n_stop"),
      (size(t) - size(array_distinct(t))).as("n_dup"))
    val fused = docs.select(col("id"),
        QualityCountsExpr.counts(txt, TextAnalysis.englishStopwords).as("c"))
      .select(col("id"),
        col("c.n_chars").as("n_chars"), col("c.n_tok").as("n_tok"),
        col("c.tok_len_sum").as("tok_len_sum"),
        col("c.n_punct").as("n_punct"), col("c.n_stop").as("n_stop"),
        col("c.n_dup").as("n_dup"))
    val diff = composed.exceptAll(fused).union(fused.exceptAll(composed))
    assert(diff.isEmpty, {
      val rows = diff.limit(5).collect().mkString("; ")
      s"fused/composed quality counts diverge: $rows"
    })
  }

  test("gate verdicts unchanged through the fused path (ratio arithmetic stays column-side)") {
    // the gate's Det.round ratios must be the same VALUES, not merely
    // close — recompute one doc's ratios both ways
    val d = Seq((1L, "the quick quick fox!! 12 the a an of to in is")).toDF("doc_id", "text")
    val g = TextAnalysis.qualityGate(d, "doc_id", "text").collect()(0)
    val c = d.select(QualityCountsExpr.counts(col("text"),
      TextAnalysis.englishStopwords).as("c")).select("c.*").collect()(0)
    val nTok = c.getInt(1)
    assert(nTok === 12)
    assert(c.getInt(5) === 2, "two duplicated tokens (quick, the)")
    // by hand: pr = 2/45 < 0.2, sr = 8/12 > 0.05, dtf = 2/12 < 0.3,
    // awl = 34/12 in [2,12], nTok in [10,5000] -> clean pass
    assert(g.getString(1) === "" && g.getInt(2) === 1,
      "no rule fails this fixture")
  }

  test("plan: qualityGate is map-only — one fused scan, no exchange, no HOF fallback") {
    val df = TextAnalysis.qualityGate(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "gate must not shuffle")
    assert(!plan.contains("Generate explode"), "gate must not explode")
    // the composed form's per-token interpreted chains must be gone
    assert(!plan.contains("array_contains"),
      "stopword membership lives inside the fused scan now")
  }

  test("null text fails the gate (coalesce semantics kept)") {
    val d = Seq[(Long, String)]((1L, null)).toDF("doc_id", "text")
    val g = TextAnalysis.qualityGate(d, "doc_id", "text").collect()(0)
    assert(g.getInt(2) === 0 && g.getString(1).contains("length"))
  }

  test("qualityKeep == gate-verdict semi-join (r19 join-back deletion), incl. null text; plan is map-only") {
    val docs = Seq[(Long, String)](
      (1L, "the quick brown fox jumps over a lazy dog and then it sleeps well"),
      (2L, "x y"), // fails length
      (3L, null),  // null must drop, not sail
      (4L, "the of and a in to is was it for on as are" +
        " with his they i at be this have from or one had by word")
    ).toDF("doc_id", "text")
    val viaJoin = docs.join(
      TextAnalysis.qualityGate(docs, "doc_id", "text")
        .filter(col("pass") === 1).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val viaKeep = TextAnalysis.qualityKeep(docs, "text")
    assert(viaKeep.columns.toSeq === docs.columns.toSeq,
      "qualityKeep must return the caller's frame shape untouched")
    val a = viaJoin.select("doc_id").as[Long].collect().sorted.toSeq
    val b = viaKeep.select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b, s"keeper sets diverge: join=$a keep=$b")
    // the point of the form: no exchange anywhere — at 5M docs the
    // semi-join shuffled the full-text corpus (22 s) for a 2.8 s scan
    val plan = viaKeep.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "qualityKeep must not shuffle")
  }
}
