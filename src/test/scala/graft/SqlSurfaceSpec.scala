package graft

import graft.functions.HashExprs
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The SQL entry point: native graft expressions registered as SQL
  * functions must agree with their Column-API twins.
  */
class SqlSurfaceSpec extends SparkSpecBase {

  import spark.implicits._

  test("graft_cosine / graft_simhash64 / graft_minhash_sig usable from spark.sql") {
    HashExprs.registerSql(spark)
    val cos = spark.sql(
      """SELECT graft_cosine(
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |  array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(cos - 24.0 / 25.0) < 1e-12)

    Seq((1L, "alpha beta gamma")).toDF("id", "text").createOrReplaceTempView("sql_docs")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sig,
        |       graft_minhash_sig(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS mh
        |FROM sql_docs""".stripMargin).collect().head
    // like-for-like: feed both sides identical xxhash64 token hashes
    // (Dedup.simhash64 itself uses the engine-portable md5 tokenHash64)
    val viaCol = Seq("alpha beta gamma").toDF("text")
      .select(
        HashExprs.simhash64(
          transform(split(trim(col("text")), "\\s+"), t => xxhash64(t))).as("sig"),
        HashExprs.minhashSig(transform(split(trim(col("text")), "\\s+"), t => xxhash64(t)), 64).as("mh"))
      .collect().head
    assert(viaSql.getLong(0) === viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) === viaCol.getSeq[Long](1))
  }

  test("graft_char_gram_hashes from spark.sql equals the Column-API twin") {
    HashExprs.registerSql(spark)
    val viaSql = spark.sql(
      "SELECT graft_char_gram_hashes('abcdef', 3) AS g")
      .collect().head.getSeq[Long](0)
    val viaCol = Seq("abcdef").toDF("t")
      .select(HashExprs.charGramHashes(col("t"), 3).as("g"))
      .collect().head.getSeq[Long](0)
    assert(viaSql === viaCol)
    assert(viaSql.length === 4) // |"abcdef"| - 3 + 1
    // non-literal gram length fails loudly at registration contract
    val e = intercept[Exception] {
      spark.sql("SELECT graft_char_gram_hashes('abc', CAST(length('ab') AS INT))").collect()
    }
    assert(e.getMessage.contains("int literal"))
  }

  test("graft_zorder / graft_bloom_agg / graft_might_contain from spark.sql") {
    HashExprs.registerSql(spark)
    // Morton key agrees with the Column API (16 bits/dim)
    val viaSql = spark.sql("SELECT graft_zorder(5L, 9L) AS z").head.getLong(0)
    val viaCol = Seq((5L, 9L)).toDF("a", "b")
      .select(graft.operators.Layout.interleaveBits(
        Seq(col("a"), col("b")), 16).as("z")).head.getLong(0)
    assert(viaSql === viaCol)
    // bloom agg + probe round-trip through pure SQL (scalar subquery —
    // the foldability shape BloomFilterMightContain requires)
    spark.range(0, 50).selectExpr("id * 3 AS k").createOrReplaceTempView("sql_keys")
    val hits = spark.sql(
      """SELECT count(*) AS n FROM range(0, 150) r
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k), 64L, 4096L) FROM sql_keys),
        |  xxhash64(r.id)) AND r.id % 3 = 0""".stripMargin).head.getLong(0)
    assert(hits === 50L) // all true members admitted (no false negatives)
  }

  test("graft_normalize from spark.sql: NFC composes, literal form enforced") {
    HashExprs.registerSql(spark)
    // NOTE Spark's chr() is byte-ASCII (mod 256), not codepoint like
    // DuckDB's — combining marks must be literals on the Spark side
    assert(spark.sql(
      "SELECT graft_normalize('café', 'NFC')").head.getString(0)
      === "café")
    assert(spark.sql(
      "SELECT graft_normalize('ﬁ', 'NFKC')").head.getString(0) === "fi")
    intercept[Exception] {
      spark.sql("SELECT graft_normalize('x', lower('NFC'))").collect()
    }
  }

  test("SQL surface runs a full query (spark.sql over temp views)") {
    Tables.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("sql_events")
    val n = spark.sql(
      "SELECT event_type, count(*) AS n FROM sql_events GROUP BY event_type").count()
    assert(n === 5)
  }
}
