package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.Wap

/** Write-audit-publish: clean data publishes atomically, dirty data
  * never reaches the live path, and a crashed publish completes only
  * when the audit marker proves the gate passed.
  */
class WapSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("wap").toString + "/t"

  private val rules = Seq(
    "v_positive" -> (col("v") > 0),
    "id_nonnull" -> col("id").isNotNull)

  test("clean batch publishes; readers see it; violations map is complete") {
    val dir = tmp()
    val r = Wap.write(Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v"), dir, rules)
    assert(r.published && r.nRows === 2L)
    assert(r.violations === Map("v_positive" -> 0L, "id_nonnull" -> 0L))
    assert(Wap.readPublished(spark, dir).count() === 2L)
    // no staging residue after a successful publish
    assert(!new java.io.File(dir + ".stage").exists())
  }

  test("dirty batch is blocked: live table untouched, stage kept for inspection") {
    val dir = tmp()
    assert(Wap.write(Seq((1L, 2.0)).toDF("id", "v"), dir, rules).published)
    val r = Wap.write(
      Seq((2L, -5.0), (3L, 4.0)).toDF("id", "v"), dir, rules)
    assert(!r.published && r.violations("v_positive") === 1L)
    // readers still see the first batch only
    assert(Wap.readPublished(spark, dir).select("id").as[Long].collect().toSeq === Seq(1L))
    // rejected files remain staged (dead-letter inspection), unmarked
    assert(new java.io.File(dir + ".stage").exists())
    assert(!new java.io.File(dir + ".stage/_AUDITED").exists())
  }

  test("maxViolations budget: within-budget dirt publishes, over-budget does not") {
    val dir = tmp()
    val df = Seq((1L, -1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
    assert(!Wap.write(df, dir, rules, maxViolations = 0L).published)
    assert(Wap.write(df, dir, rules, maxViolations = 1L).published)
  }

  test("crash between marker and rename: readPublished completes the publish") {
    val dir = tmp()
    assert(Wap.write(Seq((1L, 1.0)).toDF("id", "v"), dir, rules).published)
    // simulate: a newer audited batch staged, live still the old copy
    Seq((9L, 9.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir + ".stage")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new Path(dir + ".stage/_AUDITED"), true).close()
    val got = Wap.readPublished(spark, dir).select("id").as[Long].collect().toSeq
    assert(got === Seq(9L), "the marked stage is the intended truth")
    // an UNMARKED stage must never be promoted
    Seq((7L, -7.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir + ".stage")
    val still = Wap.readPublished(spark, dir).select("id").as[Long].collect().toSeq
    assert(still === Seq(9L))
  }
}
