package graft

import org.apache.spark.sql.functions._

/** The correctness-gate watchdog ([[Verify.runOne]]): a hung query
  * costs its timeout and is cancelled; the session stays usable; a
  * throwing query reports its message; a healthy query dumps parquet.
  */
class VerifyWatchdogSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("verify_wd").toString

  test("healthy query dumps parquet and reports success") {
    val out = tmp()
    val qd = QueryDef("wd_ok",
      (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }, None)
    assert(Verify.runOne(spark, qd, "unused", out, timeoutS = 60).isEmpty)
    assert(spark.read.parquet(s"$out/wd_ok").count() === 3)
  }

  test("a hung query times out, is cancelled, and the session survives") {
    val out = tmp()
    // A genuinely running Spark job (not a driver sleep): every row of
    // a 1-row-per-partition frame sleeps, far past the 2 s timeout.
    val qd = QueryDef("wd_hang",
      (s, _) => {
        import s.implicits._
        s.range(0, 8, 1, 8).toDF("i")
          .filter(udf((_: Long) => { Thread.sleep(120000); true }).apply(col("i")))
      }, None)
    val t0 = System.nanoTime()
    val res = Verify.runOne(spark, qd, "unused", out, timeoutS = 2)
    val waited = (System.nanoTime() - t0) / 1e9
    assert(res.exists(_.contains("timed out after 2s")))
    assert(waited < 30.0, s"watchdog returned in ${waited}s, not ~2s")
    // the cancelled job group must not poison the session
    assert(spark.range(5).count() === 5)
  }

  test("a throwing query reports the failure message") {
    val qd = QueryDef("wd_throw",
      (_, _) => throw new IllegalStateException("deliberate boom"), None)
    val res = Verify.runOne(spark, qd, "unused", tmp(), timeoutS = 60)
    assert(res.exists(_.contains("deliberate boom")))
  }
}
