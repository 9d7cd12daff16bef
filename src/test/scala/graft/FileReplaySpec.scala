package graft

import org.apache.spark.sql.functions._

/** [[graft.streaming.FileReplay]]'s publish contract, unit-level (the
  * loop E2E in FrontierStreamSpec covers the composed behavior):
  * atomic single-directory batches, and the footer-only emptiness
  * check behind `addIfNonEmpty` (round 19 — no Spark job, no second
  * execution of the input plan).
  */
class FileReplaySpec extends SparkSpecBase {

  import spark.implicits._

  test("addIfNonEmpty: empty frame publishes nothing and leaves no stage dir; rows publish one batch dir") {
    val replay = new graft.streaming.FileReplay(
      spark, Seq.empty[String].toDF("url").schema)
    val before = listBatches(replay.dir)
    assert(!replay.addIfNonEmpty(
      Seq.empty[String].toDF("url").filter(lit(false))),
      "an empty staged batch must not publish")
    assert(listBatches(replay.dir) === before, "no batch dir for an empty add")
    assert(stageLeftovers(replay.dir).isEmpty,
      "the unpublished staging dir must be deleted")
    assert(replay.addIfNonEmpty(Seq("https://a.test/x").toDF("url")))
    val after = listBatches(replay.dir)
    assert(after.size === before.size + 1, "one atomic batch dir per publish")
  }

  test("add(always): a deliberately-empty batch still publishes (typed zero-row shell)") {
    val replay = new graft.streaming.FileReplay(
      spark, Seq.empty[(Long, String)].toDF("id", "s").schema)
    replay.add(Seq.empty[(Long, String)].toDF("id", "s"))
    val batches = listBatches(replay.dir)
    assert(batches.size === 1)
    // the shell reads back as zero typed rows (schema declared — the
    // empty-dir inference trap does not apply to a parquet shell)
    val back = spark.read.parquet(s"${replay.dir}/${batches.head}")
    assert(back.count() === 0L && back.columns.toSeq === Seq("id", "s"))
  }

  test("filter-to-empty input plan: the emptiness check must not re-execute the plan (footer read only)") {
    // an input with a side-effect counter: the write executes it once;
    // the emptiness decision must come from the staged footers, not a
    // second pass over the plan
    FileReplaySpec.evals.set(0)
    val countingUdf = udf { (s: String) =>
      FileReplaySpec.evals.incrementAndGet(); s
    }
    val replay = new graft.streaming.FileReplay(
      spark, Seq.empty[String].toDF("url").schema)
    val df = Seq("a", "b", "c").toDF("url")
      .select(countingUdf(col("url")).as("url"))
    assert(replay.addIfNonEmpty(df))
    val n = FileReplaySpec.evals.get()
    assert(n <= 6, // one pass (3) + headroom for speculative re-eval
      s"emptiness check re-executed the input plan ($n udf evals for 3 rows)")
  }

  private def listBatches(dir: String): Seq[String] =
    Option(new java.io.File(dir).list()).toSeq.flatten
      .filter(_.startsWith("batch-")).sorted.toSeq

  private def stageLeftovers(dir: String): Seq[String] = {
    val parent = new java.io.File(dir).getParentFile
    Option(parent.list()).toSeq.flatten
      .filter(_.startsWith("graft_replay_stage")).toSeq
  }
}

object FileReplaySpec {
  val evals = new java.util.concurrent.atomic.AtomicInteger(0)
}
