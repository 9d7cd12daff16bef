package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom runtime-prefilter join: exactness (≡ plain semi join),
  * one-sidedness (prefilter is a superset), degenerate build sides,
  * and the plan shape that makes it worth having (probe before the
  * join, not after).
  */
class BloomJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private def fact = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "key")
  private def dim  = Seq(3L, 11L, 42L).toDF("dkey")

  test("semiJoin result equals the plain left-semi join") {
    val viaBloom = BloomJoin.semiJoin(
      fact, col("key"), dim, col("dkey"), expectedItems = 1024)
      .select("id").as[Long].collect().toSet
    val plain = fact.join(dim, col("key") === col("dkey"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(viaBloom === plain)
    assert(plain.nonEmpty) // the fixture must actually exercise matches
  }

  test("prefilter is a superset of true matches and below full size") {
    // fpp small enough that SOME pruning must happen on 97 key values
    val pre = BloomJoin.prefilter(
      fact, col("key"), dim, col("dkey"), expectedItems = 16, fpp = 0.001)
    val trueMatches = fact.join(dim, col("key") === col("dkey"), "left_semi")
    val preIds = pre.select("id").as[Long].collect().toSet
    val trueIds = trueMatches.select("id").as[Long].collect().toSet
    assert(trueIds.subsetOf(preIds)) // no false negatives, ever
    assert(preIds.size < 1000)       // and it actually pruned
  }

  test("lazy scalar-subquery prefilter matches the eager literal form") {
    val eager = BloomJoin.prefilter(
      fact, col("key"), dim, col("dkey"), expectedItems = 1024)
      .select("id").as[Long].collect().toSet
    val lazyForm = BloomJoin.prefilterLazy(
      fact, col("key"), dim, col("dkey"), expectedItems = 1024)
      .select("id").as[Long].collect().toSet
    assert(lazyForm === eager)
    val trueIds = fact.join(dim, col("key") === col("dkey"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(trueIds.subsetOf(lazyForm))
  }

  test("empty build side yields zero rows, not a crash") {
    val out = BloomJoin.semiJoin(
      fact, col("key"), dim.filter(col("dkey") < 0), col("dkey"),
      expectedItems = 64)
    assert(out.count() === 0L)
  }

  test("null fact keys never pass the probe") {
    val withNulls = Seq(Some(3L), None, Some(5L)).toDF("key")
    val out = BloomJoin.prefilter(
      withNulls, col("key"), dim, col("dkey"), expectedItems = 64)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(3L))
  }

  test("a NULL key on the BUILD side does not admit null-keyed fact rows") {
    // xxhash64(NULL) is the seed: un-filtered, one null build key would
    // put the seed in the filter and every null fact key would probe
    // true. NULL = NULL is never a join match, so both must drop.
    val dimWithNull = Seq(Some(3L), None).toDF("dkey")
    val factWithNull = Seq(Some(3L), None, Some(7L)).toDF("key")
      .withColumn("id", col("key"))
    val pre = BloomJoin.prefilter(
      factWithNull, col("key"), dimWithNull, col("dkey"), expectedItems = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pre === Set(3L))
    val semi = BloomJoin.semiJoin(
      factWithNull, col("key"), dimWithNull, col("dkey"), expectedItems = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(semi === Set(3L))
  }

  test("probe runs before the join in the physical plan") {
    // Parquet-backed fact: over a LocalRelation the optimizer folds
    // the probe away at plan time (ConvertToLocalRelation), which
    // hides the shape this test pins.
    val dir = java.nio.file.Files.createTempDirectory("bloom_fact").toString
    fact.write.mode("overwrite").parquet(dir)
    val plan = BloomJoin.semiJoin(
      spark.read.parquet(dir), col("key"), dim, col("dkey"), expectedItems = 1024)
      .queryExecution.executedPlan.toString
    // The might_contain filter must appear in the plan (as a Filter on
    // the fact side), i.e. the pruning is map-side, pre-exchange.
    assert(plan.contains("might_contain"))
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "probe filter should sit BELOW the join operator in the plan tree")
  }

  test("optimalNumBits follows the Bloom sizing formula") {
    // 1M items @ 1% → ~9.585 bits/item
    val bits = BloomJoin.optimalNumBits(1000000L, 0.01)
    assert(bits > 9500000L && bits < 9700000L)
    assert(BloomJoin.optimalNumBits(1L, 0.5) === 64L) // floor
  }
}
