package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

/** Sequence packing and deterministic sampling semantics. */
class PackingSamplingSpec extends SparkSpecBase {

  import spark.implicits._

  test("concatChunkPack: seq_id = floor(global start offset / budget), id order") {
    // tokens: 3,4,5,2,6 -> starts 0,3,7,12,14 -> budget 5 -> seq 0,0,1,2,2
    val df = Seq((10L, 3), (11L, 4), (12L, 5), (13L, 2), (14L, 6))
      .toDF("id", "ntok")
    val got = Packing.concatChunkPack(df, "id", col("ntok"), budget = 5)
      .select("id", "seq_id").as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 0L, 11L -> 0L, 12L -> 1L, 13L -> 2L, 14L -> 2L))
  }

  test("concatChunkPack: bucketed two-pass equals single-partition window oracle") {
    val df = (0L until 500L).map(i => (i * 7 % 997, (i % 13 + 1).toInt))
      .toDF("id", "ntok") // non-contiguous, shuffled ids
    val got = Packing.concatChunkPack(df, "id", col("ntok"), budget = 37, buckets = 8)
      .select("id", "seq_id").as[(Long, Long)].collect().toMap
    // naive oracle: global sort + running sum on the driver
    val rows = df.as[(Long, Int)].collect().sortBy(_._1)
    var acc = 0L
    val want = rows.map { case (id, n) =>
      val s = acc; acc += n; id -> s / 37
    }.toMap
    assert(got === want)
  }

  test("concatChunkPack: empty input and single row") {
    val empty = Seq.empty[(Long, Int)].toDF("id", "ntok")
    assert(Packing.concatChunkPack(empty, "id", col("ntok"), 10).count() === 0)
    val one = Seq((42L, 3)).toDF("id", "ntok")
    val got = Packing.concatChunkPack(one, "id", col("ntok"), 10)
      .select("seq_id").as[Long].collect()
    assert(got === Array(0L))
  }

  test("sqrtTemperatureSample: sampled sizes track sqrt(n), smallest source kept whole") {
    import spark.implicits._
    // skewed sources: 400 / 100 / 25 rows
    val df = ((1L to 400L).map(i => (i, "web")) ++
      (401L to 500L).map(i => (i, "books")) ++
      (501L to 525L).map(i => (i, "code"))).toDF("id", "src")
    val kept = graft.operators.Sampling.sqrtTemperatureSample(df, "src", "id")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // smallest source survives in full
    assert(kept("code") === 25L)
    // others land near sqrt(minN * n): sqrt(25*400)=100, sqrt(25*100)=50
    // (hash-Bernoulli, so allow sampling slack)
    assert(math.abs(kept("web") - 100L) <= 25, s"web kept ${kept("web")}")
    assert(math.abs(kept("books") - 50L) <= 18, s"books kept ${kept("books")}")
    // deterministic: second run selects the identical rows
    val a = graft.operators.Sampling.sqrtTemperatureSample(df, "src", "id")
      .select("id").as[Long].collect().toSet
    val b = graft.operators.Sampling.sqrtTemperatureSample(
        df.repartition(7), "src", "id")
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("hashSample: deterministic across runs and repartitioning; rate ~ num/den") {
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.hashSample(df, "id", 1, 5).as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), "id", 1, 5)
      .as[Long].collect().toSet
    assert(a === b)
    assert(math.abs(a.size - 400) < 80) // within ±20% of expectation
  }

  test("stratifiedSample: exact floor(num/den * stratum size) per stratum") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "lang")
      .union(Seq((1000L, "tiny"), (1001L, "tiny")).toDF("id", "lang"))
    val got = Sampling.stratifiedSample(df, Seq("lang"), "id", 1, 5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 100 rows per big stratum -> exactly 20; 2-row stratum -> floor(2/5)=0
    assert(got === Map("s0" -> 20L, "s1" -> 20L, "s2" -> 20L))
  }

  test("epochOrder: positions are a 0..n-1 permutation, invariant to bucket count and input order") {
    val df = (0L until 300L).map(i => Tuple1(i * 7 + 3)).toDF("id")
    def positions(d: org.apache.spark.sql.DataFrame, buckets: Int): Map[Long, Long] =
      Sampling.epochOrder(d, "id", buckets).select("id", "epoch_pos")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p64 = positions(df, 64)
    assert(p64.values.toSeq.sorted === (0L until 300L))
    // one bucket = plain global rank; many buckets must agree exactly
    assert(positions(df, 1) === p64)
    // input partitioning/order must not matter
    assert(positions(df.repartition(7).orderBy(desc("id")), 64) === p64)
  }

  test("idHash: extreme ids never overflow under ANSI; hash stays in 31-bit range") {
    val df = Seq(Long.MaxValue, Long.MaxValue - 1, 0L, 1L, 4294967296L, 2147483647L)
      .toDF("id")
    val hashes = df.select(Sampling.idHash(col("id")).as("h"))
      .collect().map(_.getLong(0))
    assert(hashes.forall(h => h >= 0 && h < 2147483647L))
  }

  test("concatChunkPack: null id fails loudly instead of silently dropping the row") {
    val df = Seq((Some(1L), 10L), (None, 5L), (Some(3L), 7L))
      .toDF("doc_id", "ntok")
    val ex = intercept[Exception] {
      Packing.concatChunkPack(df, "doc_id", col("ntok"), budget = 16).collect()
    }
    assert(ex.getMessage != null)
  }

  test("stratifiedSample: selection is hash-determined, not input-order-determined") {
    val df = (0L until 100L).map(i => (i, "x")).toDF("id", "lang")
    val a = Sampling.stratifiedSample(df, Seq("lang"), "id", 1, 4)
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(df.orderBy(desc("id")), Seq("lang"), "id", 1, 4)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size === 25)
  }

  test("tokenBudgetPerGroup: budget bounds each group, overshoot <= one doc, deterministic") {
    val docs = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "et", 30L + (i % 7)))
      .toDF("id", "lang", "n_tokens")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetPerGroup(d, "lang", "id", "n_tokens", budget = 100L)
    val kept = run(docs).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    // per group: total spent before the last kept doc is under budget,
    // so total <= budget + max single doc (overshoot bounded by one)
    kept.groupBy(_._1).foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      assert(total < 100L + 37L, s"$lang spent $total")
      assert(total >= 100L || rows.length === 20, // budget hit or group exhausted
        s"$lang under-filled at $total")
    }
    // every group keeps at least its first row even if one doc > budget
    val fat = Seq((1L, "xx", 500L)).toDF("id", "lang", "n_tokens")
    assert(run(fat).count() === 1L)
    // deterministic under input order and partitioning
    val again = run(docs.orderBy(desc("id")).repartition(7)).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(kept.sortBy(_._2).toSeq === again.sortBy(_._2).toSeq)
  }
}
