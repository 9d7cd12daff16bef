package graft

import org.apache.spark.sql.functions._

import graft.sources.Warehouse

/** Dense surrogate ids: AUTOINCREMENT parity (1..N, gap-free, in the
  * declared order) without the single-partition global window that
  * `row_number() OVER (ORDER BY ...)` would plan.
  */
class DenseIdSpec extends SparkSpecBase {

  import spark.implicits._

  test("ids are exactly startAt..startAt+N-1 in the declared order") {
    // Shuffled input, multiple partitions, non-contiguous keys.
    val df = spark.createDataFrame(
      scala.util.Random.shuffle((1 to 500).toList).map(i => (i * 7L, s"v$i")))
      .toDF("k", "v").repartition(8)
    val got = Warehouse.withDenseId(df, "id", Seq(col("k")), partitions = 4)
      .select("id", "k").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (1L to 500L))
    // dense rank order == key order
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
  }

  test("startAt offsets the whole sequence; id lands first in the schema") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val out = Warehouse.withDenseId(df, "id", Seq(col("k")), startAt = 100L)
    assert(out.columns.toSeq === Seq("id", "k", "v"))
    assert(out.select("id", "v").as[(Long, String)].collect().sortBy(_._1)
      .toSeq === Seq((100L, "a"), (101L, "b"), (102L, "c")))
  }

  test("skewed key distribution still yields gap-free ids") {
    // 90% of keys identical: the range partitioner piles them into
    // few partitions, others go near-empty — offsets must still chain.
    val df = (1 to 1000).map(i => (if (i <= 900) 5L else i.toLong, i)).toDF("k", "ord")
    val ids = Warehouse.withDenseId(df, "id", Seq(col("k"), col("ord")),
        partitions = 6)
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 1000L))
  }

  test("plan shape: no window operator, no single-partition exchange") {
    val df = (1 to 100).map(i => (i.toLong, i)).toDF("k", "ord")
    val out = Warehouse.withDenseId(df, "id", Seq(col("k")), partitions = 4)
    out.collect() // materializes through the real path
    // The range exchange itself sits behind the Materialize cut
    // (Scan ExistingRDD), so the visible plan is just the broadcast
    // offset join — the pins that matter: nothing ever windows or
    // collapses to a single partition.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(600))
    assert(!plan.contains("SinglePartition"), plan.take(600))
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("rejects an id column that already exists") {
    val df = Seq((1L, 2L)).toDF("id", "k")
    intercept[IllegalArgumentException] {
      Warehouse.withDenseId(df, "id", Seq(col("k")))
    }
  }
}
