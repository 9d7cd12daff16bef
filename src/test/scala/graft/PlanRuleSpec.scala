package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** [[graft.plans.RewriteTopOnePerGroup]]: fires on the guarded
  * pattern, leaves everything else alone, and never changes results.
  */
class PlanRuleSpec extends SparkSpecBase {

  import spark.implicits._

  // Non-nullable order keys (primitives) — the guard requires them.
  private lazy val df = Seq(
    ("a", 10L, 1L, 1.5), ("a", 20L, 2L, 2.5), ("a", 20L, 3L, 3.5),
    ("b", 5L, 4L, 4.5), ("b", 9L, 5L, 5.5))
    .toDF("key", "ts", "seq", "value")

  private def hasWindow(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("rewrites row_number()=1 (all desc) into an aggregate; results preserved") {
    val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").desc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(!hasWindow(q), q.queryExecution.optimizedPlan.toString)
    val got = q.select("key", "ts", "seq", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(("a", 20L, 3L, 3.5), ("b", 9L, 5L, 5.5)))
    // agrees with the hand-written aggregate form
    val byHand = Relational.latestPerGroup(df, Seq("key"), Seq("ts", "seq"), Seq("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.map(t => t._1 -> t._4).toMap === byHand)
  }

  test("rewrites the ascending form to min_by") {
    val w = Window.partitionBy("key").orderBy(col("ts").asc, col("seq").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(!hasWindow(q))
    val got = q.select("key", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 1.5, "b" -> 4.5))
  }

  test("guard: mixed sort directions are NOT rewritten (and stay correct)") {
    val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(hasWindow(q))
    val got = q.select("key", "seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 5L))
  }

  test("guard: rank <= k for k>1 is NOT rewritten") {
    val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").desc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(hasWindow(q))
    assert(q.count() === 4)
  }

  test("guard: nullable order keys are NOT rewritten") {
    // Timestamp column from a Seq is nullable → guard must hold.
    val tdf = Seq(("a", java.sql.Timestamp.valueOf("2023-10-05 10:00:00"), 1.0))
      .toDF("key", "ts", "value")
    val w = Window.partitionBy("key").orderBy(col("ts").desc)
    val q = tdf.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(hasWindow(q))
    assert(q.count() === 1)
  }

  test("rn kept in the projection still reads as 1 after rewrite") {
    val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").desc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "rn")
    assert(q.collect().map(_.getInt(1)).forall(_ == 1))
  }
}
