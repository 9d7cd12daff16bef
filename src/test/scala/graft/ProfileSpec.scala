package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** One-pass column profiler: stat correctness (nulls, distinct,
  * typed min/max, string lengths), the approx variant's plan shape
  * (no Expand), and single-scan execution.
  */
class ProfileSpec extends SparkSpecBase {

  import spark.implicits._

  private val df = Seq(
    (1L, Some("aa"), Some(10.0)),
    (2L, Some("bbbb"), None),
    (10L, None, Some(2.5)),
    (10L, Some("c"), Some(10.0)))
    .toDF("id", "s", "v")

  test("exact: counts, nulls, distinct, typed min/max, string sum_len") {
    val rows = Profile.exact(df, Seq("id", "s", "v"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val id = rows("id")
    assert(id.getLong(1) === 4L)      // n_rows
    assert(id.getLong(2) === 0L)      // n_nulls
    assert(id.getLong(3) === 3L)      // n_distinct
    // numeric min/max, not lexical: max is "10", not "2"
    assert(id.getString(4) === "1" && id.getString(5) === "10")
    assert(id.isNullAt(6))            // sum_len null for non-strings

    assert(id.getDouble(7) === 5.75)  // mean of 1, 2, 10, 10

    val s = rows("s")
    assert(s.getLong(2) === 1L)
    assert(s.getLong(3) === 3L)       // distinct ignores the null
    assert(s.getString(4) === "aa" && s.getString(5) === "c")
    assert(s.getLong(6) === 7L)       // 2 + 4 + 1
    assert(s.isNullAt(7))             // mean null for non-numerics

    val v = rows("v")
    assert(v.getLong(2) === 1L)
    assert(v.getLong(3) === 2L)
    assert(v.isNullAt(6))
    assert(v.getDouble(7) === 7.5)    // (10 + 2.5 + 10) / 3, null skipped
  }

  test("approx: same shape, cardinalities within rsd of exact on a real table") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val exact = Profile.exact(orders, Seq("o_custkey", "o_orderstatus"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.approx(orders, Seq("o_custkey", "o_orderstatus"), rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(3L, (n * 0.1).toLong),
        s"$c: approx ${approx(c)} vs exact $n")
    }
  }

  test("plan shape: approx avoids the Expand the exact distincts need; one scan each") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val exactPlan = Profile.exact(orders, Seq("o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    val approxPlan = Profile.approx(orders, Seq("o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan.take(400))
    assert(!approxPlan.contains("Expand"), approxPlan.take(400))
    // single scan: the table is read once, not once per column
    Seq(exactPlan, approxPlan).foreach { p =>
      assert("Scan parquet".r.findAllIn(p).length === 1, p.take(400))
    }
  }

  test("approxAudited: Expand-free plan, exact stats, flags true; per-column pruned audit scans") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val cols = Seq("o_custkey", "o_orderstatus")
    val audited = Profile.approxAudited(orders, cols)
    val plan = audited.queryExecution.executedPlan.toString
    // the whole point vs Profile.exact: NO Expand anywhere — the
    // audit side is one single-distinct two-phase aggregate per
    // column (1 serving scan + N pruned audit scans)
    assert(!plan.contains("Expand"), plan.take(600))
    assert("Scan parquet".r.findAllIn(plan).length === 1 + cols.size,
      plan.take(600))
    val rows = audited.collect().map(r => r.getString(0) -> r).toMap
    val exact = Profile.exact(orders, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      // every emitted column is the EXACT value (estimate excluded)
      assert(rows(c).getLong(3) === exact(c).getLong(3), c)
      assert(rows(c).getLong(1) === exact(c).getLong(1), c)
      assert(rows(c).getString(4) === exact(c).getString(4), c)
      // the in-plan flag attests the (hidden) HLL estimate at rsd
      // 0.05 sits within 15% of the exact count
      assert(rows(c).getBoolean(8), s"$c estimate drifted past 15%")
    }
  }

  test("approxBounded: Expand-free plan; exact n_distinct; flags hold") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice")
    val bounded = Profile.approxBounded(orders, cols)
    val plan = bounded.queryExecution.executedPlan.toString
    // round 20: the multi-distinct Expand (N× row amplification) is
    // gone — one HLL pass + one pruned single-distinct agg per column
    assert(!plan.contains("Expand"), plan.take(600))
    val rows = bounded.collect().map(r => r.getString(0) -> r).toMap
    val exact = Profile.exact(orders, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      assert(rows(c).getLong(1) === exact(c).getLong(3),
        s"$c n_distinct must stay the exact count")
      assert(rows(c).getBoolean(2), s"$c estimate drifted past 15%")
    }
    assert(rows.size === cols.size)
  }

  test("histogramDrift: identical samples read zero; a shift shows up as TV distance") {
    val a = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Profile.histogramDrift(a, a, "v", 0.0, 100.0, 10)
      .agg(sum(col("contrib"))).head.getDouble(0)
    assert(same === 0.0)
    // b shifted up by half the domain: distributions barely overlap
    val b = (1 to 1000).map(i => (i % 100).toDouble + 50.0).toDF("v")
    val rows = Profile.histogramDrift(a, b, "v", 0.0, 100.0, 10)
    val tv = rows.agg(sum(col("contrib"))).head.getDouble(0) / 2
    assert(tv > 0.4 && tv <= 1.0, s"tv=$tv")
    // every grid bin present; b's mass (incl. the clamped overflow)
    // dominates the top bin
    assert(rows.count() === 10L)
    val top = rows.filter(col("bin") === 9).head
    assert(top.getLong(2) > top.getLong(1)) // n_b > n_a
    // and bins that only ONE side occupies are zero-filled rows, not
    // missing rows: a alone covers [0,50) → b has zero there
    assert(rows.filter(col("bin") < 5 && col("n_b") === 0).count() === 5L)
  }

  test("checkExpectations: one pass, null predicate counts as violation") {
    val d = Seq(
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None))
      .toDF("id", "v")
    val got = Profile.checkExpectations(d, Seq(
        "v_positive" -> (col("v") > 0),     // -1 fails; NULL fails
        "id_nonnull" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("v_positive") === ((2L, 3L)))
    assert(got("id_nonnull") === ((0L, 3L)))
    // single scan
    val plan = Profile.checkExpectations(
      Tables.orders(spark, "/root/testdata/sf0.001"),
      Seq("a" -> (col("o_totalprice") > 0), "b" -> col("o_custkey").isNotNull))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length === 1, plan.take(400))
  }

  test("observeExpectations: counters off a host action equal the dedicated pass") {
    val d = Seq(
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None))
      .toDF("id", "v")
    val rules = Seq(
      "v_positive" -> (col("v") > 0),
      "id_nonnull" -> col("id").isNotNull)
    val (instrumented, obs) = Profile.observeExpectations(d, rules)
    instrumented.write.format("noop").mode("overwrite").save() // the host action
    val m = obs.get
    val agg = Profile.checkExpectations(d, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_rows") === 3L)
    rules.foreach { case (name, _) =>
      assert(m(name) === agg(name), s"observe vs aggregate diverged on $name")
    }
    // duplicate / reserved rule names fail loudly
    intercept[IllegalArgumentException] {
      Profile.observeExpectations(d, Seq("n_rows" -> col("id").isNotNull))
    }
    intercept[IllegalArgumentException] {
      Profile.observeExpectations(d,
        Seq("r" -> col("id").isNotNull, "r" -> (col("v") > 0)))
    }
  }

  test("giniImpurity: 0 for a constant column, (k-1)/k for uniform over k values") {
    val const = Seq.fill(100)("x").toDF("c")
    assert(Profile.giniImpurity(const, "c").head.getDouble(2) === 0.0)
    val uniform = (1 to 100).map(i => s"v${i % 4}").toDF("c")
    assert(Profile.giniImpurity(uniform, "c").head.getDouble(2) === 0.75)
    // nulls count as a value
    val withNull = Seq(Some("a"), Some("a"), None, None).toDF("c")
    assert(Profile.giniImpurity(withNull, "c").head.getDouble(2) === 0.5)
  }

  test("empty input: zero rows, zero distinct, null min/max") {
    val r = Profile.exact(df.filter(lit(false)), Seq("id", "s")).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("id").getLong(1) === 0L && r("id").getLong(3) === 0L)
    assert(r("id").isNullAt(4) && r("id").isNullAt(5))
    assert(r("s").getLong(2) === 0L)
  }

  test("perClassMetrics: tp/support/predicted with null-on-zero denominators") {
    val conf = Seq(
      ("en", "en", 8L), ("en", "de", 2L),
      ("de", "de", 5L), ("fr", "en", 1L))
      .toDF("actual", "predicted", "n")
    val got = Profile.perClassMetrics(conf).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got("en") === ((8L, 10L, 9L, 888888L, 800000L)))
    assert(got("de") === ((5L, 5L, 7L, 714285L, 1000000L)))
    // fr was never predicted: precision undefined (NULL), recall 0
    assert(got("fr") === ((0L, 1L, 0L, -1L, 0L)))
  }

  test("fkOrphans: orphan/null accounting, duplicate parents don't fan out") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk") // 1 resolves (twice), 9 is an orphan, null is skipped
    val parent = Seq(1L, 1L, 2L).toDF("pk") // duplicated parent key
    val r = Profile.fkOrphans(child, "fk", parent, "pk", "t").collect().head
    assert(r.getString(0) === "t")
    assert(r.getLong(1) === 4L)       // n_child counts every row
    assert(r.getLong(2) === 3L)       // non-null keys
    assert(r.getLong(3) === 1L)       // only 9 is orphaned
    assert(r.getLong(4) === 333333L)  // 1/3 in ppm, floor
    // all-null child: rate undefined, counts still reported
    val nulls = Seq(Option.empty[Long]).toDF("fk")
    val r2 = Profile.fkOrphans(nulls, "fk", parent, "pk", "n").collect().head
    assert(r2.getLong(2) === 0L && r2.getLong(3) === 0L && r2.isNullAt(4))
  }
}
