package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** One-pass column profiling: the data-quality sweep a 100 TB ingest
  * runs before anything downstream trusts the table — per column, row
  * and null counts, distinct cardinality, min/max, and (for strings)
  * total length. The reference has no profiling surface; its
  * presence/null checks (`DataCleaning.py:64-117`, SURVEY §2 P2/P3)
  * are the per-row fragment of what this computes per-column.
  *
  * Scale shape: everything is ONE global aggregate over a single scan
  * — per-partition partials collapse to one row per partition before
  * the (single-row) final merge, so the shuffle is O(partitions), not
  * O(rows). The one-row result then unpivots to a row per column with
  * `stack` (driver-free, stays in-plan). Two variants:
  *
  *  - [[exact]] uses `count(DISTINCT c)`; Catalyst plans the N
  *    distinct aggregates as one Expand pass (N× row amplification
  *    over one scan). Exact, oracle-checkable, right for audits.
  *  - [[approx]] swaps in `approx_count_distinct` (HLL±rsd): no
  *    Expand, plain partial/final partials — the steady-state profile
  *    at 100 TB, where a 2% cardinality error is fine and an N×
  *    amplified scan is not.
  *
  * min/max are computed in the column's own type (so numerics order
  * numerically, not lexically) and cast to string only for the
  * uniform output schema. `sum_len` is NULL for non-string columns —
  * length of a cast numeric would profile the print format, not the
  * data. `mean` (numeric columns only) is built engine-portably so
  * even DOUBLE columns stay oracle-exact: sum in DECIMAL(38,4)
  * (exact, order-independent), cast to double (correctly rounded
  * from the same decimal in every engine), ONE double division, then
  * [[graft.functions.Det.round]] — no step depends on partition
  * order or on an engine's float-print format. (The DECIMAL(38,4)
  * cast itself rounds half-up in Spark; inputs with ≤ 4 fractional
  * digits — money, counts, ids — are exact.)
  */
object Profile {

  /** Per-column stats rows: `(col_name, n_rows, n_nulls, n_distinct,
    * min_s, max_s, sum_len, mean)`.
    */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, c => count_distinct(col(c)))

  /** [[exact]] with HLL distinct counts (`rsd` relative error) — the
    * no-Expand scan for routine runs at corpus scale.
    */
  def approx(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profile(df, cols, c => approx_count_distinct(col(c), rsd))

  /** [[approx]] with a driver-checkable bound: per column, the EXACT
    * distinct count (SQL-reproducible in any engine) plus a boolean
    * attesting the HLL estimate landed within `pct`% of it. This is
    * the audit form — it pays the exact-distinct Expand the pure
    * [[approx]] serving plan avoids, in exchange for every run
    * cross-checking the estimator against ground truth (both
    * aggregates share the single scan). Integer comparison
    * (|est−exact|·100 ≤ pct·exact) so the flag is engine-portable
    * and, HLL being deterministic given the data, stable.
    */
  def approxBounded(
      df: DataFrame,
      cols: Seq[String],
      rsd: Double = 0.05,
      pct: Int = 15): DataFrame = {
    require(cols.nonEmpty, "Profile: no columns to profile")
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "Profile: column names must not contain backticks or quotes")
    // N count_distinct in ONE aggregate is what Catalyst plans as an
    // Expand — N× row amplification over the scan (round 20: this was
    // the last profiling entry still paying it; the bench measured
    // 2.0 s where the audited serving plan over the same five columns
    // did MORE work in 0.5 s). Same decomposition as [[approxAudited]]:
    // the HLL estimates are plain aggregates (one N-column pass, no
    // Expand) and each exact distinct gets its OWN single-distinct
    // aggregate — a two-phase hash agg over a scan pruned to that
    // column, zero amplification. Same aggregates, same flag
    // arithmetic, identical output (plan-pinned Expand-free in
    // ProfileSpec).
    val hllAggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"__a_$c"))
    val hllOne = df.agg(hllAggs.head, hllAggs.tail: _*)
    val hllStack = cols.map(c => s"'$c', `__a_$c`").mkString(", ")
    val hllRows = hllOne.select(expr(s"stack(${cols.size}, $hllStack)")
      .as(Seq("col_name", "__a")))
    val exact = cols.map { c =>
      df.agg(count_distinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_.unionAll(_))
    exact.join(broadcast(hllRows), Seq("col_name"))
      .select(col("col_name"), col("n_distinct"),
        (abs(col("__a") - col("n_distinct")) * lit(100L) <=
          lit(pct.toLong) * col("n_distinct")).as(s"est_within_${pct}pct"))
  }

  /** The SERVING profile plan ([[approx]] — HLL distincts, NO
    * exact-distinct Expand) with a driver-checkable projection: the
    * full exact stats plus, per column, `est_within_<pct>pct` — the
    * HLL estimate cross-checked against an exact distinct count. The
    * raw estimate itself is EXCLUDED from the output (it is
    * Spark-internal, not SQL-reproducible), so every emitted column
    * is oracle-exact while the flag still fails loudly if the
    * estimator drifts past `pct`% (HLL is deterministic given the
    * data, so the flag is stable, not flaky).
    *
    * How the exact side stays Expand-free: N distinct aggregates in
    * ONE aggregate is what Catalyst plans as an Expand (N× row
    * amplification over the scan — the [[exact]] audit plan this
    * serving path exists to avoid). Instead each column gets its OWN
    * single-distinct aggregate — planned as a plain two-phase hash
    * aggregate over a scan pruned to THAT column. Total bytes read
    * across the N audit scans ≈ the one N-column serving scan
    * (columnar pruning), with no row amplification anywhere; the N
    * one-row results union and broadcast-join back to the serving
    * rows. Plan-pinned Expand-free in `ProfileSpec`.
    */
  def approxAudited(
      df: DataFrame,
      cols: Seq[String],
      rsd: Double = 0.05,
      pct: Int = 15): DataFrame = {
    require(cols.nonEmpty, "Profile: no columns to profile")
    val serve = approx(df, cols, rsd)
    val exact = cols.map { c =>
      df.agg(count_distinct(col(c)).as("__nd_exact"))
        .select(lit(c).as("col_name"), col("__nd_exact"))
    }.reduce(_.unionAll(_))
    serve.join(broadcast(exact), Seq("col_name"))
      .select(
        col("col_name"), col("n_rows"), col("n_nulls"),
        col("__nd_exact").as("n_distinct"),
        col("min_s"), col("max_s"), col("sum_len"), col("mean"),
        (abs(col("n_distinct") - col("__nd_exact")) * lit(100L) <=
          lit(pct.toLong) * col("__nd_exact")).as(s"est_within_${pct}pct"))
  }

  /** Expectation checking — assertion rules evaluated in ONE pass:
    * each rule is a boolean Column; the output is one row per rule
    * with its violation count (null predicate results count as
    * violations — an assertion that cannot evaluate has failed).
    * The data-quality CI gate: cheap enough to run on every ingest
    * batch, one global aggregate regardless of rule count, unpivoted
    * in-plan like [[exact]].
    */
  def checkExpectations(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "checkExpectations: no rules")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        count(when(!coalesce(pred, lit(false)), 1)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', `__v_$i`"
    }.mkString(", ")
    one.select(
        expr(s"stack(${rules.size}, $stackArgs)").as(Seq("rule", "n_violations")),
        col("__n").as("n_rows"))
      .select("rule", "n_violations", "n_rows")
  }

  /** [[checkExpectations]] at ZERO extra passes: the same rule
    * violation counters attached as an `observe` node on a frame the
    * pipeline is about to act on anyway (its write, its aggregate).
    * The counters accumulate inside the existing action's tasks — at
    * 100 TB the QC gate costs no second scan, which is the difference
    * between "checked on every ingest" and "checked when someone
    * remembers".
    *
    * Returns the instrumented frame plus the [[org.apache.spark.sql
    * .Observation]]; after ONE action on the returned frame,
    * `observation.get` yields `n_rows` and one violation count per
    * rule name. Null predicate results count as violations, exactly
    * as in [[checkExpectations]] (spec-pinned equal). Batch only —
    * streaming queries surface `observe` metrics through the
    * progress-listener API instead.
    */
  def observeExpectations(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]):
      (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "observeExpectations: no rules")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size && !names.contains("n_rows"),
      "observeExpectations: rule names must be unique and not 'n_rows'")
    val obs = org.apache.spark.sql.Observation()
    val aggs = count(lit(1)).as("n_rows") +: rules.map {
      case (name, pred) =>
        count(when(!coalesce(pred, lit(false)), 1)).as(name)
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Confusion matrix — the classifier-eval counterpart of the data
    * profiles: one row per (actual, predicted) pair with its count.
    * One hash aggregate over label pairs (map-side partials; the
    * shuffle carries at most |labels|² rows per partition), so
    * evaluating a filter model over a full corpus costs one scan.
    */
  def confusion(
      df: DataFrame,
      actualCol: String,
      predictedCol: String): DataFrame =
    df.groupBy(
        col(actualCol).as("actual"),
        col(predictedCol).as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision/recall/support from a [[confusion]] table
    * (`actual, predicted, n`): for every label seen on either axis,
    * `tp`, `support` (actual count), `predicted` (predicted count),
    * and precision/recall in ppm (integer floor div; NULL when the
    * denominator is zero — a never-predicted label has undefined
    * precision, not 0). The per-class view a single accuracy number
    * hides — the eval table a filter-model comparison actually reads.
    *
    * Scale shape: the confusion table is already ≤ |labels|² rows, so
    * everything here is bounded aggregates over a tiny frame; the
    * corpus was paid for once in [[confusion]].
    */
  def perClassMetrics(confusionDf: DataFrame): DataFrame = {
    val byActual = confusionDf.groupBy(col("actual").as("label"))
      .agg(sum(col("n")).as("support"))
    val byPred = confusionDf.groupBy(col("predicted").as("label"))
      .agg(sum(col("n")).as("predicted"))
    val tp = confusionDf.filter(col("actual") === col("predicted"))
      .select(col("actual").as("label"), col("n").as("tp"))
    byActual.join(byPred, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"))
      .withColumn("precision_ppm",
        when(col("predicted") === 0, lit(null).cast("long"))
          .otherwise(expr("(tp * 1000000) div predicted")))
      .withColumn("recall_ppm",
        when(col("support") === 0, lit(null).cast("long"))
          .otherwise(expr("(tp * 1000000) div support")))
  }

  /** Referential-integrity audit: one summary row for a child→parent
    * key relationship — total child rows, non-null keys, orphans
    * (non-null keys with no parent), and the orphan rate in ppm
    * (integer arithmetic; NULL when the child has no non-null keys).
    * The data-quality check warehouse loads run between ingest and
    * publish — [[checkExpectations]] covers row-local rules, this
    * covers the cross-TABLE invariant those rules cannot see.
    *
    * One pass: parent keys are distinct-projected (so duplicated
    * parent keys never fan the child out) and left-joined; counts
    * collapse in a single aggregate with map-side partials. At
    * 100 TB both sides shuffle on the key — the same cost as the
    * production join the check is protecting.
    */
  def fkOrphans(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      relation: String): DataFrame = {
    val hits = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(childKey).as("__k"))
      .join(hits, Seq("__k"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        count(col("__k")).as("n_nonnull"),
        sum(when(col("__k").isNotNull && col("__hit").isNull, lit(1L))
          .otherwise(lit(0L))).as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_nonnull"), col("n_orphans"))
      .withColumn("orphan_ppm",
        when(col("n_nonnull") === 0, lit(null).cast("long"))
          .otherwise(expr("(n_orphans * 1000000) div n_nonnull")))
  }

  /** Per-column value-concentration profile: Gini impurity
    * `1 − Σ (n_v/N)²` over the column's value frequencies — 0 when
    * one value dominates completely, approaching 1 as mass spreads.
    * The portable stand-in for entropy (whose `log` differs by ulps
    * across engines): squares of exact integer frequencies, one
    * fixed-shape double expression, Det-rounded — oracle-exact.
    * Detects the failure profiles can miss: a column whose distinct
    * count looks healthy while 99% of rows hold one value.
    *
    * One value-frequency aggregate (vocabulary-sized shuffle with
    * map-side partials) + one scalar fold. Nulls count as a value.
    */
  def giniImpurity(df: DataFrame, column: String, scale: Int = 6): DataFrame = {
    val freq = df.groupBy(col(column)).agg(count(lit(1)).as("__f"))
    freq.agg(
        sum(col("__f")).as("__n"),
        sum(col("__f") * col("__f")).as("__ss"))
      .select(
        lit(column).as("col_name"),
        col("__n").cast("long").as("n_rows"),
        graft.functions.Det.round(
          lit(1.0) - col("__ss").cast("double")
            / (col("__n").cast("double") * col("__n")), scale)
          .as("gini"))
  }

  /** Distribution-drift detection between two samples of the same
    * column — the "did yesterday's data look like today's" monitor
    * that catches schema-preserving corruption (unit changes, silent
    * truncation, upstream filter bugs) no null/min/max profile sees.
    *
    * Both sides bin through the shared equi-width grid
    * ([[Sketches.histBin]] — engine-exact integer bin assignment) in
    * ONE aggregate over the tagged union (a single shuffle of
    * O(bins) partial rows per partition); per-bin output carries both
    * counts and `contrib` = |n_a/N_a − n_b/N_b| Det-rounded to 8 dp —
    * summing `contrib` and halving gives total-variation distance in
    * [0, 1], exactly (DECIMAL-summable; the fixed-shape frequency
    * expression evaluates identically in any engine). Empty bins on
    * either side read as 0, every grid bin gets a row.
    */
  def histogramDrift(
      a: DataFrame,
      b: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1 && lo < hi, "need bins >= 1 and lo < hi")
    val tagged = a.select(col(valueCol).as("__v"), lit("a").as("__s"))
      .unionAll(b.select(col(valueCol).as("__v"), lit("b").as("__s")))
    val counts = tagged
      .withColumn("bin", Sketches.histBin(col("__v"), lo, hi, bins))
      .groupBy("bin")
      .agg(count(when(col("__s") === "a", 1)).as("n_a"),
        count(when(col("__s") === "b", 1)).as("n_b"))
    val grid = a.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
    val totals = counts.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    grid.join(counts, Seq("bin"), "left_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(totals))
      .withColumn("contrib", graft.functions.Det.round(
        abs(col("n_a").cast("double") / col("__ta")
          - col("n_b").cast("double") / col("__tb")), 8))
      .drop("__ta", "__tb")
  }

  private def profile(
      df: DataFrame,
      cols: Seq[String],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "Profile: no columns to profile")
    // names ride through a stack() SQL string backtick-quoted
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "Profile: column names must not contain backticks or quotes")
    val schema = df.schema
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val isString = schema(c).dataType == StringType
      val isNumeric = schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      Seq(
        count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        (if (isString) sum(length(col(c))) else lit(null).cast("long"))
          .as(s"__sl_$c"),
        (if (isNumeric)
           graft.functions.Det.round(
             sum(col(c).cast("decimal(38,4)")).cast("double")
               / count(col(c)).cast("double"), 4)
         else lit(null).cast("double"))
          .as(s"__mean_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack(n, label, nulls, distinct, min, max, sumlen, ...) — the
    // one-row frame fans out to a row per column without leaving the
    // plan. Backtick-quoting keeps arbitrary column names intact.
    val stackArgs = cols.map { c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__min_$c`, `__max_$c`, `__sl_$c`, `__mean_$c`"
    }.mkString(", ")
    one.select(
        col("__n"),
        expr(s"stack(${cols.size}, $stackArgs)")
          .as(Seq("col_name", "__nn", "n_distinct", "min_s", "max_s", "sum_len",
            "mean")))
      .select(
        col("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_nulls"),
        col("n_distinct"),
        col("min_s"),
        col("max_s"),
        col("sum_len"),
        col("mean"))
  }
}
