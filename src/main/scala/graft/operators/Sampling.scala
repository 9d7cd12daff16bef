package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. No RNG state:
  * every decision derives from a multiplicative hash of the row id,
  * so any engine (and any re-run over re-partitioned data) selects
  * the identical row set — the property that makes dataset releases
  * reproducible.
  */
object Sampling {

  /** 31-bit multiplicative hash of an id (Knuth's 2654435761, reduced
    * mod the Mersenne prime p = 2^31-1). The id is reduced mod p
    * BEFORE the multiply: (id mod p)·m ≤ (2^31-2)·2654435761 < 2^63,
    * so ANSI arithmetic never overflows for any long id — and since
    * (id mod p)·m ≡ id·m (mod p), the hash value is unchanged from
    * the unreduced form wherever that form didn't overflow.
    */
  def idHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(2147483647L)) * lit(2654435761L), lit(2147483647L))

  /** Per-group TOKEN budget: within each group, keep rows in
    * deterministic hash order until the group's token budget is
    * exhausted — the unit a training mixture actually provisions in
    * (a 10k-DOC quota admits 100× more English than Estonian text; a
    * 10M-TOKEN budget admits the same training mass). A row is kept
    * iff the budget was not already spent before it, so every group
    * keeps at least its first row and overshoot is bounded by one
    * document.
    *
    * Scale shape: one shuffle by group; the running sum is a per-group
    * bounded window ordered by `(idHash(id), id)` — the same
    * engine-portable order [[epochOrder]] shuffles with, so the kept
    * set is a deterministic function of (ids, token counts, budget)
    * on any engine or partitioning. NULL token counts spend 0.
    */
  def tokenBudgetPerGroup(
      df: DataFrame,
      groupCol: String,
      id: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(idHash(col(id)), col(id))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__spent",
        sum(coalesce(col(tokensCol).cast("long"), lit(0L))).over(w))
      .filter(col("__spent") - coalesce(col(tokensCol).cast("long"), lit(0L))
        < budget)
      .drop("__spent")
  }

  /** Bernoulli-style fixed-rate sample: keeps rows whose hash falls
    * in the lowest `num/den` fraction of hash space. Map-only (no
    * shuffle) — the 100 TB form.
    */
  def hashSample(df: DataFrame, id: String, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need 0 < num <= den")
    df.filter(idHash(col(id)) * den < lit(2147483647L) * num)
  }

  /** Exact-quota stratified sample: within each stratum, rank rows by
    * id hash and keep the first `floor(num/den * stratum_size)`.
    * Guarantees per-stratum proportions exactly (a plain hash filter
    * only hits them in expectation), at the cost of one shuffle on
    * the stratum key plus a per-stratum sort — the same cost profile
    * as any grouped window, and skew-safe as long as no single
    * stratum exceeds a task's spill budget.
    *
    * The quota compare `rn * den <= n * num` is pure integer
    * arithmetic — no float rounding to diverge between engines.
    */
  def stratifiedSample(
      df: DataFrame,
      strata: Seq[String],
      id: String,
      num: Int,
      den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need 0 < num <= den")
    val part = Window.partitionBy(strata.map(col): _*)
    val w = part.orderBy(idHash(col(id)), col(id))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .filter(col("__rn") * den <= col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Deterministic epoch ordering: each row's position in the
    * hash-of-id shuffled read order — the reproducible "shuffle" a
    * training run consumes, identical on every engine and rerun.
    *
    * The global rank is computed WITHOUT a single-partition window
    * (the classic scale-killer): hash keys are uniform in
    * [0, 2³¹-1), so bucketing by key range gives ORDERED buckets —
    * position = (rows in lower buckets) + (rank within bucket).
    * One groupBy for the ≤`buckets` bucket counts (driver-side
    * prefix sum over that bounded list), one per-bucket window.
    * Same two-pass prefix-sum shape as `Packing.concatChunkPack`.
    *
    * Returns the input plus `shuffle_key` and `epoch_pos` (0-based).
    * `__bkt`/`__off` must not pre-exist in the input.
    */
  def epochOrder(df: DataFrame, id: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(!df.columns.contains("__bkt") && !df.columns.contains("__off"),
      "__bkt/__off are reserved by epochOrder")
    val p = 2147483647L
    val keyed = df
      .withColumn("shuffle_key", idHash(col(id)))
      .withColumn("__bkt", (col("shuffle_key") * buckets / p).cast("int"))
    val counts = keyed.groupBy("__bkt").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets).scanLeft(0L) {
      case (acc, b) => acc + counts.getOrElse(b, 0L)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = (0 until buckets).map(b => (b, offsets(b))).toDF("__bkt", "__off")
    val w = Window.partitionBy("__bkt")
      .orderBy(col("shuffle_key"), col(id))
    keyed
      .join(broadcast(offDf), Seq("__bkt"))
      .withColumn("epoch_pos",
        col("__off") + row_number().over(w) - 1)
      .drop("__bkt", "__off")
  }

  /** Weight-proportional Bernoulli sampling: keep each row with
    * probability `weight` (clamped to [0,1]) — quality-weighted
    * corpus selection, where a 0.9-quality doc is 3× likelier to
    * survive than a 0.3 one. Deterministic (hash threshold, no RNG)
    * and map-only. The compare is exact cross-engine when `weight`
    * is itself engine-exact (e.g. a Det-rounded score): hash and
    * threshold are both exactly-representable doubles.
    */
  def weightedSample(df: DataFrame, id: String, weight: Column): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(idHash(col(id)).cast("double") < w * lit(2147483647.0))
  }

  /** Training-mixture sampling: each source (group) is kept at its
    * own rate — the standard way a pretraining corpus re-weights
    * web/books/code/wiki slices into a target mixture. `rates` maps
    * group value → (num, den); groups absent from `rates` fall back
    * to `default` (drop-all when None).
    *
    * Same hash-threshold decision as [[hashSample]], so it is
    * map-only (no shuffle — filtering 100 TB is a scan), fully
    * deterministic, and composable: a row kept at rate 1/2 is a
    * subset of the rows kept at 3/4 (nested samples for scaling-law
    * runs come free).
    */
  def mixtureSample(
      df: DataFrame,
      groupCol: String,
      id: String,
      rates: Seq[(String, Int, Int)],
      default: Option[(Int, Int)] = None): DataFrame = {
    (rates.map { case (_, n, d) => (n, d) } ++ default).foreach { case (n, d) =>
      require(n >= 0 && d > 0 && n <= d, "need 0 <= num <= den, den > 0")
    }
    val p = lit(2147483647L)
    val h = idHash(col(id))
    val fallback = default
      .map { case (n, d) => (h * d) < (p * n) }
      .getOrElse(lit(false))
    val keep = rates.foldRight(fallback) { case ((g, n, d), acc) =>
      when(col(groupCol) === g, (h * d) < (p * n)).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Temperature-smoothed mixture sampling at α = 1/2: sampled
    * per-source sizes become proportional to `sqrt(n_source)` — the
    * published smoothing for multilingual/multi-source pretraining
    * mixes (large sources are damped, the SMALLEST source is kept
    * whole; rarer slices thus gain relative share without
    * duplication). Per-source keep rate `r_g = sqrt(minN / n_g)`,
    * decided by the same deterministic id hash as [[hashSample]].
    *
    * Exactness trick: `h < r_g·M ⟺ h²·n_g < minN·M²` (h ≥ 0), so
    * the decision is pure integer arithmetic in DECIMAL(38) —
    * `h² < 2⁶²`, times a count — and NO floating `pow`/`sqrt` whose
    * last-ulp differences between engines would flip boundary rows.
    * Cost: one tiny per-source count aggregate (|sources| rows,
    * broadcast back), then a map-only filter — filtering 100 TB
    * stays a scan.
    */
  def sqrtTemperatureSample(df: DataFrame, groupCol: String, id: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__minn"))
    val m = lit(2147483647L).cast("decimal(38,0)")
    val h = idHash(col(id)).cast("decimal(38,0)")
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(minN)) // 1-row scalar anchor
      .filter(h * h * col("__n") < col("__minn") * m * m)
      .drop("__n", "__minn")
  }
}
