package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Mergeable HLL sketches: merge-vs-direct equivalence (the property
  * that makes persisted partials lossless), accuracy vs exact
  * distinct, and bounded sketch size.
  */
class SketchesSpec extends SparkSpecBase {

  import spark.implicits._

  // 5 groups x 20 slices, overlapping member sets across slices.
  private def df = (1L to 20000L).map { i =>
    (s"g${i % 5}", (i % 20).toInt, i % 1777)
  }.toDF("grp", "slice", "member")

  test("merging slice sketches equals sketching the history directly") {
    val merged = Sketches.hllMerge(
      Sketches.hllPartials(df, Seq("grp"), "slice", "member"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val direct = df.groupBy("grp")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("member"), lit(12)))
        .as("approx_distinct"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
    assert(merged.size === 5)
  }

  test("estimates land within HLL error of the exact distinct counts") {
    val est = Sketches.hllMerge(
      Sketches.hllPartials(df, Seq("grp"), "slice", "member"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("grp").agg(count_distinct(col("member")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.05,
        s"$g: est ${est(g)} vs exact $n")
    }
  }

  test("histogram merge equals the direct histogram (exact algebra)") {
    val vals = df.withColumnRenamed("member", "v")
    val merged = Sketches.histogramMerge(
      Sketches.histogramPartials(vals, Seq("grp"), "slice", "v", 0.0, 2048.0, 16),
      Seq("grp"), 16)
      .as[(String, Seq[Long])].collect().toMap
    val direct = vals.withColumn("__bin",
        Sketches.histBin(col("v"), 0.0, 2048.0, 16))
      .groupBy("grp")
      .agg(array((0 until 16).map(i =>
        count(when(col("__bin") === i, 1))): _*).as("hist"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === direct)
    merged.values.foreach(h => assert(h.sum === 4000L))
  }

  test("histogram quantile lands within one bin width of the exact percentile") {
    val vals = df.withColumnRenamed("member", "v")
    val merged = Sketches.histogramMerge(
      Sketches.histogramPartials(vals, Seq("grp"), "slice", "v", 0.0, 2048.0, 64),
      Seq("grp"), 64)
    val est = merged.select(col("grp"),
      Sketches.histogramQuantile(col("hist"), 0.0, 2048.0, 64, 0.5).as("p50"))
      .as[(String, Double)].collect().toMap
    val exact = vals.groupBy("grp")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY v)").as("p50"))
      .as[(String, Double)].collect().toMap
    val width = 2048.0 / 64
    exact.foreach { case (g, x) =>
      assert(math.abs(est(g) - x) <= width, s"$g: est ${est(g)} vs exact $x")
    }
  }

  test("histogram quantile of an empty histogram is NULL; clamping catches outliers") {
    val empty = Seq(Seq.empty[Long]).toDF("hist")
      .select(Sketches.histogramQuantile(col("hist"), 0.0, 10.0, 4, 0.5).as("q"))
    assert(empty.head.isNullAt(0))
    val out = Seq((1L, 0, -50.0), (2L, 0, 999.0)).toDF("id", "s", "v")
    val h = Sketches.histogramPartials(out, Seq.empty, "s", "v", 0.0, 10.0, 4)
      .select("hist").as[Seq[Long]].head
    assert(h === Seq(1L, 0L, 0L, 1L)) // clamped into the edge bins
  }

  test("theta merge equals direct sketch; union estimate within 5% of exact") {
    val merged = Sketches.thetaMerge(
      Sketches.thetaPartials(df, Seq("grp"), "slice", "member"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val direct = df.groupBy("grp")
      .agg(theta_sketch_estimate(theta_sketch_agg(col("member"), lit(12)))
        .cast("long").as("approx_distinct"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
    val exact = df.groupBy("grp").agg(count_distinct(col("member")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.05,
        s"$g: est ${merged(g)} vs exact $n")
    }
  }

  test("theta set algebra: intersection and differences within 5% of exact") {
    val parts = Sketches.thetaPartials(df, Seq("grp"), "slice", "member")
    val got = Sketches.thetaOverlap(parts, "grp", "g1", "g2")
      .as[(Long, Long, Long)].head()
    def members(g: String) = df.filter(col("grp") === g)
      .select("member").as[Long].collect().toSet
    val (a, b) = (members("g1"), members("g2"))
    def close(est: Long, exact: Int) =
      assert(math.abs(est - exact).toDouble / math.max(exact, 1) < 0.05,
        s"est $est vs exact $exact")
    close(got._1, (a & b).size)
    close(got._2, (a -- b).size)
    close(got._3, (b -- a).size)
  }

  test("CMS merged estimates never underestimate and respect the eps bound") {
    val toks = df.select(col("slice"),
      concat(lit("m"), col("member")).as("token"))
    val cms = Sketches.cmsMerge(
      Sketches.cmsPartials(toks, "slice", "token", eps = 0.0001))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(50)
      .as[(String, Long)].collect()
    val total = toks.count()
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"$t: CMS must never underestimate ($est < $n)")
      assert(est <= n + (0.0001 * total).ceil.toLong + 1,
        s"$t: est $est exceeds eps bound over exact $n")
    }
  }

  test("a partial sketch is KBs regardless of slice row count") {
    val sizes = Sketches.hllPartials(df, Seq("grp"), "slice", "member")
      .select(length(col("sketch")).as("len")).as[Int].collect()
    // dense lgK=12 HLL serializes at ~4.1 KB, row count notwithstanding
    assert(sizes.nonEmpty && sizes.forall(_ <= 8192))
  }

  test("CMS default blob size matches the documented arithmetic (~112 KB)") {
    val toks = df.select(col("slice"), concat(lit("m"), col("member")).as("token"))
    val sizes = Sketches.cmsPartials(toks, "slice", "token")
      .select(length(col("sketch")).as("len")).as[Int].collect()
    // width = ceil(2/eps) = 2000, depth = ceil(log2(1/(1-conf))) = 7,
    // 8-byte long counters → 112 KB + small header; NOT "one ~KB blob"
    val expected = 2000 * 7 * 8
    assert(sizes.nonEmpty && sizes.forall(s => s >= expected && s <= expected + 4096),
      s"blob sizes ${sizes.distinct.toSeq} vs documented ~$expected")
  }

  test("cmsMerge on an empty slice table fails with a clear message, not empty.reduce") {
    val empty = df.filter(lit(false))
      .select(col("slice"), col("member").cast("string").as("token"))
    val e = intercept[IllegalArgumentException] {
      Sketches.cmsMerge(Sketches.cmsPartials(empty, "slice", "token"))
    }
    assert(e.getMessage.contains("no CMS partials"))
  }

  test("thetaMerge/thetaOverlap honor a non-default lgK (no silent downsample)") {
    // lgK 16 partials merged at lgK 16: estimates stay exact-mode for
    // this cardinality (1777 distinct < 2^16 nominal entries)
    val parts = Sketches.thetaPartials(df, Seq("grp"), "slice", "member", lgK = 16)
    val merged = Sketches.thetaMerge(parts, Seq("grp"), lgK = 16)
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("grp").agg(count_distinct(col("member")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.02,
        s"$g: est ${merged(g)} vs exact $n at lgK 16")
    }
    val ov = Sketches.thetaOverlap(parts, "grp", "g1", "g2", lgK = 16)
    assert(ov.columns.toSeq === Seq("both", "only_a", "only_b"))
  }

  test("theta overlap on the events corpus lands within 3 sigma of the exact SQL counts (sf0.001)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts").cast("date").as("day"), col("user_id"))
    val parts = Sketches.thetaPartials(ev, Seq("event_type"), "day", "user_id")
    val got = Sketches.thetaOverlap(parts, "event_type", "click", "purchase")
      .as[(Long, Long, Long)].head()
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").as[Long].collect().toSet
    val (a, b) = (users("click"), users("purchase"))
    // published theta RSE at lgK 12 is 1/sqrt(2^12) ≈ 1.5625%; 3σ ≈
    // 4.69% of the estimated set's size (exact-mode sketches — small
    // corpora — land at 0)
    def within3Sigma(est: Long, exact: Int): Unit = {
      val sigma3 = 3.0 / math.sqrt(1 << 12) * math.max(exact, 1)
      assert(math.abs(est - exact) <= math.max(sigma3, 1.0),
        s"est $est vs exact $exact (3 sigma = $sigma3)")
    }
    within3Sigma(got._1, (a & b).size)
    within3Sigma(got._2, (a -- b).size)
    within3Sigma(got._3, (b -- a).size)
  }

  test("CMS string buckets match the reimplemented double-hashed murmur (oracle premise)") {
    // q_cms_tokens' DuckDB oracle recomputes Spark's bucket derivation
    // from scratch: murmur3_x86_32 with per-byte sign-extended tail
    // mixing, h2 chained off h1, abs((h1 + i*h2) % width) in signed
    // 32-bit arithmetic. Pin that reimplementation against the sketch
    // library's private getHashBuckets so a Spark upgrade that changes
    // hashing breaks HERE, not silently in the driver gate. Also pin
    // the depth/width the oracle hard-codes for the default build.
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    assert(cms.depth === 7 && cms.width === 2000,
      s"default CMS geometry moved: ${cms.depth}x${cms.width}")

    def mixK1(k: Int): Int = {
      var k1 = k * 0xcc9e2d51
      k1 = Integer.rotateLeft(k1, 15)
      k1 * 0x1b873593
    }
    def mixH1(h: Int, k1: Int): Int = {
      var h1 = h ^ k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 * 5 + 0xe6546b64
    }
    def fmix(h: Int, len: Int): Int = {
      var h1 = h ^ len
      h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
      h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
      h1 ^ (h1 >>> 16)
    }
    def murmur(data: Array[Byte], seed: Int): Int = {
      var h1 = seed
      val aligned = data.length - data.length % 4
      var i = 0
      while (i < aligned) {
        val w = (data(i) & 0xFF) | (data(i + 1) & 0xFF) << 8 |
          (data(i + 2) & 0xFF) << 16 | (data(i + 3) & 0xFF) << 24
        h1 = mixH1(h1, mixK1(w))
        i += 4
      }
      while (i < data.length) {
        h1 = mixH1(h1, mixK1(data(i))) // sign-extended tail byte
        i += 1
      }
      fmix(h1, data.length)
    }
    def buckets(token: String, depth: Int, width: Int): Array[Int] = {
      val bytes = token.getBytes("UTF-8")
      val h1 = murmur(bytes, 0)
      val h2 = murmur(bytes, h1)
      Array.tabulate(depth)(i => math.abs((h1 + i * h2) % width))
    }

    val m = Class.forName("org.apache.spark.util.sketch.CountMinSketchImpl")
      .getDeclaredMethod("getHashBuckets",
        classOf[Array[Byte]], classOf[Int], classOf[Int])
    m.setAccessible(true)
    val rnd = new scala.util.Random(17)
    val toks = Seq("key", "a", "lineitem", "xyzzy") ++
      (1 to 100).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    for (t <- toks) {
      val expected = m.invoke(null, t.getBytes("UTF-8"),
        Integer.valueOf(7), Integer.valueOf(2000)).asInstanceOf[Array[Int]]
      assert(buckets(t, 7, 2000).sameElements(expected), s"token '$t'")
    }
  }

  test("portable HLL: merge == direct, bounded registers, estimate tracks exact") {
    import graft.operators.Sketches
    val rnd = new scala.util.Random(31)
    val n = 20000
    val keys = (0 until n).map(_ => rnd.alphanumeric.take(10).mkString).distinct
    val df = keys.zipWithIndex
      .map { case (k, i) => (if (i % 2 == 0) "a" else "b", k) }
      .toDF("slice", "k")
    val direct = Sketches.hllPortableRegisters(df, Seq.empty, col("k"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // register table bounded by 2^p and every register positive
    assert(direct.size <= (1 << 12) && direct.values.forall(_ >= 1))
    // merging per-slice registers == building over the union (exact algebra)
    val slices = Sketches.hllPortableRegisters(df, Seq("slice"), col("k"))
    val merged = Sketches.hllPortableMerge(
        slices.select(col("bucket"), col("register")), Seq.empty)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged === direct)
    // estimator within ~3 standard errors (1.04/sqrt(m) ~ 1.6%)
    val est = Sketches.hllPortableEstimate(
      Sketches.hllPortableRegisters(df, Seq.empty, col("k")))
    val exact = keys.size.toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
    // small-cardinality branch: linear counting keeps tiny sets accurate
    val tiny = (0 until 50).map(i => ("t", s"key_$i")).toDF("slice", "k")
    val estTiny = Sketches.hllPortableEstimate(
      Sketches.hllPortableRegisters(tiny, Seq.empty, col("k")))
    assert(math.abs(estTiny - 50.0) / 50.0 < 0.1, s"estTiny=$estTiny")
    // determinism under repartitioning (max aggregate, integer inputs)
    val again = Sketches.hllPortableRegisters(df.repartition(13), Seq.empty, col("k"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(again === direct)
  }
}
