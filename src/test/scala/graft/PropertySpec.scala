package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.operators.{Dedup, Relational, TextAnalysis}

/** Property-based pins (SURVEY.md §5): the operator implementations
  * agree with independent formulations on random inputs, ties
  * included.
  */
class PropertySpec extends SparkSpecBase {

  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  // Small keyed event sets with deliberate ts collisions.
  private val genEvents: Gen[List[(String, Timestamp, Long, Double)]] =
    Gen.listOfN(40, for {
      key <- Gen.oneOf("a", "b", "c")
      tsSec <- Gen.choose(0, 5) // few distinct ts → frequent ties
      value <- Gen.choose(1, 999)
    } yield (key, new Timestamp(1700000000000L + tsSec * 1000L), 0L, value / 10.0))
      .map(_.zipWithIndex.map { case ((k, t, _, v), i) => (k, t, i.toLong, v) })

  test("prop: latestPerGroup ≡ row_number()=1 over (ts desc, seq desc), under ties") {
    check(Prop.forAll(genEvents) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("key", "ts", "seq", "value")
        val viaAgg = Relational.latestPerGroup(df, Seq("key"), Seq("ts", "seq"), Seq("value"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").desc)
        val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
        viaAgg == viaWindow
      }
    })
  }

  test("prop: firstPerGroup ≡ in-memory min by (ts, seq)") {
    check(Prop.forAll(genEvents) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("key", "ts", "seq", "value")
        val got = Relational.firstPerGroup(df, Seq("key"), Seq("ts", "seq"), Seq("value"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val want = rows.groupBy(_._1).map { case (k, g) =>
          k -> g.minBy(r => (r._2.getTime, r._3))._4
        }
        got == want
      }
    })
  }

  test("prop: retentionFilter ≡ in-memory strict filter off max ts") {
    check(Prop.forAll(genEvents) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("key", "ts", "seq", "value")
        val got = Relational.retentionFilter(df, "ts", days = 0)
          .select("seq").collect().map(_.getLong(0)).toSet
        // 0-day window: strictly greater than (max − 0) ⇒ empty
        got.isEmpty
      }
    })
  }

  test("prop: fingerprint invariant under whitespace renormalization") {
    val genToks = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2"))
    check(Prop.forAll(genToks, Gen.oneOf(" ", "  ", "\t", " \t ")) { (toks, sep) =>
      val a = toks.mkString(" ")
      val b = sep + toks.mkString(sep) + sep
      val fps = Seq(a, b).toDF("text")
        .select(TextAnalysis.fingerprint(col("text")).as("fp"))
        .collect().map(_.getLong(0))
      fps(0) == fps(1)
    })
  }

  test("prop: CharGramHashExpr rolling hashes equal the direct per-position recompute") {
    // The rolling update h' = (h - s[i]·B^(l-1))·B + s[i+l] is the
    // subtle arithmetic; pin it against the naive O(n·l) per-window
    // fold on random strings (incl. repeats and non-ASCII chars).
    val genStr = Gen.listOfN(40,
      Gen.oneOf(('a' to 'e') ++ Seq(' ', 'é', '中'))).map(_.mkString)
    check(Prop.forAll(genStr, Gen.choose(1, 8)) { (s, l) =>
      val got = graft.functions.CharGramHashExpr
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), l)
        .toLongArray().toSeq
      val B = 1099511628211L
      def mix(v: Long): Long = {
        var z = v + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val want =
        if (s.length < l) Seq.empty[Long]
        else (0 to s.length - l).map { i =>
          mix(s.substring(i, i + l).foldLeft(0L)((h, c) => h * B + c))
        }
      got == want
    })
  }

  test("prop: minhash est_jaccard within [0,1] and symmetric-free (id_a < id_b)") {
    val genDocs = Gen.listOfN(6, Gen.nonEmptyListOf(
      Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8")).map(_.mkString(" ")))
    check(Prop.forAll(genDocs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val cands = Dedup.minhashCandidates(df, "doc_id", "text", threshold = 0.0).collect()
      cands.forall { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        a < b && j >= 0.0 && j <= 1.0
      }
    })
  }

  test("prop: identical texts always collide in minhash LSH with est_jaccard 1.0") {
    val genText = Gen.nonEmptyListOf(Gen.oneOf("p", "q", "r", "s")).map(_.mkString(" "))
    check(Prop.forAll(genText) { t =>
      val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
      val cands = Dedup.minhashCandidates(df, "doc_id", "text", threshold = 0.5).collect()
      cands.length == 1 && cands.head.getDouble(2) == 1.0
    })
  }

  test("prop: saltedJoin ≡ plain join under random keys and any bucket count") {
    val gen = for {
      facts <- Gen.listOfN(60, Gen.choose(0L, 5L))
      dims <- Gen.listOfN(10, Gen.choose(0L, 7L)) // dup + orphan dim keys
      buckets <- Gen.choose(1, 16)
    } yield (facts, dims, buckets)
    check(Prop.forAll(gen) { case (facts, dims, buckets) =>
      val f = facts.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("fk", "fid")
      val d = dims.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("dk", "did")
      val plain = f.join(d, col("fk") === col("dk"))
        .select("fid", "did").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val salted = Relational.saltedJoin(f, d, "fk", "dk", buckets)
        .select("fid", "did").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      plain == salted
    })
  }

  test("prop: rangeJoin ≡ raw range-predicate join for any bucket width") {
    val gen = for {
      vals <- Gen.listOfN(40, Gen.choose(0, 1000))
      ranges <- Gen.listOfN(8, for {
        lo <- Gen.choose(-100, 900); span <- Gen.choose(-10, 400)
      } yield (lo.toDouble, (lo + span).toDouble)) // includes empty intervals
      width <- Gen.oneOf(7.0, 50.0, 333.0)
    } yield (vals, ranges, width)
    check(Prop.forAll(gen) { case (vals, ranges, width) =>
      val f = vals.zipWithIndex.map { case (v, i) => (i.toLong, v / 2.0) }.toDF("fid", "v")
      val r = ranges.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("rid", "lo", "hi")
      val plain = f.join(r, col("v") >= col("lo") && col("v") < col("hi"))
        .select("fid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val bucketed = Relational.rangeJoin(f, "v", r, "lo", "hi", width)
        .select("fid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      plain == bucketed
    })
  }

  test("prop: normalizeUrl is idempotent") {
    import graft.operators.Urls
    val genUrl = for {
      scheme <- Gen.oneOf("http", "HTTPS", "https")
      host <- Gen.oneOf("Ex.COM", "a.b.example.org", "X.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/A/b", "/docs/7", "/p/")
      query <- Gen.oneOf("", "?q=1", "?utm_a=b", "?utm_a=b&q=2", "?q=2&gclid=x&r=3")
      frag <- Gen.oneOf("", "#f", "#sec:2")
    } yield s"$scheme://$host$port$path$query$frag"
    check(Prop.forAll(genUrl) { u =>
      val once = Seq(u).toDF("url").select(Urls.normalizeUrl(col("url")).as("n"))
        .collect().head.getString(0)
      val twice = Seq(once).toDF("url").select(Urls.normalizeUrl(col("url")).as("n"))
        .collect().head.getString(0)
      once == twice
    })
  }

  // Random word-ish strings over a tiny alphabet: high collision
  // rates, repeated grams, and length clusters — the adversarial
  // regime for every fuzzy-join blocking scheme.
  private val genCorpus: Gen[List[String]] =
    Gen.listOfN(12, Gen.choose(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
      .map(_.distinct)

  private def bruteLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("prop: all three fuzzy-join variants ≡ brute-force levenshtein on random corpora") {
    check(Prop.forAll(genCorpus, Gen.choose(0, 2)) { (words, t) =>
      words.nonEmpty ==> {
        val expected = (for {
          a <- words; b <- words
          if a < b && bruteLev(a, b) <= t
        } yield (a, b, bruteLev(a, b))).toSet
        val l = words.toDF("a"); val r = words.toDF("b")
        def run(df: org.apache.spark.sql.DataFrame) = df
          .filter(col("a") < col("b")).collect()
          .map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet
        run(Relational.fuzzyJoin(l, "a", r, "b", t)) == expected &&
          run(Relational.fuzzyJoinGrams(l, "a", r, "b", t)) == expected &&
          run(Relational.fuzzyJoinPrefix(l, "a", r, "b", t)) == expected
      }
    })
  }

  test("prop: snapshotDiff inverse symmetry — I↔D swap, identical U set") {
    val genSnap: Gen[List[(Long, String)]] =
      Gen.listOfN(15, for {
        k <- Gen.choose(1L, 10L)
        v <- Gen.oneOf("x", "y", "z")
      } yield (k, v)).map(_.groupBy(_._1).map(_._2.head).toList)
    check(Prop.forAll(genSnap, genSnap) { (xs, ys) =>
      (xs.nonEmpty && ys.nonEmpty) ==> {
        val a = xs.toDF("k", "v"); val b = ys.toDF("k", "v")
        def diff(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
          graft.operators.Cdc.snapshotDiff(x, y, Seq("k"))
            .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        val fwd = diff(a, b); val bwd = diff(b, a)
        def of(s: Set[(Long, String)], c: String) =
          s.filter(_._2 == c).map(_._1)
        of(fwd, "I") == of(bwd, "D") &&
          of(fwd, "D") == of(bwd, "I") &&
          of(fwd, "U") == of(bwd, "U")
      }
    })
  }
}
