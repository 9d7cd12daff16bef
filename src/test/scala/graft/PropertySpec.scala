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
}
