package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Xxh64Duck}

/** Pins the JVM reference model behind the DuckDB XXH64 emulation
  * ([[graft.operators.Xxh64Duck]]) bit-for-bit to Spark's `xxhash64`
  * — the same validation discipline as the splitmix64 / murmur3
  * emulations: the SQL chain is a transliteration of this model, and
  * the driver's DuckDB compare on `q_video_neardup_hashed` closes the
  * loop end-to-end.
  */
class Xxh64DuckSpec extends SparkSpecBase {

  import spark.implicits._

  test("JVM model == Spark xxhash64 for arbitrary 32-byte binaries") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 256).map { i =>
      val b = new Array[Byte](32); rnd.nextBytes(b); (i.toLong, b)
    }
    val got = rows.toDF("id", "b")
      .select(col("id"), xxhash64(col("b")).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (i, b) =>
      assert(got(i) === Xxh64Duck.hash32Bytes(b),
        s"model diverges from Spark xxhash64 at fixture $i")
    }
  }

  test("JVM model == Spark xxhash64 on edge-value words (0, -1, sign boundaries)") {
    val edges = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 1L, 0x8000000000000000L,
      0x00FF00FF00FF00FFL, 0x0123456789ABCDEFL)
    val rows = edges.zipWithIndex.flatMap { case (w, i) =>
      edges.zipWithIndex.map { case (w2, j) =>
        val bb = java.nio.ByteBuffer.allocate(32)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putLong(w).putLong(w2).putLong(w ^ w2).putLong(w + w2)
        ((i * edges.size + j).toLong, bb.array())
      }
    }
    val got = rows.toDF("id", "b")
      .select(col("id"), xxhash64(col("b")).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (i, b) =>
      assert(got(i) === Xxh64Duck.hash32Bytes(b))
    }
  }

  test("general model == Spark xxhash64 for random lengths 0..100 (stripes, words, 4-byte, tail)") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 300).map { i =>
      val b = new Array[Byte](rnd.nextInt(101)); rnd.nextBytes(b)
      (i.toLong, b)
    } ++ (0 until 40).map { l => // every short length exactly once
      val b = Array.tabulate[Byte](l)(t => ((t * 37 + l) % 256).toByte)
      ((1000 + l).toLong, b)
    }
    val got = rows.toDF("id", "b")
      .select(col("id"), xxhash64(col("b")).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (i, b) =>
      assert(got(i) === Xxh64Duck.hashBytes(b),
        s"general model diverges at fixture $i (len ${b.length})")
    }
  }

  test("general model == Spark xxhash64 on ASCII strings (the record-id shape)") {
    val ids = (0 until 50).map(i => (i.toLong, s"<urn:uuid:graft-${i * 977}>"))
    val got = ids.toDF("id", "s")
      .select(col("id"), xxhash64(col("s")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { case (i, s) =>
      assert(got(i) === Xxh64Duck.hashBytes(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    }
  }

  test("pattern-frame slices hash to the model over the closed-form bytes") {
    // The q_video_neardup_hashed corpus shape: frame k of a pattern
    // video has byte i = (v + i·w) mod 256 — the slice Spark hashes
    // must equal the closed-form byte array the oracle's word-packing
    // CTE rebuilds from (v, w).
    val vids = Seq((7L, 5007L), (9L, 5009L)).toDF("doc_id", "__seed")
      .withColumn("__shseed", lit(0L))
      .withColumn("__shfrom", lit(-1))
      .withColumn("__shcount", lit(0))
    val withVid = Multimodal.withPatternVideo(
      vids, "__seed", "__shseed", "__shfrom", "__shcount")
    val byDoc = withVid.select(col("doc_id"),
        xxhash64(expr("substring(video, 8 + 0 * 32 + 1, 32)")).as("h0"),
        xxhash64(expr("substring(video, 8 + 2 * 32 + 1, 32)")).as("h2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def expected(seed: Long, k: Int): Long = {
      val z = Multimodal.splitmix64(seed * 173L + k)
      val v = java.lang.Long.remainderUnsigned(z, 256L)
      val w = java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(z, 256L), 255L) + 1L
      val b = Array.tabulate[Byte](32)(i => ((v + i * w) % 256L).toByte)
      Xxh64Duck.hash32Bytes(b)
    }
    assert(byDoc(7L)._1 === expected(5007L, 0))
    assert(byDoc(7L)._2 === expected(5007L, 2))
    assert(byDoc(9L)._1 === expected(5009L, 0))
    assert(byDoc(9L)._2 === expected(5009L, 2))
  }
}
