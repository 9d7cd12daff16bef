package graft.operators

import java.math.BigInteger

/** DuckDB HUGEINT emulation of Spark's `xxhash64` (XXH64, seed 42)
  * over a FIXED 32-byte input — one full 4-accumulator stripe, no
  * tail bytes. This is what lets the PRODUCTION video fingerprint
  * ([[Multimodal.videoNearDupHashed]]: `xxhash64` over raw 32-byte
  * frame slices, 2⁶⁴ value domain) be driver-checked hash-exact
  * instead of oracle-exempt: the round-12 scale probe showed the
  * oracle-tractable exact-energy fingerprint going
  * collision-quadratic past ~10⁴ videos (bounded domain), so the
  * hashed form is the at-scale path — and an at-scale path without
  * an oracle is a verification hole (round-12 verdict task 2).
  *
  * Discipline is the repo's established 64-bit wraparound emulation
  * (splitmix64 in `Multimodal.mix64ChainDuckCtes`, sketch murmur3 in
  * `Sketches.cmsTokensDuckSql`): unsigned 64-bit values live in
  * HUGEINT `[0, 2⁶⁴)`; xor splits into two 32-bit BIGINT halves;
  * multiply-mod-2⁶⁴ splits the left operand lo/hi; `>>> s` is
  * integer division; `rotl(x, r)` is the carry-free sum
  * `(x mod 2⁶⁴⁻ʳ)·2ʳ + x ÷ 2⁶⁴⁻ʳ` (disjoint bit ranges). Every
  * multiplication in XXH64 is by a constant prime, so the general
  * column×column product is never needed.
  *
  * The JVM model ([[hash32]]/[[hash32Bytes]]) is spec-pinned equal to
  * Spark's `xxhash64` on arbitrary 32-byte inputs
  * (`Xxh64DuckSpec`); the SQL chain ([[words32DuckCtes]]) is a
  * stage-by-stage transliteration of that model, pinned end-to-end by
  * the driver's DuckDB compare on `q_video_neardup_hashed`.
  */
private[graft] object Xxh64Duck {

  // XXH64 primes (Collet's reference constants, public domain spec).
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** Spark's default xxhash64 seed. */
  val SparkSeed = 42L

  // ---- JVM reference model ----

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def stripe(v: Long, w: Long): Long = rotl(v + w * P2, 31) * P1

  /** XXH64 of exactly 32 bytes given as 4 little-endian 64-bit words. */
  def hash32(w0: Long, w1: Long, w2: Long, w3: Long,
      seed: Long = SparkSeed): Long = {
    val v1 = stripe(seed + P1 + P2, w0)
    val v2 = stripe(seed + P2, w1)
    val v3 = stripe(seed, w2)
    val v4 = stripe(seed - P1, w3)
    var h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
    def merge(acc: Long, v: Long): Long =
      (acc ^ stripe(0L, v)) * P1 + P4
    h = merge(h, v1); h = merge(h, v2); h = merge(h, v3); h = merge(h, v4)
    h += 32L
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  /** [[hash32]] over a raw 32-byte array (little-endian word packing
    * — exactly how Spark's XXH64 reads the bytes on x86/aarch64).
    */
  def hash32Bytes(b: Array[Byte], seed: Long = SparkSeed): Long = {
    require(b.length == 32, s"hash32Bytes needs exactly 32 bytes, got ${b.length}")
    def word(j: Int): Long = {
      var w = 0L
      var t = 7
      while (t >= 0) { w = (w << 8) | (b(8 * j + t) & 0xFFL); t -= 1 }
      w
    }
    hash32(word(0), word(1), word(2), word(3), seed)
  }

  // ---- DuckDB SQL transliteration ----

  private val W64 = "18446744073709551616::HUGEINT"
  private val W32 = "4294967296::HUGEINT"

  /** Unsigned value of a JVM long as a decimal BigInteger literal. */
  private def u(x: Long): BigInteger =
    new BigInteger(java.lang.Long.toUnsignedString(x))

  private def pow2(n: Int): BigInteger = BigInteger.ONE.shiftLeft(n)

  /** `c * m mod 2⁶⁴` for a column/expr `c` in [0, 2⁶⁴) and constant
    * `m`: lo/hi split keeps every intermediate < 2⁹⁷ (HUGEINT max is
    * 2¹²⁷−1).
    */
  private def mulExpr(c: String, m: Long): String = {
    val mm = u(m)
    s"((($c) % $W32) * $mm::HUGEINT + (((($c) // $W32) * $mm::HUGEINT) % $W32) * $W32) % $W64"
  }

  /** Carry-free rotate-left by `r` of a value in [0, 2⁶⁴). */
  private def rotlExpr(c: String, r: Int): String =
    s"((($c) % ${pow2(64 - r)}::HUGEINT) * ${pow2(r)}::HUGEINT + ($c) // ${pow2(64 - r)}::HUGEINT)"

  /** Bitwise xor of two values in [0, 2⁶⁴) via 32-bit BIGINT halves. */
  private def xorExpr(a: String, b: String): String =
    s"""(xor(CAST(($a) // $W32 AS BIGINT), CAST(($b) // $W32 AS BIGINT))::HUGEINT * $W32
       |      + xor(CAST(($a) % $W32 AS BIGINT), CAST(($b) % $W32 AS BIGINT))::HUGEINT)""".stripMargin

  /** `x ^ (x >>> s)` — the xor-shift avalanche step. */
  private def xorShiftExpr(c: String, s: Int): String =
    xorExpr(c, s"($c) // ${pow2(s)}::HUGEINT")

  /** The staged CTE chain computing [[hash32]] over an input CTE
    * `fromCte (doc_id, k, w1, w2, w3, w4)` of HUGEINT words in
    * [0, 2⁶⁴). Ends at `{prefix}xh (doc_id, k, h BIGINT)` with `h`
    * converted to the SIGNED value Spark's `xxhash64` returns. One
    * CTE per model stage, each reading only plain columns of the
    * previous one, so no expression ever nests two 128-bit tricks.
    */
  def words32DuckCtes(
      fromCte: String,
      prefix: String = "xx_",
      seed: Long = SparkSeed): String = {
    val inits = Seq(seed + P1 + P2, seed + P2, seed, seed - P1).map(u)
    def vs(f: String => String): Seq[String] =
      (1 to 4).map(i => s"${f(s"v$i")} AS v$i")
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    // accumulate one stripe: v_i = rotl(init_i + w_i·P2, 31) · P1
    sel += "a1" -> (1 to 4).map(i =>
      s"(${inits(i - 1)}::HUGEINT + ${mulExpr(s"w$i", P2)}) % $W64 AS v$i")
    sel += "a2" -> vs(rotlExpr(_, 31))
    sel += "a3" -> vs(mulExpr(_, P1))
    // converge: h = Σ rotl(v_i, r_i), then 4 sequential merge rounds
    sel += "a4" -> (Seq(
      s"(${rotlExpr("v1", 1)} + ${rotlExpr("v2", 7)} + ${rotlExpr("v3", 12)} + ${rotlExpr("v4", 18)}) % $W64 AS h") ++
      (1 to 4).map(i => s"v$i"))
    sel += "a5" -> (Seq("h") ++ (1 to 4).map(i => s"${mulExpr(s"v$i", P2)} AS v$i"))
    sel += "a6" -> (Seq("h") ++ vs(rotlExpr(_, 31)))
    sel += "a7" -> (Seq("h") ++ vs(mulExpr(_, P1)))
    for (i <- 1 to 4) {
      val carry = (i + 1 to 4).map(j => s"v$j")
      sel += s"m${i}a" -> (Seq(s"${xorExpr("h", s"v$i")} AS h") ++ carry)
      sel += s"m${i}b" -> (Seq(s"(${mulExpr("h", P1)} + ${u(P4)}::HUGEINT) % $W64 AS h") ++ carry)
    }
    sel += "f0" -> Seq(s"(h + 32) % $W64 AS h")
    sel += "f1" -> Seq(s"${xorShiftExpr("h", 33)} AS h")
    sel += "f2" -> Seq(s"${mulExpr("h", P2)} AS h")
    sel += "f3" -> Seq(s"${xorShiftExpr("h", 29)} AS h")
    sel += "f4" -> Seq(s"${mulExpr("h", P3)} AS h")
    sel += "f5" -> Seq(s"${xorShiftExpr("h", 32)} AS h")
    val stages = sel.toSeq
    val body = stages.zipWithIndex.map { case ((name, cols), ix) =>
      val from = if (ix == 0) fromCte else s"$prefix${stages(ix - 1)._1}"
      s"""$prefix$name AS (
         |  SELECT doc_id, k, ${cols.mkString(",\n    ")}
         |  FROM $from)""".stripMargin
    }.mkString(",\n")
    s"""$body,
       |${prefix}xh AS (
       |  SELECT doc_id, k,
       |    CAST(CASE WHEN h >= ${pow2(63)}::HUGEINT THEN h - $W64 ELSE h END AS BIGINT) AS h
       |  FROM $prefix${stages.last._1})""".stripMargin
  }
}
