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

  /** Fully general XXH64 over any byte array — the reference model
    * for the SHORT-input SQL chain ([[ascii31DuckCtes]]: < 32 bytes,
    * no stripes) and the documentation of the full algorithm the
    * 32-byte fast path above specializes. Spec-pinned equal to
    * Spark's `xxhash64` on random lengths 0‥100.
    */
  def hashBytes(b: Array[Byte], seed: Long = SparkSeed): Long = {
    val len = b.length
    def word(off: Int): Long = {
      var w = 0L
      var t = 7
      while (t >= 0) { w = (w << 8) | (b(off + t) & 0xFFL); t -= 1 }
      w
    }
    var off = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (off <= len - 32) {
          v1 = stripe(v1, word(off)); v2 = stripe(v2, word(off + 8))
          v3 = stripe(v3, word(off + 16)); v4 = stripe(v4, word(off + 24))
          off += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = (acc ^ stripe(0L, v1)) * P1 + P4
        acc = (acc ^ stripe(0L, v2)) * P1 + P4
        acc = (acc ^ stripe(0L, v3)) * P1 + P4
        (acc ^ stripe(0L, v4)) * P1 + P4
      } else seed + P5
    h += len
    while (off <= len - 8) {
      h = rotl(h ^ stripe(0L, word(off)), 27) * P1 + P4
      off += 8
    }
    if (off <= len - 4) {
      var k = 0L
      var t = 3
      while (t >= 0) { k = (k << 8) | (b(off + t) & 0xFFL); t -= 1 }
      h = rotl(h ^ (k * P1), 23) * P2 + P3
      off += 4
    }
    while (off < len) {
      h = rotl(h ^ ((b(off) & 0xFFL) * P5), 11) * P1
      off += 1
    }
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
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

  /** Staged CTE chain computing [[hashBytes]] over SHORT ASCII
    * strings — input CTE `fromCte (doc_id, k, s VARCHAR)` with every
    * value UNDER 32 BYTES (the no-stripe path; the caller guarantees
    * it — record ids / uris of known shape), output `{prefix}xh
    * (doc_id, k, h BIGINT)` equal to Spark's `xxhash64(s)`.
    *
    * One chain serves all lengths 0‥31: byte reads are DEFENSIVE
    * (`0` past the end) and every tail op is CASE-gated on the row's
    * byte length, mirroring [[hashBytes]]' loop structure — up to 3
    * full 8-byte word merges, at most one 4-byte chunk, at most 3
    * tail bytes, then the avalanche. ASCII only: DuckDB `ord` reads
    * code points, which equal bytes exactly on 7-bit input.
    */
  def ascii31DuckCtes(
      fromCte: String,
      prefix: String = "xs_",
      seed: Long = SparkSeed): String = {
    // defensive byte read at 1-based char position (SQL expr)
    def byteAt(pos: String): String =
      s"coalesce(ord(nullif(substr(s, CAST($pos AS INTEGER), 1), '')), 0)"
    def wordSum(startPos: String, nBytes: Int): String =
      (0 until nBytes).map { t =>
        s"${byteAt(s"($startPos) + $t")} * ${pow2(8 * t)}::HUGEINT"
      }.mkString("(", "\n      + ", ")")
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    val carry = Seq("s", "L", "nb")
    // L = byte length; nb = trailing single bytes after words + the
    // 4-byte chunk; h0 = seed + P5 + L
    sel += "b0" -> Seq("s", "strlen(s) AS L",
      "strlen(s) - 8 * (strlen(s) // 8) - CASE WHEN (strlen(s) % 8) >= 4 THEN 4 ELSE 0 END AS nb",
      s"(${u(seed + P5)}::HUGEINT + strlen(s)) % $W64 AS h")
    // up to three full 8-byte word merges
    for (i <- 0 until 3) {
      val cond = s"L >= ${8 * (i + 1)}"
      sel += s"w${i}a" -> (carry ++ Seq("h", s"${wordSum(s"${8 * i + 1}", 8)} AS w"))
      sel += s"w${i}b" -> (carry ++ Seq("h", s"${mulExpr("w", P2)} AS w"))
      sel += s"w${i}c" -> (carry ++ Seq("h", s"${rotlExpr("w", 31)} AS w"))
      sel += s"w${i}d" -> (carry ++ Seq("h", s"${mulExpr("w", P1)} AS w"))
      sel += s"w${i}e" -> (carry ++ Seq(
        s"CASE WHEN $cond THEN ${xorExpr("h", "w")} ELSE h END AS h"))
      sel += s"w${i}f" -> (carry ++ Seq(
        s"CASE WHEN $cond THEN (${mulExpr(rotlExpr("h", 27), P1)} + ${u(P4)}::HUGEINT) % $W64 ELSE h END AS h"))
    }
    // at most one 4-byte chunk, at the first position past the words
    val cond4 = "(L % 8) >= 4"
    sel += "fa" -> (carry ++ Seq("h",
      s"${wordSum("8 * (L // 8) + 1", 4)} AS w"))
    sel += "fb" -> (carry ++ Seq("h", s"${mulExpr("w", P1)} AS w"))
    sel += "fc" -> (carry ++ Seq(
      s"CASE WHEN $cond4 THEN ${xorExpr("h", "w")} ELSE h END AS h"))
    sel += "fd" -> (carry ++ Seq(
      s"CASE WHEN $cond4 THEN (${mulExpr(rotlExpr("h", 23), P2)} + ${u(P3)}::HUGEINT) % $W64 ELSE h END AS h"))
    // at most three trailing bytes
    for (j <- 0 until 3) {
      val cond = s"nb > $j"
      sel += s"t${j}a" -> (carry ++ Seq("h",
        s"${mulExpr(byteAt(s"L - nb + $j + 1"), P5)} AS w"))
      sel += s"t${j}b" -> (carry ++ Seq(
        s"CASE WHEN $cond THEN ${xorExpr("h", "w")} ELSE h END AS h"))
      sel += s"t${j}c" -> (carry ++ Seq(
        s"CASE WHEN $cond THEN ${mulExpr(rotlExpr("h", 11), P1)} ELSE h END AS h"))
    }
    sel += "z1" -> Seq(s"${xorShiftExpr("h", 33)} AS h")
    sel += "z2" -> Seq(s"${mulExpr("h", P2)} AS h")
    sel += "z3" -> Seq(s"${xorShiftExpr("h", 29)} AS h")
    sel += "z4" -> Seq(s"${mulExpr("h", P3)} AS h")
    sel += "z5" -> Seq(s"${xorShiftExpr("h", 32)} AS h")
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
