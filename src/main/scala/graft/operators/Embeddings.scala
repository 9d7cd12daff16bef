package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Det

/** Vector-column transforms for embedding pipelines: L2
  * normalization (pre-compute for cosine = dot) and symmetric int8
  * quantization (4× storage cut for ANN indexes — the standard
  * compression before IVF/PQ at corpus scale).
  *
  * All per-row higher-order array expressions — map-only at any
  * scale. Double math uses the same sequential fold order as
  * `Similarity.cosine` and rounds through [[Det.round]], so the
  * DuckDB oracle reproduces every cell bit-exactly. Callers should
  * stage the vector column once per projection (Catalyst re-inlines
  * a higher-order subtree per reference).
  */
object Embeddings {

  /** Sequential-fold sum of squares → L2 norm (fold order matters:
    * FP addition is non-associative, and the oracle mirrors this
    * exact left-to-right order).
    */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Unit-L2 vector, each component rounded to `scale` dp; the zero
    * vector maps to zeros (not NaN/Inf).
    *
    * `norm` must be the STAGED [[l2Norm]] of `vec` (computed once in
    * a prior projection). Folding the norm inside the per-element
    * lambda would re-evaluate the O(d) aggregate for every component
    * — O(d²) per row (higher-order lambdas are interpreted with no
    * subexpression elimination), the same re-inline trap that made
    * minhash 654 s.
    */
  def l2Normalize(vec: Column, norm: Column, scale: Int = 6): Column =
    when(norm > 0, transform(vec, x => Det.round(x.cast("double") / norm, scale)))
      .otherwise(transform(vec, _ => lit(0.0)))

  /** max |x_i| — the symmetric-quantization range. Fold with
    * `greatest` (order-independent, unlike sums).
    */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 quantization: `q_i = round_half_up(x_i / amax
    * * 127)` in [-127, 127] (ints, byte-ranged — kept INT so both
    * engines agree on dtype). Zero vector quantizes to zeros.
    *
    * `amax` must be the STAGED [[absMax]] of `vec` — see
    * [[l2Normalize]] for why it cannot be folded in here.
    */
  def quantizeInt8(vec: Column, amax: Column): Column =
    when(amax > 0,
      transform(vec, x => floor(x.cast("double") / amax * 127.0 + 0.5).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))

  /** Dequantization scale (`amax / 127`), rounded to `scale` dp:
    * `x_i ≈ q_i * scale`. Takes the staged [[absMax]].
    */
  def dequantScale(amax: Column, scale: Int = 9): Column =
    Det.round(amax / 127.0, scale)

  /** Signed (±1) random projection of a STAGED integer vector (the
    * [[quantizeInt8]] output) down to `outDim` components — the
    * Achlioptas/JL dimensionality cut that precedes LSH bucketing or
    * brute-force scans when the stored dimension is too wide. Because
    * the input is integer and the signs come from an integer hash,
    * every output component is an EXACT integer sum: engine-exact
    * (the DuckDB oracle reproduces cells bit-for-bit), bit-stable
    * under any partitioning, and linear (`proj(a+b) = proj(a) +
    * proj(b)` — spec-pinned, the property JL arguments build on).
    *
    * `qvec` must be a staged attribute, not an expression (the
    * `outDim` lambda branches each re-inline their subtree
    * otherwise — the minhash trap). Map-only, O(outDim · d) integer
    * ops per row.
    */
  def randomProject(qvec: Column, outDim: Int): Column = {
    require(outDim >= 1, "outDim must be positive")
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(
        zip_with(qvec, sequence(lit(0), size(qvec) - 1),
          (x, i) => x.cast("long") * projSign(i, j)),
        lit(0L), (acc, y) => acc + y))
  }

  /** ±1 from a middle bit of a multiplicative integer hash of
    * `(i, j)` — pure integer/exact-double arithmetic, identical in
    * any engine. (Low bits of `i·odd` are just `i`'s parity; bit 10
    * of the 31-bit mix is decorrelated.)
    */
  private def projSign(i: Column, j: Column): Column = {
    val h = pmod(i * lit(2654435761L) + j * lit(40503L), lit(2147483648L))
    when(pmod(floor(h / 1024.0).cast("long"), lit(2)) === 0, lit(1L))
      .otherwise(lit(-1L))
  }

  /** 64-bit binary (sign) signature of a 64-dim vector: bit `i` is
    * set iff component `i` ≥ 0 — the 1-bit-per-dimension compression
    * a billion-vector store serves from (32× smaller than float32;
    * Hamming distance = one `xor` + popcount instead of 64 FP
    * multiplies, and `1 - ham/64` estimates angular similarity). The
    * only FP operation is the sign test, so the signature is
    * bit-exact across engines and partitionings — unlike the int8 /
    * PQ compressions this one is fully oracle-able.
    *
    * A component missing (array shorter than 64) or NULL leaves its
    * bit clear — `try_element_at` semantics, matching SQL's
    * `v[i] >= 0 → NULL → else` on short lists. `vec` must be a staged
    * attribute: all 64 bit branches reference it.
    */
  def signBits64(vec: Column): Column =
    (0 until 64).map { i =>
      when(try_element_at(vec, lit(i + 1)).cast("double") >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** DuckDB scalar twin of [[signBits64]] (lockstep-generator house
    * style): the same 64 sign tests, each contributing its power of
    * two as a signed-BIGINT summand. Bit 63's summand is
    * `-2^63` — two's complement directly, so the plain sum of the 64
    * disjoint-bit terms equals Spark's `bitwiseOR` with no HUGEINT
    * round-trip (max positive partial sum is `2^63 - 1`; adding the
    * min-long term cannot overflow).
    */
  def signBits64DuckSql(vecExpr: String): String =
    (0 until 64).map { i =>
      val v = if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"(CASE WHEN $vecExpr[${i + 1}] >= 0 THEN CAST($v AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")
}
