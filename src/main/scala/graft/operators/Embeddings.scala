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
}
