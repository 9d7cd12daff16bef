package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable numeric helpers.
  *
  * Spark's `round(double)` rounds the value's *shortest decimal
  * representation* (`BigDecimal.valueOf`), while DuckDB rounds the
  * *binary value* — for doubles whose repr terminates in '5' right
  * past the target scale (e.g. 0.66275 whose double is
  * 0.66274999…), the two disagree by one ULP of the target scale.
  * [[Det.round]] instead uses pure double arithmetic —
  * `floor(x·10^s + 0.5) / 10^s` — which is bit-identical in every
  * IEEE-754 engine. Spec: half-toward-+infinity.
  */
object Det {
  def round(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The matching DuckDB SQL fragment — keep in lockstep with
    * [[round]] so oracles mirror the exact double ops.
    */
  def roundSql(expr: String, scale: Int): String = {
    val p = "1" + ("0" * scale) + ".0"
    s"floor(($expr) * $p + 0.5) / $p"
  }
}
