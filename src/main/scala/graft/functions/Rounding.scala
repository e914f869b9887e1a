package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic rounding.
  *
  * `round()` tie-handling differs between engines (Spark routes doubles
  * through BigDecimal HALF_UP; DuckDB rounds the scaled double), so two
  * engines given bit-identical inputs can disagree on ties like 0.86875.
  * floor() is exact under IEEE 754, so half-up rounding expressed as
  * floor(x*10^s + 0.5)/10^s yields identical bits in any engine — this
  * is the quantization every oracle-compared double goes through.
  */
object Rounding {

  def pround(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale) // exact for scale <= 15
    // Spark's floor(double) returns BIGINT and silently SATURATES at
    // Long.MaxValue — for |c·f| beyond ~9.2e18 the old spelling
    // clamped to 9.223e18/f while DuckDB's double-domain floor sailed
    // on. In that region c·f (and c·f + 0.5, whose true sum is never
    // representable closer to the half) is already integer-valued
    // (ulp ≥ 1024), so the double-domain floor is the identity and
    // dividing back replicates DuckDB bit-for-bit.
    val y = c * f + lit(0.5)
    when(abs(y) < lit(9.0e18), floor(y) / f).otherwise(y / f)
  }

  /** The DuckDB-SQL spelling of the same expression. */
  def sqlPround(e: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($e) * $f + 0.5) / $f"
  }
}
