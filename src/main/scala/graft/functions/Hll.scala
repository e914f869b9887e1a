package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Rounding.pround

/** Shared HyperLogLog arithmetic (m = 256 registers) — one definition
  * of the register derivation and the estimator so the two HLL
  * surfaces ([[graft.operators.Profile.hllEstimate]]'s QA row and
  * [[graft.pipeline.Rollup]]'s stored `uniqState`-style sketch state)
  * and their DuckDB oracles stay bit-identical.
  *
  * Register stream: md5 hex; bucket = first 2 hex chars (8 bits);
  * the next 13 hex chars form a 52-bit word `w`, ρ = leading zeros of
  * w in a 52-bit field + 1 = `53 − length(bin(w))` (53 when w = 0) —
  * a string-length scan, exact in every engine, none of float log2's
  * power-of-two boundary risk.
  *
  * Estimator: the harmonic sum is integer-scaled (Σ 2^(53−M_j) ≤
  * m·2^53 < 2^63 sums associatively in BIGINT — distributed partial
  * order can never change it), the single double division α·m²·2^53/S
  * is one IEEE op on identical operands, and the small-range branch
  * (raw ≤ 2.5m with empty registers) is linear counting m·ln(m/V).
  * Estimates pround@6.
  */
object Hll {
  val M = 256
  val Pow53 = 9007199254740992.0 // 2^53
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
  /** α·m²·2^53 — this exact arithmetic order is what the oracle SQL
    * embeds as a literal; do not reassociate. */
  val C2: Double = Alpha * M * M * Pow53

  /** Register index from an md5 hex string. */
  def bucket(h: Column): Column =
    conv(substring(h, 1, 2), 16, 10).cast("int")

  /** ρ from an md5 hex string. */
  def rho(h: Column): Column = {
    val w = conv(substring(h, 3, 13), 16, 10).cast("long")
    when(w === 0L, lit(53)).otherwise(lit(53) - length(bin(w)))
  }

  /** Estimate from the integer-scaled harmonic sum and the
    * empty-register count. */
  def estimate(sInt: Column, vEmpty: Column): Column = {
    val raw = lit(C2) / sInt.cast("double")
    when(raw <= lit(2.5 * M) && vEmpty > 0,
      pround(lit(M.toDouble) *
        log(lit(M.toDouble) / vEmpty.cast("double")), 6))
      .otherwise(pround(raw, 6))
  }
}
