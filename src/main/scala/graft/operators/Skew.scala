package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense is AQE's runtime skew-join splitting (enabled
  * in the engine sessions). This utility is the explicit fallback for
  * planned skew — e.g. the reference's `user_id = -1` null-repair
  * sentinel (§1.4), which concentrates every anonymous event on one key
  * at 100 TB.
  *
  * Shape: the fact side gets a per-row salt in [0, salts); the dim side
  * is exploded ×salts so every (key, salt) pair can meet. One shuffle
  * each, hot keys spread across `salts` reducers; dim-side duplication
  * is bounded by salts × |dim|, which is the usual trade when the dim is
  * broadcastable-ish but the join must shuffle.
  */
object Skew {

  /** Deterministic-enough per-row salt: spreads rows uniformly without
    * requiring a stable row id (monotonically_increasing_id is unique
    * within a run, which is all a salt needs).
    */
  private def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Salted equi-join: semantically identical to
    * facts.join(dim, factKey === dimKey, joinType) for row-preserving
    * join types (inner / left). `dim` must tolerate ×salts duplication.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", s"row-preserving join types only: $joinType")
    val saltedFacts = facts.withColumn("__salt", rowSalt(salts))
    val saltedDim = dim
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedFacts
      .join(saltedDim,
        saltedFacts(factKey) === saltedDim(dimKey) &&
          saltedFacts("__salt") === saltedDim("__salt"),
        joinType)
      .drop(saltedDim("__salt"))
      .drop(saltedFacts("__salt"))
  }
}
