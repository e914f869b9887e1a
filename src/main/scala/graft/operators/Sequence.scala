package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `sequenceMatch` / `sequenceCount` — event-pattern
  * aggregates over a per-key timestamp-ordered event stream, the third
  * leg of the event-analytics tier beside [[Funnel.windowFunnel]] and
  * [[Funnel.cohortRetention]]. Two pattern shapes cover the dashboard
  * uses:
  *
  *  - spanning `'(?1).*(?2).*…'` — condition events in order, anything
  *    between: [[matchSpanning]], the funnel chain walk with no time
  *    bound (greedy-earliest extension is depth-exact, see
  *    [[Funnel.windowFunnel]]'s induction note);
  *  - adjacent `'(?1)(?2)'` — condition events CONSECUTIVE in the
  *    condition-matching subsequence (ClickHouse skips events matching
  *    no condition): [[countAdjacentPairs]], one window-lag pass.
  *
  * Scale shape: both are hash exchanges on the key plus O(n) window
  * passes — no per-key state machine, no range self-join, zero pair
  * fan-out on hot keys (the spanning walk rides the same growing
  * window frame the funnel does).
  *
  * Determinism: ClickHouse leaves equal-timestamp order unspecified;
  * here the spanning walk uses strict timestamp increase (the one
  * engine-independent reading, as in [[Funnel.windowFunnel]]) and the
  * adjacency scan takes an explicit unique tie-break column, so
  * distributed runs, single-node runs, and the DuckDB oracle all see
  * the same subsequence.
  */
object Sequence {

  /** `sequenceMatch('(?1).*(?2).*…')(ts, c₁, …, c_k)`: per key, do
    * events e₁ < e₂ < … < e_k exist (strictly increasing ts) with eᵢ
    * satisfying `conds(i)`? One row per key owning at least one
    * c₁-event: `(key, matched)`. An event may satisfy several
    * conditions; it still serves only one chain position (the strict
    * increase forces distinct instants), matching ClickHouse.
    */
  def matchSpanning(events: DataFrame, keyCol: String, tsCol: String,
                    conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "matchSpanning: conds must be non-empty")
    // minStartOnly: with no window bound the earliest-start chain
    // dominates (funnel induction), so the walk carries ONE probe row
    // per key per level — a hot key never fans out over its starts
    Funnel.chainWalk(events, keyCol, tsCol, conds, windowSec = None,
      minStartOnly = true)
      .select(col(keyCol),
        (col("funnel_level") === conds.length).as("matched"))
  }

  /** `sequenceCount('(?1)(?2)')(ts, c₁, c₂)`: per key, how many times
    * a c₁-event is IMMEDIATELY followed by a c₂-event in the
    * condition-filtered subsequence (events matching neither condition
    * are skipped — ClickHouse's rule). Conditions are labeled CASE-
    * style (first match wins), so each event carries one label,
    * adjacent pairs never share an event, and the raw pair count
    * equals ClickHouse's greedy non-overlapping count. `matched` is
    * the `sequenceMatch('(?1)(?2)')` boolean.
    *
    * `tieCol` must be unique per key (an event id): it fixes the order
    * of equal-timestamp events identically in every engine.
    *
    * One filtered scan, one per-key lag window, one grouped sum —
    * cost ∝ matching events, linear on hot keys.
    */
  def countAdjacentPairs(events: DataFrame, keyCol: String, tsCol: String,
                         tieCol: String, c1: Column, c2: Column)
      : DataFrame = {
    val lab = when(c1, lit(1)).otherwise(when(c2, lit(2)))
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tie"))
    events
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), lab.as("__lab"))
      .filter(col("__lab").isNotNull)
      .withColumn("__prev", lag(col("__lab"), 1).over(w))
      .groupBy("__k")
      .agg(
        sum(when(col("__prev") === 1 && col("__lab") === 2, 1L)
          .otherwise(0L)).as("pair_count"))
      .withColumn("matched", col("pair_count") > 0)
      .withColumnRenamed("__k", keyCol)
  }
}
