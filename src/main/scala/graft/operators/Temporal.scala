package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) joins: for each fact row, the single dimension
  * version that was current at the fact's timestamp. The training-data
  * use case is label-leakage-free feature lookup — a feature table
  * snapshotted over time must never leak a future version into an
  * earlier example.
  *
  * Built by composition (SURVEY.md preference (a)): a range equi-join
  * on the key bounded by `dimTs <= factTs`, then the A4 keep-latest
  * window per fact. Fan-out is bounded by versions-per-key, so the
  * shuffle scales with |facts| + |matches|, never |facts| × |dim|. A
  * custom SparkPlan would only pay off once versions-per-key is large
  * enough to want a sort-merge with per-key backward scan; at that
  * point flip the internals without touching the API.
  */
object Temporal {

  /** Left as-of join: every fact survives; facts with no dimension
    * version at/before their timestamp get nulls.
    *
    * @param factId unique fact identifier (window key)
    * @param tieBreak extra dim ordering when versions share dimTs
    */
  def asOfJoin(facts: DataFrame, dim: DataFrame, factId: String,
               factKey: String, factTs: String, dimKey: String,
               dimTs: String, dimCols: Seq[String],
               tieBreak: Seq[String] = Nil): DataFrame = {
    val d = dim.select((dimKey +: dimTs +: (dimCols ++ tieBreak)).distinct.map(col): _*)
    val matches = facts.select(col(factId), col(factKey), col(factTs))
      .join(d, facts(factKey) === d(dimKey) && d(dimTs) <= facts(factTs))
    val latest = Relational.dedupLatest(matches, Seq(factId), dimTs, tieBreak)
      .select((factId +: dimCols).map(col): _*)
    facts.join(latest, Seq(factId), "left")
  }

  /** Binned range (interval) join: each left row paired with the right
    * rows of the same key whose timestamp falls in
    * `(leftTs + loSec, leftTs + hiSec]` — lower bound exclusive, upper
    * inclusive. Returns each matching pair exactly once, with the right
    * side's carried columns prefixed `r_`.
    *
    * Scale shape: the naive key-equi-join + range filter pairs every
    * row combination of a key before filtering — quadratic on hot keys.
    * Here time is quantized into bins of the WINDOW WIDTH
    * (`hiSec - loSec`): a right row lands in exactly one bin, a left
    * row's window overlaps at most two, so the join runs on
    * `(key, bin)` and candidate fan-out is bounded by rows-per-bin —
    * the Spark-native translation of an interval index. Because each
    * right row has one bin, no matching pair can be produced twice.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTs: String, rightTs: String,
                loSec: Long, hiSec: Long,
                rightCols: Seq[String]): DataFrame = {
    require(hiSec > loSec, s"empty window: ($loSec, $hiSec]")
    val w = hiSec - loSec
    val r = right
      .select((Seq(rightKey, rightTs) ++ rightCols).distinct
        .map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__bin",
        floor(col(s"r_$rightTs").cast("long") / w).cast("long"))
    val probes = left.withColumn("__bin",
      explode(array_distinct(array(
        floor((col(leftTs).cast("long") + loSec) / w).cast("long"),
        floor((col(leftTs).cast("long") + hiSec) / w).cast("long")))))
    probes
      .join(r, probes("__bin") === r("__bin") &&
        probes(leftKey) === r(s"r_$rightKey") &&
        r(s"r_$rightTs") > probes(leftTs) + expr(s"INTERVAL $loSec SECONDS") &&
        r(s"r_$rightTs") <= probes(leftTs) + expr(s"INTERVAL $hiSec SECONDS"))
      .drop("__bin")
  }

  /** Exponential time-decay aggregation: per key, `Σ value·2^(-Δt/h)`
    * and the decayed event count `Σ 2^(-Δt/h)` at a fixed reference
    * instant (`Δt` = refTs − ts, `h` = the half-life in seconds) — the
    * recency-weighted feature a feature store derives from an event
    * stream (an event one half-life old counts half as much as one
    * from just now). A plain map-side-combinable groupBy: the weight
    * is a pure per-row projection, so the shuffle carries one partial
    * sum per (key, partition) regardless of corpus size.
    *
    * Cross-engine determinism: Δt is computed in integer MICROSECONDS
    * and divided by `h·10⁶` in one double op (subtracting two
    * per-side double conversions would differ in the last ulp between
    * engines); each weighted term rounds at 9 and sums as an exact
    * decimal so the fold is order-independent (the l9 discipline the
    * perplexity/KL oracles established for libm-boundary functions).
    */
  def decayedAgg(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, halfLifeSec: Long,
                 refTs: String): DataFrame = {
    require(halfLifeSec > 0,
      s"decayedAgg: halfLifeSec must be positive, got $halfLifeSec — " +
        "a zero/negative half-life makes every weight NaN/Infinity")
    import graft.functions.Rounding.pround
    import org.apache.spark.sql.types.DecimalType
    val dtUs = unix_micros(lit(refTs).cast("timestamp")) -
      unix_micros(col(tsCol))
    val wgt = pow(lit(0.5), dtUs / lit(halfLifeSec * 1e6))
    events
      .select(col(keyCol),
        pround(col(valueCol) * wgt, 9).cast(DecimalType(38, 12)).as("__t"),
        pround(wgt, 9).cast(DecimalType(38, 12)).as("__w"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        pround(sum(col("__t")).cast("double"), 6).as("decayed_sum"),
        pround(sum(col("__w")).cast("double"), 6).as("decayed_count"))
  }
}
