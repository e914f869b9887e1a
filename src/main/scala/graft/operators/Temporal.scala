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
}
