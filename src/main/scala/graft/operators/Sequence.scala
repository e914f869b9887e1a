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

  /** `sequenceMatch('(?1)(?t<=N₁)(?2)(?t<=N₂)(?3)…')` — the spanning
    * match with ClickHouse's inter-step time conditions: events
    * e₁ < e₂ < … < e_k (strictly increasing ts) with eᵢ satisfying
    * `conds(i)` AND `ts(eᵢ₊₁) − ts(eᵢ) ≤ maxGapSec(i)` wherever a
    * bound is given (`None` = plain `.*`, any gap). Returns one row
    * per key owning at least one c₁-event: `(key, matched)`.
    *
    * Existence needs no backtracking: an event at time t is a valid
    * level-(i+1) position iff some valid level-i position p < t has
    * t − p within the bound — and since later p can only shrink the
    * gap, "the LATEST valid level-i position before t" decides it.
    * That is a per-key running MAX over a growing
    * (unboundedPreceding, −1) frame — incrementally maintained by
    * WindowExec, O(n) per key (the funnel walk's frame-direction rule,
    * here in ascending orientation because the probe looks BACKWARD).
    * One union + window pass per level; cost ∝ condition-matching
    * events, zero pair fan-out on hot keys.
    *
    * (The greedy forward walk [[matchSpanning]] rides is NOT exact
    * under inter-step bounds — taking the earliest next event can
    * overstretch a later gap that a later choice would have kept
    * short — which is why this is a reachability pass, not a chain
    * walk.)
    *
    * At equal timestamps a level-i position does not enable a
    * level-(i+1) event at the same instant (strict increase, the
    * engine-independent reading): ascending sort `(t, tag desc)` puts
    * probes before builds at equal t, so the backward frame excludes
    * the tie.
    */
  def matchTimed(events: DataFrame, keyCol: String, tsCol: String,
                 conds: Seq[Column], maxGapSec: Seq[Option[Long]])
      : DataFrame =
    matchTimedBounds(events, keyCol, tsCol, conds,
      maxGapSec.map(_.map(n => TimeBound("<=", n))))

  /** A ClickHouse `(?t op N)` inter-step condition: `op` one of
    * `<=`, `<`, `>=`, `>` applied to the gap `ts(eᵢ₊₁) − ts(eᵢ)` in
    * seconds — one condition per gap, CH's own grammar shape.
    */
  final case class TimeBound(op: String, seconds: Long) {
    require(Seq("<=", "<", ">=", ">").contains(op),
      s"time-bound op must be one of <=, <, >=, >; got '$op'")
    require(seconds > 0, s"time bound must be positive, got $seconds")
  }

  /** The full `sequenceMatch` time-condition grammar:
    * `'(?1)(?t op N₁)(?2)(?t op N₂)(?3)…'` with any per-gap single
    * comparison (`None` = plain `.*`).
    *
    * Exactness under mixed bounds: let Sᵢ be the set of valid level-i
    * positions. A probe at time t is a valid level-(i+1) position iff
    * Sᵢ intersects the gap's admissible window — and for a SINGLE
    * comparison per gap that window is a half-line, so the
    * intersection test is decided by ONE extreme of Sᵢ∩(−∞, t):
    *
    *  - max-bounds (`<=`, `<`): ∃p ∈ [t−N, t) ⟺ the LATEST valid
    *    position before t is recent enough — running MAX;
    *  - min-bounds (`>=`, `>`): ∃p ≤ t−N ⟺ the EARLIEST valid
    *    position is old enough — running MIN.
    *
    * Both extremes ride the same ascending growing
    * (unboundedPreceding, −1) frame — WindowExec maintains them
    * incrementally, O(n) per key, one union+window pass per level
    * (a two-sided bound on ONE gap would need interval reasoning;
    * CH's grammar has one comparison per gap, and so does this).
    * Equal instants never chain (strict increase): probes sort before
    * builds at equal t, so the backward frame excludes the tie.
    */
  def matchTimedBounds(events: DataFrame, keyCol: String, tsCol: String,
                       conds: Seq[Column], gaps: Seq[Option[TimeBound]])
      : DataFrame = {
    require(conds.length >= 2,
      s"matchTimedBounds needs at least two conditions, got ${conds.length}")
    require(gaps.length == conds.length - 1,
      s"gaps must have one entry per step gap " +
        s"(${conds.length - 1}), got ${gaps.length}")
    def evts(c: Column) = events.filter(c)
      .select(col(keyCol).as("__k"), unix_micros(col(tsCol)).as("__t"))
      .distinct()
    // level-1 positions: every c₁ instant
    var valid = evts(conds.head)
    val keys = valid.select(col("__k")).distinct()
    for (i <- 1 until conds.length) {
      val builds = valid.withColumn("__tag", lit(0))
      val probes = evts(conds(i)).withColumn("__tag", lit(1))
      // extremes of the valid level-i set strictly before this probe:
      // ascending growing frame, probes sort before builds on ties
      val w = Window.partitionBy("__k")
        .orderBy(col("__t"), col("__tag").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val buildT = when(col("__tag") === 0, col("__t"))
      val ok = gaps(i - 1) match {
        case None =>
          col("__prevMax").isNotNull
        case Some(TimeBound("<=", n)) =>
          col("__prevMax").isNotNull &&
            col("__t") - col("__prevMax") <= n * 1000000L
        case Some(TimeBound("<", n)) =>
          col("__prevMax").isNotNull &&
            col("__t") - col("__prevMax") < n * 1000000L
        case Some(TimeBound(">=", n)) =>
          col("__prevMin").isNotNull &&
            col("__t") - col("__prevMin") >= n * 1000000L
        case Some(TimeBound(">", n)) =>
          col("__prevMin").isNotNull &&
            col("__t") - col("__prevMin") > n * 1000000L
        case Some(b) =>
          throw new IllegalArgumentException(s"unreachable bound $b")
      }
      valid = builds.unionByName(probes)
        .withColumn("__prevMax", max(buildT).over(w))
        .withColumn("__prevMin", min(buildT).over(w))
        .filter(col("__tag") === 1 && ok)
        .select("__k", "__t")
    }
    keys.join(valid.select(col("__k")).distinct()
        .withColumn("__m", lit(true)), Seq("__k"), "left")
      .select(col("__k").as(keyCol),
        coalesce(col("__m"), lit(false)).as("matched"))
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
    * RESTRICTION: c₁ and c₂ must be mutually exclusive predicates.
    * The CASE labeling means an event satisfying BOTH serves only as
    * a ?1 — ClickHouse's matcher would let it serve either position,
    * so the counts agree only for disjoint conditions (which every
    * `type = 'x'` dashboard condition is). Overlapping conditions are
    * the caller's contract to avoid, not detectable here without an
    * extra pass.
    *
    * `tieCol` must be unique per key (an event id): it fixes the order
    * of equal-timestamp events identically in every engine.
    *
    * One filtered scan, one per-key lag window, one grouped sum —
    * cost ∝ matching events, linear on hot keys.
    */
  def countAdjacentPairs(events: DataFrame, keyCol: String, tsCol: String,
                         tieCol: String, c1: Column, c2: Column)
      : DataFrame =
    countAdjacentRuns(events, keyCol, tsCol, tieCol, Seq(c1, c2))
      .withColumnRenamed("run_count", "pair_count")

  /** `sequenceCount('(?1)(?2)…(?k)')` for any pattern length: per key,
    * how many times the k conditions appear CONSECUTIVELY in the
    * condition-filtered subsequence (events matching no condition are
    * skipped — ClickHouse's rule). One lag-composition window pass:
    * an occurrence is a position whose k−1 predecessors in the
    * filtered stream carry labels k−1 … 1.
    *
    * RESTRICTIONS (both the caller's contract, as in the pair form):
    *  - conditions must be MUTUALLY EXCLUSIVE (CASE labeling, first
    *    match wins — an event satisfying two conditions serves only
    *    the earlier label);
    *  - the label pattern must not overlap itself (no proper prefix of
    *    `1…k` equals a suffix — automatic when `conds.head` and
    *    `conds.last` are distinct conditions, e.g. distinct event
    *    types): then no event can belong to two occurrences, so the
    *    raw position count EQUALS ClickHouse's greedy non-overlapping
    *    count. A self-overlapping pattern like (A)(B)(A) would need
    *    left-to-right consumption, which a per-position count cannot
    *    express.
    *
    * `tieCol` must be unique per key. Cost: one filtered scan, k−1
    * lags over one exchange, a grouped sum — linear on hot keys.
    */
  def countAdjacentRuns(events: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, conds: Seq[Column]): DataFrame = {
    require(conds.length >= 2,
      s"countAdjacentRuns needs at least two conditions, got ${conds.length}")
    val k = conds.length
    val lab = conds.zipWithIndex.reverse.foldLeft(lit(null).cast("int")) {
      case (acc, (c, i)) => when(c, lit(i + 1)).otherwise(acc)
    }
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tie"))
    val hit = (1 until k)
      .map(j => lag(col("__lab"), j).over(w) === (k - j))
      .foldLeft(col("__lab") === k)(_ && _)
    events
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), lab.as("__lab"))
      .filter(col("__lab").isNotNull)
      .withColumn("__hit", hit)
      .groupBy("__k")
      .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("run_count"))
      .withColumn("matched", col("run_count") > 0)
      .withColumnRenamed("__k", keyCol)
  }
}
