package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: the ClickHouse `windowFunnel` / `retention`
  * pair — the two aggregate shapes every product-analytics deployment of
  * the reference stack (Superset dashboards over a ClickHouse events
  * table) runs daily. Re-expressed as declarative Spark plans: no
  * per-key UDAF state machine, no driver-side sequence walk.
  *
  * Scale shape (both): everything reduces to hash exchanges on the key
  * plus window passes — cost ∝ |events|, never |events|² per key. The
  * funnel walks its step chain with one union+window pass per level
  * (levels are a small query constant), the standard as-of trick:
  * probes and build rows interleave in one per-key sort, so "earliest
  * next occurrence after t" needs no range self-join and has zero pair
  * fan-out on hot keys.
  */
object Funnel {

  /** ClickHouse `windowFunnel(window)(ts, type = step₁, …)` in
    * strict-increase mode: per key, the maximum prefix length L of
    * `steps` for which events e₁ < e₂ < … < e_L exist (strictly
    * increasing timestamps) with `type(eᵢ) = steps(i)` and
    * `ts(e_L) − ts(e₁) ≤ windowSec`. Returns one row per key that has
    * at least one step-1 event: `(key, funnel_level)`.
    *
    * Greedy-earliest chain extension is exact here: if any chain of
    * depth L exists from a given start, the chain that always takes
    * the EARLIEST next-step event also reaches depth L within the
    * window (each greedy timestamp is ≤ its counterpart by induction).
    * So per start the walk is deterministic, and per key the level is
    * the max over starts — every step-1 instant is tried, matching
    * ClickHouse's any-start semantics.
    *
    * Strict-increase (equal-timestamp events do NOT chain) is the one
    * ClickHouse mode with an engine-independent answer — the default
    * mode's "same-timestamp events match in any order" makes the level
    * depend on physical row order.
    *
    * The other two ClickHouse modes compose on top (both abort
    * semantics on the forward scan, which is exactly what the
    * greedy-per-start walk is):
    *
    *  - `strictOrder` (CH `strict_order`): no intervening events —
    *    after step i at time t, the chain extends only if the EARLIEST
    *    event strictly after t (of ANY type) is a step-(i+1) event;
    *    A→B→D→C stops an A→B→C funnel at level 2. A foreign event
    *    sharing the step event's exact instant does not abort (the one
    *    deterministic reading under strict increase).
    *  - `strictDedup` (CH `strict_dedup`): a repeat of an ALREADY-
    *    matched condition interrupts the chain — A→B→A→C stops an
    *    A→B→C funnel at level 2 (the second A repeats matched
    *    condition 1 before C arrives). A step event that itself
    *    repeats an earlier condition still matches (the dup check is
    *    events STRICTLY between positions), so patterns with repeated
    *    conditions (A→B→A) remain satisfiable, as in ClickHouse.
    *
    * Both are per-level window predicates on the existing linear walk
    * (same single pass per level, same growing O(n) frame) — no extra
    * pass, no self-join.
    */
  def windowFunnel(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowSec: Long, strictOrder: Boolean = false,
                   strictDedup: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "windowFunnel: steps must be non-empty")
    require(windowSec > 0,
      s"windowFunnel: windowSec must be positive, got $windowSec")
    chainWalk(events, keyCol, tsCol, steps.map(col(typeCol) === _),
      Some(windowSec), strictOrder = strictOrder, strictDedup = strictDedup)
  }

  /** The shared greedy chain walk: per key, the deepest strictly-
    * increasing prefix of `stepConds`, optionally bounded to
    * `windowSec` of the chain's first event. [[windowFunnel]] is the
    * bounded string-typed instance; [[Sequence.matchSpanning]] the
    * unbounded predicate-typed one. Returns `(keyCol, funnel_level)`,
    * one row per key with at least one step-1 event.
    *
    * `minStartOnly` walks ONE chain per key, from the earliest step-1
    * instant. Exact ONLY without a window bound: unbounded, the
    * earliest start dominates every rival chain (each greedy timestamp
    * lower-bounds the rival's by the funnel induction), whereas a
    * window bound can disqualify the earliest start yet admit a later
    * one — so the flag is rejected when `windowSec` is set. A hot key
    * with 10⁶ step-1 events then carries one probe row per level, not
    * 10⁶.
    */
  private[operators] def chainWalk(events: DataFrame, keyCol: String,
                                   tsCol: String, stepConds: Seq[Column],
                                   windowSec: Option[Long],
                                   minStartOnly: Boolean = false,
                                   strictOrder: Boolean = false,
                                   strictDedup: Boolean = false)
      : DataFrame = {
    require(!minStartOnly || windowSec.isEmpty,
      "minStartOnly is exact only for an unbounded walk: a window " +
        "bound can disqualify the earliest start yet admit a later one")
    require(!minStartOnly || (!strictOrder && !strictDedup),
      "strict modes walk every start (an aborted earliest chain does " +
        "not dominate later starts)")
    val steps = stepConds
    // one chain per distinct (key, step-1 instant); µs longs so the
    // window bound is exact integer arithmetic in every engine
    val starts = events.filter(steps.head)
      .select(col(keyCol).as("__k"), unix_micros(col(tsCol)).as("t1"))
    var chains =
      (if (minStartOnly) starts.groupBy("__k").agg(min("t1").as("t1"))
       else starts.distinct())
        .withColumn("tcur", col("t1"))
        .withColumn("level", lit(1))
    for (i <- 1 until steps.length) {
      // Build rows per level: the step-(i+1) events, widened when a
      // strict mode needs visibility of other events — ALL events for
      // strict_order (the "earliest event of any type" probe), the
      // already-matched conditions for strict_dedup (the interrupt
      // set). Flags collapse per (key, instant) with max() — the same
      // exchange distinct() costs, carrying two small ints more.
      val stepCond = steps(i)
      val dupCond: Option[Column] =
        if (strictDedup) Some(steps.take(i).reduce(_ || _)) else None
      val includeCond =
        if (strictOrder) lit(true)
        else dupCond.map(stepCond || _).getOrElse(stepCond)
      val builds = events.filter(includeCond)
        .select(col(keyCol).as("__k"), unix_micros(col(tsCol)).as("__t"),
          when(stepCond, 1).otherwise(0).as("__s"),
          dupCond.map(c => when(c, 1).otherwise(0)).getOrElse(lit(0))
            .as("__d"))
        .groupBy("__k", "__t")
        .agg(max("__s").as("__is_step"), max("__d").as("__is_dup"))
        .withColumn("__tag", lit(0))
        .withColumn("t1", lit(null).cast("long"))
        .withColumn("tcur", lit(null).cast("long"))
        .withColumn("level", lit(null).cast("int"))
      val probes = chains.select(col("__k"), col("tcur").as("__t"),
        lit(0).as("__is_step"), lit(0).as("__is_dup"),
        lit(1).as("__tag"), col("t1"), col("tcur"), col("level"))
      // "earliest build strictly after this probe" as a REVERSE running
      // min: sort descending and take min over the strictly-preceding
      // frame. Contents are identical to an ascending strictly-following
      // frame, but the growing (unboundedPreceding, -1) frame is
      // incrementally maintained by WindowExec — O(n) per key — whereas
      // an unbounded-FOLLOWING frame is recomputed from scratch per row,
      // O(n²) on a hot key (measured: 100k-event key, 208 s → sub-second).
      // At equal __t the descending tag order puts probes (1) before
      // builds (0), so a probe's frame excludes equal-timestamp builds —
      // the strict-increase rule falls out of the sort order.
      val w = Window.partitionBy("__k")
        .orderBy(col("__t").desc, col("__tag").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val nextStep =
        min(when(col("__tag") === 0 && col("__is_step") === 1, col("__t")))
          .over(w)
      // __next must materialize BEFORE the probe filter: referencing the
      // window expression after the builds are filtered away would
      // re-evaluate it over a build-free frame (always null). The three
      // mins share one window spec, so WindowExec computes them in one
      // pass over one sort.
      val windowOk = windowSec match {
        case Some(wSec) => col("__next") - col("t1") <= wSec * 1000000L
        case None       => lit(true) // spanning match: no time bound
      }
      // strict_order: no event of any type strictly between tcur and
      // the step event (nextAny ≤ nextStep always — step builds are a
      // subset — so equality means "nothing intervenes")
      val orderOk =
        if (strictOrder) col("__next") === col("__next_any") else lit(true)
      // strict_dedup: no repeat of an already-matched condition
      // strictly before the step event; a dup AT the step instant is
      // allowed (repeated-condition patterns stay satisfiable)
      val dedupOk =
        if (strictDedup)
          col("__next_dup").isNull || col("__next") <= col("__next_dup")
        else lit(true)
      val matched = col("level") === i && col("__next").isNotNull &&
        windowOk && orderOk && dedupOk
      var staged = probes.unionByName(builds)
        .withColumn("__next", nextStep)
      if (strictOrder)
        staged = staged.withColumn("__next_any",
          min(when(col("__tag") === 0, col("__t"))).over(w))
      if (strictDedup)
        staged = staged.withColumn("__next_dup",
          min(when(col("__tag") === 0 && col("__is_dup") === 1, col("__t")))
            .over(w))
      chains = staged
        .filter(col("__tag") === 1)
        .select(col("__k"), col("t1"),
          when(matched, col("__next")).otherwise(col("tcur")).as("tcur"),
          when(matched, lit(i + 1)).otherwise(col("level")).as("level"))
    }
    chains.groupBy("__k")
      .agg(max("level").as("funnel_level"))
      .withColumnRenamed("__k", keyCol)
  }

  /** Cohort retention matrix — the ClickHouse `retention` aggregate in
    * its universal dashboard form: each key's cohort day is its first
    * day satisfying `cohortFilter` (e.g. signup), and for every offset
    * `0..maxOffsetDays` the matrix counts cohort members with ANY
    * event that many days later. Returns
    * `(cohort_day, day_offset, active_users, cohort_size,
    * retained_rate)`; offset 0 is the cohort itself (rate 1 by
    * construction — the cohort day is an active day).
    *
    * Shape: per-key day-activity dedup (map-side combinable distinct),
    * one key-equi-join against the |keys|-row cohort frame, then a
    * grouped count — fan-out per key is its distinct active days
    * within the horizon, bounded by `maxOffsetDays + 1`.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
                      cohortFilter: org.apache.spark.sql.Column,
                      maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0,
      s"cohortRetention: maxOffsetDays must be >= 0, got $maxOffsetDays")
    import graft.functions.Rounding.pround
    val days = events.select(col(keyCol).as("__k"),
      to_date(col(tsCol)).as("__d"), cohortFilter.as("__c"))
    val cohort = days.filter(col("__c"))
      .groupBy("__k").agg(min("__d").as("cohort_day"))
    val active = days.select("__k", "__d").distinct()
    val counts = cohort.join(active, "__k")
      .withColumn("day_offset", datediff(col("__d"), col("cohort_day")))
      .filter(col("day_offset").between(0, maxOffsetDays))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("__k")).as("active_users"))
    val sizeW = Window.partitionBy("cohort_day")
    counts
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("active_users"))).over(sizeW))
      .withColumn("retained_rate",
        pround(col("active_users").cast("double") / col("cohort_size"), 6))
  }

  /** Kaplan–Meier survival estimator (right-censored, the product-limit
    * form): per cohort and observed duration t,
    * S(t) = Π_{tᵢ ≤ t, dᵢ > 0} (1 − dᵢ/nᵢ) with nᵢ = subjects still at
    * risk (duration ≥ tᵢ). The churn-curve primitive a
    * retention dashboard plots — censored subjects (still active at
    * the horizon) leave the risk set without counting as deaths,
    * which is exactly what a naive "churn rate by week" gets wrong.
    *
    * Shape: one subject-grain aggregate feeds a |distinct durations|-
    * per-cohort frame; n_risk is an inclusive DESCENDING running sum
    * (growing frame — WindowExec keeps it O(n)), the product is
    * exp(Σ ln) with each ln term prounded at 1e-9 and summed as
    * DECIMAL(38,12) (the perplexity discipline: both transcendentals
    * absorbed, so engines agree bit-for-bit); once any tᵢ exhausts the
    * risk set (dᵢ = nᵢ) the curve is pinned to exactly 0 from there on
    * — ln(0) never evaluates.
    */
  def kaplanMeier(subjects: DataFrame, cohortCol: String,
                  durationCol: String, eventCol: String): DataFrame = {
    import graft.functions.Rounding.pround
    val perT = subjects
      .select(col(cohortCol).as("__c"), col(durationCol).as("__t"),
        col(eventCol).cast("boolean").as("__e"))
      .filter(col("__t").isNotNull)
      .groupBy("__c", "__t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("__e"), 1L).otherwise(0L)).as("censored"))
    val wDesc = Window.partitionBy("__c").orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.partitionBy("__c").orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = perT.withColumn("n_risk",
      sum(col("d") + col("censored")).over(wDesc))
    val dOverN = col("d").cast("double") / col("n_risk").cast("double")
    val stepped = risk
      .withColumn("__term",
        when(col("d") > 0 && col("d") < col("n_risk"),
          pround(log(lit(1.0) - dOverN), 9))
          .otherwise(lit(0.0)).cast("decimal(38,12)"))
      .withColumn("__dead",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wAsc))
      .withColumn("__lnsum", sum(col("__term")).over(wAsc))
    stepped.select(col("__c").as(cohortCol), col("__t").as(durationCol),
      col("n_risk"), col("d"), col("censored"),
      when(col("__dead") === 1, lit(0.0))
        .otherwise(pround(exp(col("__lnsum").cast("double")), 9))
        .as("survival"))
  }
}
