package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse miscellaneous-aggregate parity: the dashboard aggregate
  * functions beside the funnel/sequence/sketch tiers —
  * `retention`, `deltaSum`, `sumMap`, `groupUniqArray`, `uniqUpTo`,
  * `argMax`/`argMin`, `intervalLengthSum`, `maxIntersections`,
  * `groupArrayMovingSum`, `sequenceNextNode` (reference target
  * `v2/sql/create_tables.sql:3-21` — the logs table exists to feed
  * exactly this ClickHouse aggregate surface downstream).
  *
  * Design rules shared by every operator here:
  *  - one hash exchange on the key; any ordered pass is a window over
  *    that exchange with a GROWING frame (unboundedPreceding → bounded),
  *    which WindowExec maintains incrementally — O(n) per key (the
  *    funnel frame-direction rule; never unbounded-FOLLOWING);
  *  - plain aggregates are map-side combinable (partial HashAggregate
  *    before the shuffle);
  *  - determinism: ClickHouse leaves equal-timestamp order and
  *    arg-tie-breaks unspecified; every operator here takes an explicit
  *    unique tie column or defines the order (sorted arrays), so
  *    distributed runs and the DuckDB oracle agree bit-for-bit. Summed
  *    columns should be integral (BIGINT / DECIMAL) when cross-engine
  *    hash equality matters — double addition is order-dependent.
  */
object Aggregates {

  /** ClickHouse `retention(c₁, c₂, …, c_k)`: per key, `r1 = c₁ ever`
    * and `rᵢ = c₁ ever AND cᵢ ever` for i ≥ 2 (no time ordering — the
    * first condition gates the rest, CH's definition). Flat boolean
    * columns `r1..rk` (CH's UInt8 array, unnested for schema clarity).
    * One map-side-combinable aggregate: k maxes over the key exchange.
    */
  def retention(df: DataFrame, keyCol: String, conds: Seq[Column])
      : DataFrame = {
    require(conds.nonEmpty, "retention: conds must be non-empty")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, lit(1)).otherwise(lit(0))).as(s"__c${i + 1}")
    }
    val agg = df.groupBy(col(keyCol)).agg(flags.head, flags.tail: _*)
    val out = (col("__c1") === 1).as("r1") +:
      (2 to conds.length).map(i =>
        (col("__c1") === 1 && col(s"__c$i") === 1).as(s"r$i"))
    agg.select(col(keyCol) +: out: _*)
  }

  /** ClickHouse `deltaSum(v)` over a per-key time-ordered stream: the
    * sum of POSITIVE consecutive differences (total counter increase
    * with resets ignored — the monotonic-counter reading). The first
    * value
    * contributes nothing (only differences count). `tieCol` must be
    * unique per key. One lag window + one grouped sum; pass an integral
    * `value` column for cross-engine exactness.
    */
  def deltaSum(df: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, value: Column): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tie"))
    df.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), value.as("__v"))
      .withColumn("__d", col("__v") - lag(col("__v"), 1).over(w))
      .groupBy("__k")
      .agg(coalesce(sum(when(col("__d") > 0, col("__d"))), lit(0L))
        .as("delta_sum"))
      .withColumnRenamed("__k", keyCol)
  }

  /** ClickHouse `sumMap(k, v)`: per key, the map mk → Σv, emitted as
    * two PARALLEL arrays sorted by map key (CH's own output shape —
    * `sumMap` returns sorted key/value array tuples). Two aggregates,
    * both map-side combinable; the collect is bounded by the number of
    * distinct map keys per group (the map's own cardinality), not by
    * row count.
    */
  def sumMap(df: DataFrame, keyCol: String, mapKey: Column,
             value: Column): DataFrame = {
    val per = df
      .select(col(keyCol).as("__k"), mapKey.as("__mk"), value.as("__v"))
      .groupBy("__k", "__mk").agg(sum(col("__v")).as("__s"))
    per.groupBy("__k")
      .agg(sort_array(collect_list(struct(col("__mk"), col("__s"))))
        .as("__e"))
      .select(col("__k").as(keyCol),
        transform(col("__e"), _.getField("__mk")).as("map_keys"),
        transform(col("__e"), _.getField("__s")).as("map_sums"))
  }

  /** ClickHouse `minMap(k, v)` / `maxMap(k, v)`: per key, the map
    * mk → min(v) and mk → max(v) as parallel key-sorted arrays —
    * [[sumMap]]'s siblings, same two map-side-combinable aggregates,
    * same CH sorted-tuple output shape.
    */
  def minMaxMap(df: DataFrame, keyCol: String, mapKey: Column,
                value: Column): DataFrame = {
    val per = df
      .select(col(keyCol).as("__k"), mapKey.as("__mk"), value.as("__v"))
      .groupBy("__k", "__mk")
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    per.groupBy("__k")
      .agg(sort_array(collect_list(
        struct(col("__mk"), col("__mn"), col("__mx")))).as("__e"))
      .select(col("__k").as(keyCol),
        transform(col("__e"), _.getField("__mk")).as("map_keys"),
        transform(col("__e"), _.getField("__mn")).as("map_mins"),
        transform(col("__e"), _.getField("__mx")).as("map_maxs"))
  }

  /** ClickHouse `avgWeighted(v, w)`: Σwv / Σw per key, NULL when the
    * weight sum is zero (CH's NaN, made join-safe). Pass INTEGRAL
    * value/weight columns: both sums are then exact BIGINTs
    * (accumulation-order-independent) and only the final quotient is a
    * double — quantized by [[graft.functions.Rounding.pround]] so
    * distributed and single-node runs agree bit-for-bit. One
    * map-side-combinable aggregate.
    */
  def avgWeighted(df: DataFrame, keyCol: String, value: Column,
                  weight: Column): DataFrame = {
    import graft.functions.Rounding.pround
    df.select(col(keyCol).as("__k"), value.as("__v"), weight.as("__w"))
      .groupBy("__k")
      .agg(sum(col("__v") * col("__w")).as("__wv"),
        sum(col("__w")).as("__sw"))
      .select(col("__k").as(keyCol),
        when(col("__sw") =!= 0,
          pround(col("__wv").cast("double") / col("__sw").cast("double"),
            9)).as("avg_weighted"))
  }

  /** ClickHouse `simpleLinearRegression(x, y)` + `corr(x, y)`: per
    * key, the least-squares `(slope, intercept)` and Pearson
    * correlation from ONE pass of map-side-combinable integer sums
    * (n, Σx, Σy, Σxy, Σx², Σy²). Pass INTEGRAL x/y columns sized so
    * `n·Σy²` stays within BIGINT (the caller's contract — e.g.
    * hour-of-day vs cents): every sum and both difference terms are
    * then exact, and only the final divisions (and the one
    * correctly-rounded IEEE `sqrt`) run in double, quantized via
    * [[graft.functions.Rounding.pround]]. Constant x or y ⇒ NULL
    * slope/intercept/corr (degenerate fit), CH's NaN made join-safe.
    */
  def linearFit(df: DataFrame, keyCol: String, x: Column, y: Column)
      : DataFrame = {
    import graft.functions.Rounding.pround
    val s = df.select(col(keyCol).as("__k"), x.as("__x"), y.as("__y"))
      .groupBy("__k")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val dx = s("__n") * col("__sxx") - col("__sx") * col("__sx")
    val dy = s("__n") * col("__syy") - col("__sy") * col("__sy")
    val num = s("__n") * col("__sxy") - col("__sx") * col("__sy")
    val slope = num.cast("double") / dx.cast("double")
    val intercept = (col("__sy") * col("__sxx") -
      col("__sx") * col("__sxy")).cast("double") / dx.cast("double")
    val corr = num.cast("double") /
      sqrt(dx.cast("double") * dy.cast("double"))
    s.select(col("__k").as(keyCol),
      when(dx =!= 0, pround(slope, 9)).as("slope"),
      when(dx =!= 0, pround(intercept, 9)).as("intercept"),
      when(dx =!= 0 && dy =!= 0, pround(corr, 9)).as("corr"))
  }

  /** ClickHouse `groupUniqArray([maxSize])(v)`: per key, the distinct
    * values as a sorted array. CH's `max_size` keeps an ARBITRARY
    * subset; the deterministic reading here is the `maxSize` SMALLEST
    * distinct values (the only engine-independent choice — same
    * convention as `groupArraySorted`). The rank pre-filter rides
    * WindowGroupLimit, so a mega-group ships ~maxSize rows per map
    * partition, never its distinct count.
    */
  def groupUniqArray(df: DataFrame, keyCol: String, value: Column,
                     maxSize: Option[Int] = None): DataFrame = {
    val dv = df.select(col(keyCol).as("__k"), value.as("__v")).distinct()
    val capped = maxSize match {
      case Some(n) =>
        require(n > 0, s"groupUniqArray: maxSize must be positive, got $n")
        val w = Window.partitionBy("__k").orderBy("__v")
        dv.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= n).drop("__rn")
      case None => dv
    }
    capped.groupBy("__k")
      .agg(sort_array(collect_list(col("__v"))).as("uniq_values"))
      .withColumnRenamed("__k", keyCol)
  }

  /** ClickHouse `uniqUpTo(N)(v)`: exact distinct count while ≤ N,
    * N+1 as the "more than N" sentinel. This is the EXACT oracle
    * semantics (a distinct shuffle); CH's O(N)-state early-out is a
    * state-size optimization with the same answer — the engine's
    * bounded-state distinct estimators are [[graft.functions.KmvDistinct]]
    * and the uniqCombined sparse/dense state in
    * [[graft.pipeline.Rollup]], which ARE mergeable-bounded and cover
    * the 100 TB path (same exact-twin convention as Misra–Gries/KMV).
    */
  def uniqUpTo(df: DataFrame, keyCol: String, value: Column, n: Int)
      : DataFrame = {
    require(n > 0, s"uniqUpTo: N must be positive, got $n")
    df.groupBy(col(keyCol))
      .agg(least(countDistinct(value), lit(n.toLong + 1L))
        .as("uniq_upto"))
  }

  /** ClickHouse `argMax(arg, ord)` / `argMin(arg, ord)` with a
    * DETERMINISTIC tie-break (CH picks an arbitrary row among equal
    * `ord`; here the unique `tieCol` decides — max takes the largest
    * tie, min the smallest). One struct-lexicographic MAX/MIN — a
    * plain map-side-combinable aggregate, no window, no shuffle beyond
    * the key exchange.
    */
  def argMinMax(df: DataFrame, keyCol: String, arg: Column, ord: Column,
                tieCol: String): DataFrame = {
    // NULL-ord rows must be skipped (CH argMin/argMax ignore them), but
    // a non-null struct containing a NULL field still participates in
    // min/max and NULL sorts lowest in struct order — so NULL the whole
    // struct instead; min/max skip NULL inputs.
    val row = when(ord.isNotNull,
      struct(ord.as("o"), col(tieCol).as("t"), arg.as("a")))
    df.groupBy(col(keyCol))
      .agg(max(row).getField("a").as("arg_max"),
        min(row).getField("a").as("arg_min"))
  }

  /** ClickHouse `intervalLengthSum(start, end)`: per key, the total
    * length of the UNION of the `[start, end)` intervals (overlaps
    * counted once; zero/negative-length intervals contribute nothing).
    * The sweep is one window pass: with intervals sorted by
    * `(start, end)`, the covered-so-far frontier is the running MAX of
    * previous ends — a growing `(unboundedPreceding, −1)` frame,
    * incrementally maintained, O(n) per key — and each interval
    * contributes `max(0, end − max(start, frontier))`. Numeric
    * (e.g. epoch-µs BIGINT) bounds keep the sum exact.
    */
  def intervalLengthSum(df: DataFrame, keyCol: String, start: Column,
                        end: Column): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol).as("__k"), start.as("__s"), end.as("__e"))
      .withColumn("__cov", max(col("__e")).over(w))
      .withColumn("__len",
        greatest(col("__e") - greatest(col("__s"),
          coalesce(col("__cov"), col("__s"))), lit(0L)))
      .groupBy("__k").agg(sum(col("__len")).as("covered_length"))
      .withColumnRenamed("__k", keyCol)
  }

  /** ClickHouse `maxIntersections(start, end)`: per key, the maximum
    * number of `[start, end)` intervals covering any single point. The
    * classic sweep: ±1 events sorted by `(point, delta)` — ends (−1)
    * before starts (+1) at equal points, so a closing interval never
    * overlaps one opening at the same instant (CH's own sort order) —
    * then a running sum over a growing frame, max per key. Two slim
    * rows per interval, one exchange, O(n) per key.
    */
  def maxIntersections(df: DataFrame, keyCol: String, start: Column,
                       end: Column): DataFrame = {
    val iv = df.select(col(keyCol).as("__k"), start.as("__s"),
        end.as("__e"))
      .filter(col("__e") > col("__s"))
    val pts = iv.select(col("__k"), col("__s").as("__p"), lit(1).as("__d"))
      .unionByName(
        iv.select(col("__k"), col("__e").as("__p"), lit(-1).as("__d")))
    val w = Window.partitionBy("__k").orderBy(col("__p"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pts.withColumn("__open", sum(col("__d")).over(w))
      .groupBy("__k")
      .agg(coalesce(max(col("__open")), lit(0)).as("max_intersections"))
      .withColumnRenamed("__k", keyCol)
  }

  /** ClickHouse `groupArrayMovingSum(W)(v)`: per key, the time-ordered
    * array whose i-th element is the sum of the last `W` values up to
    * position i. The moving sum is a BOUNDED sliding `rows between
    * W−1 preceding and current` frame (WindowExec's sliding frame
    * adds/removes incrementally — O(n) per key), and the array is the
    * sorted-struct collect (deterministic order via the unique
    * `tieCol`). Collect is bounded by the per-key row count — this is
    * an array-RETURNING aggregate by contract, same as CH's; cap the
    * group upstream (`Sampling.capPerGroup`) when keys are unbounded.
    * Pass an integral `value` for cross-engine exactness.
    */
  def movingSum(df: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, value: Column, window: Int): DataFrame = {
    require(window > 0, s"movingSum: window must be positive, got $window")
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tie"))
      .rowsBetween(-(window - 1).toLong, 0)
    df.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), value.as("__v"))
      .withColumn("__ms", sum(col("__v")).over(w))
      .groupBy("__k")
      .agg(sort_array(collect_list(
        struct(col("__ts"), col("__tie"), col("__ms")))).as("__e"))
      .select(col("__k").as(keyCol),
        transform(col("__e"), _.getField("__ms")).as("moving_sums"))
  }

  /** ClickHouse `entropy(v)`: Shannon entropy (bits) of the value
    * distribution per key. Counts are exact; each term
    * −(c/n)·log2(c/n) is rounded at 1e-9 BEFORE the sum (the
    * perplexity/klDrift discipline: `log` is not correctly-rounded
    * IEEE, so per-term quantization + an exact DECIMAL sum is what
    * makes the aggregate accumulation-order-independent and
    * cross-engine identical), and the rounded terms sum as
    * DECIMAL(38,12). Two map-side-combinable counts, a |key|-row
    * broadcast of n — the corpus streams once.
    */
  def entropy(df: DataFrame, keyCol: String, value: Column): DataFrame = {
    import graft.functions.Rounding.pround
    val counts = df.select(col(keyCol).as("__k"), value.as("__v"))
      .groupBy("__k", "__v").agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy("__k").agg(sum(col("__c")).as("__n"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    counts.join(broadcast(totals), Seq("__k"))
      .withColumn("__t",
        pround(-p * log2(p), 9).cast("decimal(38,12)"))
      .groupBy("__k")
      .agg(sum(col("__t")).cast("double").as("entropy"))
      .withColumnRenamed("__k", keyCol)
  }

  /** ClickHouse `skewPop(v)` / `kurtPop(v)` (+ stddevPop): population
    * central moments from ONE pass of integer raw-moment sums
    * (n, Σx, Σx², Σx³, Σx⁴ — all exact BIGINTs; the caller passes an
    * INTEGRAL x sized so n·max(x)⁴ stays within BIGINT, e.g. a decile
    * bucket). Central moments come from the raw sums by the standard
    * expansion — m2 = Σx²/n − μ², m3 = Σx³/n − 3μΣx²/n + 2μ³,
    * m4 = Σx⁴/n − 4μΣx³/n + 6μ²Σx²/n − 3μ⁴ — evaluated in double in a
    * FIXED expression order, then prounded: skew = m3/m2^1.5
    * (sqrt+multiply, no transcendental pow), kurt = m4/m2². Constant
    * x ⇒ NULL skew/kurt (m2 = 0), stddev 0. One map-side-combinable
    * aggregate.
    */
  def moments(df: DataFrame, keyCol: String, x: Column): DataFrame = {
    import graft.functions.Rounding.pround
    val s = df.select(col(keyCol).as("__k"), x.as("__x"))
      .groupBy("__k")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        sum(col("__x") * col("__x") * col("__x")).as("__s3"),
        sum(col("__x") * col("__x") * col("__x") * col("__x")).as("__s4"))
    val n = col("__n").cast("double")
    val mu = col("__s1").cast("double") / n
    val m2 = col("__s2").cast("double") / n - mu * mu
    val m3 = col("__s3").cast("double") / n -
      lit(3.0) * mu * (col("__s2").cast("double") / n) +
      lit(2.0) * mu * mu * mu
    val m4 = col("__s4").cast("double") / n -
      lit(4.0) * mu * (col("__s3").cast("double") / n) +
      lit(6.0) * mu * mu * (col("__s2").cast("double") / n) -
      lit(3.0) * mu * mu * mu * mu
    // m2 = Σx²/n − μ² can cancel to a tiny negative for near-constant
    // large-magnitude x; ClickHouse's stddevPop returns 0 there, sqrt
    // of a negative would give NaN — clamp (mirrored in the oracle SQL).
    s.select(col("__k").as(keyCol),
      pround(sqrt(greatest(m2, lit(0.0))), 9).as("stddev_pop"),
      when(m2 > 0, pround(m3 / (m2 * sqrt(m2)), 9)).as("skew_pop"),
      when(m2 > 0, pround(m4 / (m2 * m2), 9)).as("kurt_pop"))
  }

  /** ClickHouse `histogram(M)(v)`, the deterministic reading: CH's
    * adaptive histogram is merge-order-dependent by design (bin
    * boundaries depend on the stream split), so the engine-independent
    * form is M EQUAL-WIDTH bins over the per-key [min, max] range —
    * one bounds aggregate (broadcast back, |keys| rows) + one binned
    * count (map-side combinable), the corpus streamed twice at scan
    * speed. Bin index = min(floor((v−lo)·M/(hi−lo)), M−1) evaluated in
    * a fixed double-expression order; `lo`/`hi` bin edges are prounded
    * for reporting. A constant key (hi = lo) lands everything in bin
    * 0. Empty bins are absent (sparse output), matching a GROUP BY.
    */
  def histogram(df: DataFrame, keyCol: String, value: Column, bins: Int)
      : DataFrame = {
    import graft.functions.Rounding.pround
    require(bins > 0, s"histogram: bins must be positive, got $bins")
    val v = df.select(col(keyCol).as("__k"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val bounds = v.groupBy("__k")
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val idx = when(col("__hi") === col("__lo"), lit(0L)).otherwise(
      least(floor((col("__v") - col("__lo")) * lit(bins.toDouble) /
        (col("__hi") - col("__lo"))), lit(bins.toLong - 1L)))
    v.join(broadcast(bounds), Seq("__k"))
      .withColumn("__b", idx)
      .groupBy("__k", "__b", "__lo", "__hi")
      .agg(count(lit(1)).as("bin_count"))
      .select(col("__k").as(keyCol), col("__b").as("bin"),
        pround(col("__lo") + col("__b").cast("double") * width, 9)
          .as("bin_lo"),
        pround(col("__lo") + (col("__b").cast("double") + 1.0) * width, 9)
          .as("bin_hi"),
        col("bin_count"))
  }

  /** ClickHouse `runningDifference(v)`: per key, each row's value
    * minus the previous row's in `(ts, tie)` order — 0 for the first
    * row (CH's rule). One lag window, row-level output (the per-key
    * sum of the positive half is [[deltaSum]]).
    */
  def runningDifference(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, value: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("__v", value)
      .withColumn("running_diff",
        coalesce(col("__v") - lag(col("__v"), 1).over(w), lit(0L)))
      .drop("__v")
  }

  /** ClickHouse `groupArrayMovingAvg(W)(v)`: [[movingSum]] divided by
    * the FIXED window size W (CH divides by W even on the short
    * prefix — the documented difference from a prefix-count average).
    * Integral inputs keep the sliding sum exact; only the final
    * division runs in double, prounded per element.
    */
  def movingAvg(df: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, value: Column, window: Int): DataFrame = {
    import graft.functions.Rounding.pround
    movingSum(df, keyCol, tsCol, tieCol, value, window)
      .select(col(keyCol),
        transform(col("moving_sums"),
          s => pround(s.cast("double") / lit(window.toDouble), 9))
          .as("moving_avgs"))
  }

  /** ClickHouse `sequenceNextNode('forward', 'first_match')(ts, next,
    * c₁, …, c_k)`: per key, scan the FULL event stream in `(ts, tie)`
    * order, find the EARLIEST position i where the k CONSECUTIVE
    * events i…i+k−1 satisfy `conds(0)…conds(k−1)` (consecutive in the
    * whole stream — sequenceNextNode does not skip non-matching
    * events, unlike sequenceMatch), and return `nextCol` of event
    * i+k — NULL when the match ends the stream or no match exists.
    *
    * One window pass: per-row condition flags, `lead(flag_j, j)`
    * composes the consecutive-run predicate, `lead(next, k)` reads the
    * answer; the earliest candidate is a struct-MIN on the unique row
    * number (no second window). Offset functions are O(1) per row;
    * linear on hot keys, one exchange.
    */
  def sequenceNextNode(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, nextCol: Column,
                       conds: Seq[Column], forward: Boolean = true,
                       firstMatch: Boolean = true): DataFrame = {
    require(conds.nonEmpty, "sequenceNextNode: conds must be non-empty")
    // CH's direction/base arguments: 'backward' scans the stream from
    // the end (conds matched in reverse time order, "next" = the event
    // BEFORE the run in wall-clock time) — the same window pass over
    // the reversed sort; 'last_match' takes the latest run instead of
    // the earliest — struct-MAX instead of MIN on the scan position.
    val w =
      if (forward)
        Window.partitionBy("__k").orderBy(col("__ts"), col("__tie"))
      else
        Window.partitionBy("__k")
          .orderBy(col("__ts").desc, col("__tie").desc)
    val flagged = df.select(
      Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), nextCol.as("__n")) ++
        conds.zipWithIndex.map { case (c, i) =>
          when(c, lit(1)).otherwise(lit(0)).as(s"__c$i")
        }: _*)
    val runOk = conds.indices
      .map(j => lead(col(s"__c$j"), j).over(w) === 1)
      .reduce(_ && _)
    val keys = flagged.select(col("__k")).distinct()
    val matches = flagged
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__n"), conds.length).over(w))
      .withColumn("__ok", runOk)
      .filter(col("__ok"))
      .groupBy("__k")
      .agg((if (firstMatch) min(struct(col("__rn"), col("__next")))
            else max(struct(col("__rn"), col("__next"))))
        .getField("__next").as("next_node"))
    keys.join(matches, Seq("__k"), "left")
      .withColumnRenamed("__k", keyCol)
  }

  /** ClickHouse `boundingRatio(x, y)`: per key, the slope between the
    * leftmost and rightmost points — (y@maxX − y@minX)/(maxX − minX),
    * ties on x broken by the unique `tieCol` (CH picks an arbitrary
    * row; the tie column makes it deterministic). Two struct-extreme
    * aggregates, no window; NULL when the key has a single distinct x.
    */
  def boundingRatio(df: DataFrame, keyCol: String, x: Column, y: Column,
                    tieCol: String): DataFrame = {
    import graft.functions.Rounding.pround
    val row = struct(x.as("x"), col(tieCol).as("t"), y.as("y"))
    df.groupBy(col(keyCol))
      .agg(max(row).as("__hi"), min(row).as("__lo"))
      .select(col(keyCol),
        when(col("__hi.x") =!= col("__lo.x"),
          pround((col("__hi.y") - col("__lo.y")).cast("double") /
            (col("__hi.x") - col("__lo.x")).cast("double"), 9))
          .as("bounding_ratio"))
  }

  /** ClickHouse `cramersV(a, b)` / `contingency(a, b)`: association
    * between two categorical columns per key, from EXACT contingency
    * counts. χ² is computed by the identity
    * χ² = n·(Σᵢⱼ nᵢⱼ²/(nᵢ·nⱼ)) − n, with each rational term
    * nᵢⱼ²/(nᵢ·nⱼ) rounded at 1e-12 and summed as DECIMAL(38,15) (the
    * entropy/klDrift discipline — division is the only inexact step,
    * so per-term quantization + an exact sum makes the statistic
    * order-independent and cross-engine identical). Then
    * V = √(χ²/(n·min(r−1, c−1))) and C = √(χ²/(χ² + n)), prounded.
    * One pass for cell counts; row/column marginals derive from the
    * |cells| frame (map-side combinable, never a second data scan);
    * NULL V when either side is constant (min(r−1, c−1) = 0).
    */
  def categoricalAssociation(df: DataFrame, keyCol: String, a: Column,
                             b: Column): DataFrame = {
    import graft.functions.Rounding.pround
    val cells = df
      .select(col(keyCol).as("__k"), a.as("__a"), b.as("__b"))
      .groupBy("__k", "__a", "__b").agg(count(lit(1)).as("__nij"))
    val rows = cells.groupBy("__k", "__a").agg(sum(col("__nij")).as("__ni"))
    val cols = cells.groupBy("__k", "__b").agg(sum(col("__nij")).as("__nj"))
    val dims = cells.groupBy("__k")
      .agg(sum(col("__nij")).as("__n"),
        countDistinct(col("__a")).as("__r"),
        countDistinct(col("__b")).as("__c"))
    val term = pround(
      (col("__nij") * col("__nij")).cast("double") /
        (col("__ni") * col("__nj")).cast("double"), 12)
      .cast("decimal(38,15)")
    val joined = cells
      .join(rows, Seq("__k", "__a"))
      .join(cols, Seq("__k", "__b"))
      .groupBy("__k").agg(sum(term).as("__s"))
      .join(dims, Seq("__k"))
    val nD = col("__n").cast("double")
    // clamp at 0: per-term 1e-12 rounding can leave a tiny negative
    // residue on an independent table, which would NaN the sqrt
    val chi2 = greatest(nD * col("__s").cast("double") - nD, lit(0.0))
    val minDim = least(col("__r") - 1, col("__c") - 1).cast("double")
    joined.select(col("__k").as(keyCol),
      pround(chi2, 6).as("chi2"),
      when(minDim > 0, pround(sqrt(chi2 / (nD * minDim)), 9))
        .as("cramers_v"),
      pround(sqrt(chi2 / (chi2 + nD)), 9).as("contingency_coef"))
  }

  /** ClickHouse `welchTTest(x)` over a boolean sample split: per key,
    * the Welch two-sample t statistic and Welch–Satterthwaite degrees
    * of freedom, from ONE pass of conditional integer sums
    * (n, Σx, Σx² per sample — exact BIGINTs for integral x, the
    * caller's contract). Sample variances and the t/df quotients run
    * in double in a FIXED expression order and are prounded. Keys
    * where either sample has n < 2, or both variances are 0, yield
    * NULL (degenerate test), CH's NaN made join-safe. The p-value is
    * deliberately not emitted: it needs the regularized incomplete
    * beta, which is library-dependent — the statistic is the
    * engine-checkable part.
    */
  def welchT(df: DataFrame, keyCol: String, sampleA: Column, x: Column)
      : DataFrame = {
    import graft.functions.Rounding.pround
    val s = df.select(col(keyCol).as("__k"), sampleA.as("__a"),
        x.as("__x"))
      .groupBy("__k")
      .agg(
        // n counts only rows whose x actually contributes to Σx/Σx² —
        // a NULL x row must not deflate the mean/variance denominators
        sum(when(col("__a") && col("__x").isNotNull, 1L).otherwise(0L))
          .as("__n1"),
        sum(when(col("__a"), col("__x"))).as("__s1"),
        sum(when(col("__a"), col("__x") * col("__x"))).as("__ss1"),
        sum(when(!col("__a") && col("__x").isNotNull, 1L).otherwise(0L))
          .as("__n2"),
        sum(when(!col("__a"), col("__x"))).as("__s2"),
        sum(when(!col("__a"), col("__x") * col("__x"))).as("__ss2"))
    def nd(c: String) = col(c).cast("double")
    def m(sc: String, nc: String) = nd(sc) / nd(nc)
    // sample variance: (Σx² − (Σx)²/n) / (n−1), fixed order
    def v(ssc: String, sc: String, nc: String) =
      (nd(ssc) - nd(sc) * nd(sc) / nd(nc)) / (nd(nc) - lit(1.0))
    val v1 = v("__ss1", "__s1", "__n1")
    val v2 = v("__ss2", "__s2", "__n2")
    val se1 = v1 / nd("__n1")
    val se2 = v2 / nd("__n2")
    val t = (m("__s1", "__n1") - m("__s2", "__n2")) / sqrt(se1 + se2)
    val dfW = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (nd("__n1") - lit(1.0)) +
        se2 * se2 / (nd("__n2") - lit(1.0)))
    val ok = col("__n1") >= 2 && col("__n2") >= 2 &&
      (v1 > 0 || v2 > 0)
    s.select(col("__k").as(keyCol),
      when(ok, pround(t, 9)).as("t_stat"),
      when(ok, pround(dfW, 9)).as("df"))
  }

  /** ClickHouse `mannWhitneyUTest(x)` over a boolean sample split: per
    * key, the EXACT Mann–Whitney U statistic, `min(U₁, U₂)` with
    * average ranks for ties. All arithmetic is integral: doubled
    * average ranks (2·minRank + (tieCount−1) — ties add ½-steps, so
    * doubling keeps BIGINTs), doubled rank sums, and
    * U₁·2 = R₁·2 − n₁(n₁+1); the only double is the final /2. One
    * rank window + one tie-count window over the same (key, x) sort —
    * a single exchange — then a grouped conditional sum. Keys with an
    * empty sample yield NULL. The p-value needs the normal
    * approximation (erfc) — library-dependent, not emitted; the exact
    * U is the engine-checkable part.
    */
  def mannWhitneyU(df: DataFrame, keyCol: String, sampleA: Column,
                   x: Column): DataFrame = {
    val v = df.select(col(keyCol).as("__k"), sampleA.as("__a"),
      x.as("__x"))
    val wr = Window.partitionBy("__k").orderBy("__x")
    val wt = Window.partitionBy("__k", "__x")
    val ranked = v
      .withColumn("__r", rank().over(wr))           // min rank of tie group
      .withColumn("__c", count(lit(1)).over(wt))    // tie-group size
      .withColumn("__ar2",
        lit(2L) * col("__r") + (col("__c") - lit(1L))) // doubled avg rank
    val agg = ranked.groupBy("__k")
      .agg(
        sum(when(col("__a"), col("__ar2"))).as("__r1x2"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("__n1"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__n2"))
    val u1x2 = col("__r1x2") - col("__n1") * (col("__n1") + lit(1L))
    val u2x2 = lit(2L) * col("__n1") * col("__n2") - u1x2
    agg.select(col("__k").as(keyCol),
      when(col("__n1") > 0 && col("__n2") > 0,
        least(u1x2, u2x2).cast("double") / lit(2.0)).as("u_stat"),
      col("__n1").as("n1"), col("__n2").as("n2"))
  }

  /** ClickHouse `rankCorr(x, y)`: Spearman's ρ per key — Pearson over
    * AVERAGE ranks, the tie-correct definition both CH and scipy use.
    * Same doubled-rank trick as [[mannWhitneyU]] (2·minRank + ties − 1
    * keeps every rank integral), applied independently to x and y —
    * two rank windows, but both partition on the SAME key so Catalyst
    * plans ONE hash exchange and two sorts within it. The Pearson
    * pieces (n·Σab − Σa·Σb and the two variance legs) accumulate as
    * DECIMAL(38,0): doubled ranks reach 2n, so the raw products reach
    * 4n³ — past BIGINT at n ≳ 1.3 M rows per key, which a 100 TB key
    * group will exceed. The only doubles are the two final sqrts
    * (correctly-rounded IEEE, engine-identical) and the division,
    * absorbed at 1e-9. A constant x or y (zero variance) yields NULL,
    * matching CH's nan→NULL surface.
    */
  def rankCorr(df: DataFrame, keyCol: String, x: Column, y: Column)
  : DataFrame = {
    import graft.functions.Rounding.pround
    val v = df.select(col(keyCol).as("__k"), x.as("__x"), y.as("__y"))
    def avgRank2(c: String, out: String) = {
      val wr = Window.partitionBy("__k").orderBy(col(c))
      val wt = Window.partitionBy(col("__k"), col(c))
      (d: DataFrame) => d
        .withColumn("__r", rank().over(wr))
        .withColumn("__c", count(lit(1)).over(wt))
        .withColumn(out, (lit(2L) * col("__r") + col("__c") - lit(1L))
          .cast("decimal(38,0)"))
        .drop("__r", "__c")
    }
    val ranked = avgRank2("__y", "__b")(avgRank2("__x", "__a")(v))
    val s = ranked.groupBy("__k").agg(
      count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(col("__a")).as("__sa"), sum(col("__b")).as("__sb"),
      sum(col("__a") * col("__a")).cast("decimal(38,0)").as("__saa"),
      sum(col("__b") * col("__b")).cast("decimal(38,0)").as("__sbb"),
      sum(col("__a") * col("__b")).cast("decimal(38,0)").as("__sab"))
    val num = (col("__n") * col("__sab") - col("__sa") * col("__sb"))
      .cast("double")
    val dx = (col("__n") * col("__saa") - col("__sa") * col("__sa"))
      .cast("double")
    val dy = (col("__n") * col("__sbb") - col("__sb") * col("__sb"))
      .cast("double")
    s.select(col("__k").as(keyCol),
      when(dx > 0 && dy > 0,
        pround(num / (sqrt(dx) * sqrt(dy)), 9)).as("rank_corr"),
      col("__n").cast("long").as("n"))
  }

  /** ClickHouse `kolmogorovSmirnovTest(x)` over a boolean sample
    * split: per key, the EXACT two-sample KS statistic
    * D = sup_t |F₁(t) − F₂(t)|. Entirely integral until the last
    * division: per distinct value, tie-group counts (map-side
    * combinable groupBy on (key, x)), a growing-frame cumulative sum
    * ordered by x (the ECDF numerators), and the sup taken over
    * |c₁·n₂ − c₂·n₁| as DECIMAL(38,0) — c·n reaches n², past BIGINT at
    * n ≳ 3 B rows per key. D = maxdiff / (n₁·n₂) is the one double.
    * The ECDF only changes at observed points and both ECDFs are
    * right-continuous step functions, so evaluating at each distinct
    * pooled value (tie-group END: cumulative count INCLUDES the group)
    * is exact, not an approximation. A key with an empty sample yields
    * NULL. The p-value needs the asymptotic Kolmogorov series —
    * library-dependent, not emitted; the exact D is the
    * engine-checkable part.
    */
  def ksTest(df: DataFrame, keyCol: String, sampleA: Column, x: Column)
  : DataFrame = {
    val v = df.select(col(keyCol).as("__k"), sampleA.as("__a"),
      x.as("__x"))
    val perValue = v.groupBy("__k", "__x").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("__d1"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("__d2"))
    val wc = Window.partitionBy("__k").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy("__k")
    val cum = perValue
      .withColumn("__c1", sum(col("__d1")).over(wc).cast("decimal(38,0)"))
      .withColumn("__c2", sum(col("__d2")).over(wc).cast("decimal(38,0)"))
      .withColumn("__n1", sum(col("__d1")).over(wk).cast("decimal(38,0)"))
      .withColumn("__n2", sum(col("__d2")).over(wk).cast("decimal(38,0)"))
    cum.groupBy("__k").agg(
      max(abs(col("__c1") * col("__n2") - col("__c2") * col("__n1")))
        .as("__md"),
      first(col("__n1")).as("__n1"), first(col("__n2")).as("__n2"))
      .select(col("__k").as(keyCol),
        when(col("__n1") > 0 && col("__n2") > 0,
          col("__md").cast("double") /
            (col("__n1") * col("__n2")).cast("double")).as("d_stat"),
        col("__n1").cast("long").as("n1"),
        col("__n2").cast("long").as("n2"))
  }

  /** ClickHouse `proportionsZTest`: the two-proportion pooled z
    * statistic per key — z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)) with
    * p̂ the pooled rate. The A/B-dashboard number beside welchT (means)
    * and mannWhitneyU (ranks): conversion RATES between two arms. One
    * map-side-combinable aggregate of four exact conditional counts;
    * the tail is fixed-order double arithmetic + one IEEE sqrt,
    * prounded. NULL when either arm is empty or the pooled rate is
    * degenerate (0 or 1 ⇒ zero denominator). p-values need erfc —
    * library-dependent, not emitted (the welchT convention).
    */
  def proportionsZTest(df: DataFrame, keyCol: String, armA: Column,
                       converted: Column): DataFrame = {
    import graft.functions.Rounding.pround
    val agg = df.select(col(keyCol).as("__k"), armA.cast("boolean").as("__a"),
      converted.cast("boolean").as("__y"))
      .groupBy("__k")
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__a") && col("__y"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("__a") && col("__y"), 1L).otherwise(0L)).as("c2"))
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val p2 = col("c2").cast("double") / col("n2").cast("double")
    val pp = (col("c1") + col("c2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    val den = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n1").cast("double") +
        lit(1.0) / col("n2").cast("double")))
    agg.select(col("__k").as(keyCol),
      when(col("n1") > 0 && col("n2") > 0 &&
        col("c1") + col("c2") > 0 &&
        col("c1") + col("c2") < col("n1") + col("n2"),
        pround((p1 - p2) / den, 9)).as("z_stat"),
      col("n1"), col("c1"), col("n2"), col("c2"))
  }

  /** Gini coefficient per key (sample form, ascending-rank weights):
    * G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over x sorted ascending —
    * the concentration number for "how unequal is this corpus/mix"
    * (token mass across sources, documents per dedup cluster, spend
    * per user). Tie order doesn't matter: within a tied block the xᵢ
    * are equal, so Σ i·xᵢ over the block is permutation-invariant —
    * no tie-break column needed. One rank window + one combinable
    * aggregate; Σ i·x accumulates as DECIMAL(38,0) (i·x reaches n·max,
    * past BIGINT at 100 TB key sizes). Requires non-negative x
    * (documented; negative support makes G ill-defined); a zero-sum
    * or single-row key is NULL.
    */
  def gini(df: DataFrame, keyCol: String, x: Column): DataFrame = {
    import graft.functions.Rounding.pround
    val v = df.select(col(keyCol).as("__k"), x.as("__x"))
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy("__k").orderBy("__x")
    val ranked = v.withColumn("__i", row_number().over(w))
    val s = ranked.groupBy("__k").agg(
      count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(col("__x").cast("decimal(38,0)")).as("__sx"),
      // operands cast BEFORE the multiply (the zipfFit rule): i·x
      // reaches n·max(x), past int64 long before the sum would
      sum(col("__i").cast("decimal(19,0)") *
        col("__x").cast("decimal(19,0)")).as("__six"))
    s.select(col("__k").as(keyCol),
      when(col("__n") > 1 && col("__sx") > 0,
        pround((lit(2) * col("__six") - (col("__n") + 1) * col("__sx"))
          .cast("double") /
          (col("__n") * col("__sx")).cast("double"), 9)).as("gini"),
      col("__n").cast("long").as("n"),
      col("__sx").cast("long").as("total"))
  }

  /** ClickHouse `categoricalInformationValue(cat, outcome)`: per key
    * and category value, the Weight of Evidence
    * WoE = ln((g/G)/(b/B)) and its Information-Value contribution
    * (g/G − b/B)·WoE — the credit-scoring feature-screening number
    * (IV < 0.02 useless, > 0.3 strong). Exact conditional counts
    * (one combinable (key, cat) groupBy; totals re-aggregate that
    * frame and broadcast back); the one ln is prounded at 1e-9 and
    * the IV term prounds after the exact-op multiply. A category with
    * a zero side (g = 0 or b = 0) has unbounded WoE — emitted as NULL
    * woe/iv_term rather than ±∞ (CH's unsmoothed form diverges there
    * too; callers wanting Laplace smoothing add it to the counts
    * upstream, which keeps the operator's arithmetic exact).
    */
  def informationValue(df: DataFrame, keyCol: String, category: Column,
                       outcome: Column): DataFrame = {
    import graft.functions.Rounding.pround
    val cells = df.select(col(keyCol).as("__k"), category.as("__cat"),
      outcome.cast("boolean").as("__o"))
      .groupBy("__k", "__cat")
      .agg(sum(when(col("__o"), 1L).otherwise(0L)).as("n_good"),
        sum(when(!col("__o"), 1L).otherwise(0L)).as("n_bad"))
    val totals = cells.groupBy("__k")
      .agg(sum("n_good").as("__g"), sum("n_bad").as("__b"))
    val gr = col("n_good").cast("double") / col("__g").cast("double")
    val br = col("n_bad").cast("double") / col("__b").cast("double")
    cells.join(broadcast(totals), Seq("__k"))
      .withColumn("woe",
        when(col("n_good") > 0 && col("n_bad") > 0 &&
          col("__g") > 0 && col("__b") > 0, pround(log(gr / br), 9)))
      .withColumn("iv_term", pround((gr - br) * col("woe"), 9))
      .select(col("__k").as(keyCol), col("__cat").as("category"),
        col("n_good"), col("n_bad"), col("woe"), col("iv_term"))
  }

  /** ClickHouse `theilsU(a, b)`: the uncertainty coefficient
    * U(a|b) = (H(a) − H(a|b)) / H(a) ∈ [0, 1] — how much knowing b
    * reduces uncertainty about a (asymmetric, unlike Cramér's V).
    * Built from three exact contingency counts (cell, a-marginal,
    * b-marginal — all map-side combinable off ONE (a,b) groupBy; the
    * marginals re-aggregate the |a|·|b|-sized cell frame, not the
    * corpus) under the [[entropy]] discipline: every −p·log2 p term is
    * prounded at 1e-9 BEFORE summation and accumulates as
    * DECIMAL(38,12), so the result is accumulation-order-independent
    * and engine-identical. H(a) = 0 (constant a) yields NULL — U is
    * undefined, CH returns nan. Per key; output one row per key with
    * both entropies exposed for auditability.
    */
  def theilsU(df: DataFrame, keyCol: String, a: Column, b: Column)
  : DataFrame = {
    import graft.functions.Rounding.pround
    val cells = df.select(col(keyCol).as("__k"), a.as("__a"), b.as("__b"))
      .groupBy("__k", "__a", "__b").agg(count(lit(1)).as("__c"))
    val margA = cells.groupBy("__k", "__a").agg(sum("__c").as("__ca"))
    val margB = cells.groupBy("__k", "__b").agg(sum("__c").as("__cb"))
    val totals = cells.groupBy("__k").agg(sum("__c").as("__n"))
    def entSum(d: DataFrame, c: String, n: Column, out: String) = {
      val p = col(c).cast("double") / n.cast("double")
      d.withColumn("__t", pround(-p * log2(p), 9).cast("decimal(38,12)"))
        .groupBy("__k").agg(sum(col("__t")).as(out))
    }
    // H(a): over the a-marginal.  H(a|b) = Σ_b p(b)·H(a|B=b) — equal to
    // Σ_{a,b} −p(a,b)·log2(p(a,b)/p(b)), accumulated per cell with the
    // cell's b-marginal joined in (|cells| rows, broadcastable).
    val ha = entSum(margA.join(broadcast(totals), Seq("__k")), "__ca",
      col("__n"), "__ha")
    val hab = {
      val j = cells.join(broadcast(margB), Seq("__k", "__b"))
        .join(broadcast(totals), Seq("__k"))
      val pab = col("__c").cast("double") / col("__n").cast("double")
      val pagb = col("__c").cast("double") / col("__cb").cast("double")
      j.withColumn("__t",
          pround(-pab * log2(pagb), 9).cast("decimal(38,12)"))
        .groupBy("__k").agg(sum(col("__t")).as("__hab"))
    }
    ha.join(hab, Seq("__k"))
      .select(col("__k").as(keyCol),
        when(col("__ha") > 0,
          pround((col("__ha") - col("__hab")).cast("double") /
            col("__ha").cast("double"), 9)).as("theils_u"),
        col("__ha").cast("double").as("h_a"),
        col("__hab").cast("double").as("h_a_given_b"))
  }
}
