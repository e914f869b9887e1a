package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Aggregates

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Long)*): DataFrame =
    rows.zipWithIndex
      .map { case ((u, t, e, v), i) => (u, ts(t), e, v, i.toLong) }
      .toSeq.toDF("user_id", "ts", "event_type", "value", "event_id")

  // --- retention ------------------------------------------------------

  test("retention: r1 gates the rest — a key matching c2 without c1 " +
      "reports all-false; c1 alone reports (true, false)") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "signup", 0L),
      (1L, "2024-01-02 10:00:00", "purchase", 0L),
      (2L, "2024-01-01 10:00:00", "purchase", 0L), // no signup
      (3L, "2024-01-01 10:00:00", "signup", 0L))
    val out = Aggregates.retention(df, "user_id",
      Seq(col("event_type") === "signup", col("event_type") === "purchase"))
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(out == Map(1L -> ((true, true)), 2L -> ((false, false)),
      3L -> ((true, false))))
  }

  // --- deltaSum -------------------------------------------------------

  test("deltaSum: positive deltas only, first value free, resets " +
      "ignored; single-event key sums to zero") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "m", 10L),
      (1L, "2024-01-01 10:01:00", "m", 7L),  // -3 ignored (reset)
      (1L, "2024-01-01 10:02:00", "m", 12L), // +5
      (1L, "2024-01-01 10:03:00", "m", 12L), // 0
      (1L, "2024-01-01 10:04:00", "m", 20L), // +8
      (2L, "2024-01-01 10:00:00", "m", 99L))
    val out = Aggregates.deltaSum(df, "user_id", "ts", "event_id",
      col("value")).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 13L, 2L -> 0L))
  }

  // --- sumMap / groupUniqArray / uniqUpTo -----------------------------

  test("sumMap: parallel arrays sorted by map key, per-key sums") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "view", 3L),
      (1L, "2024-01-01 11:00:00", "click", 2L),
      (1L, "2024-01-01 12:00:00", "view", 4L),
      (2L, "2024-01-01 10:00:00", "click", 5L))
    val out = Aggregates.sumMap(df, "user_id", col("event_type"),
      col("value"))
      .as[(Long, Seq[String], Seq[Long])].collect()
      .map { case (k, ks, vs) => k -> ((ks, vs)) }.toMap
    assert(out == Map(
      1L -> ((Seq("click", "view"), Seq(2L, 7L))),
      2L -> ((Seq("click"), Seq(5L)))))
  }

  test("minMaxMap: per-map-key min and max in parallel key-sorted " +
      "arrays") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "view", 3L),
      (1L, "2024-01-01 11:00:00", "click", 2L),
      (1L, "2024-01-01 12:00:00", "view", 9L))
    val out = Aggregates.minMaxMap(df, "user_id", col("event_type"),
      col("value"))
      .as[(Long, Seq[String], Seq[Long], Seq[Long])].collect()
      .map { case (k, ks, mn, mx) => k -> ((ks, mn, mx)) }.toMap
    assert(out == Map(
      1L -> ((Seq("click", "view"), Seq(2L, 3L), Seq(2L, 9L)))))
  }

  test("avgWeighted: Σwv/Σw exact; zero total weight yields NULL") {
    val df = Seq((1L, 10L, 3L), (1L, 20L, 1L), (2L, 5L, 0L))
      .toDF("k", "v", "w")
    val out = Aggregates.avgWeighted(df, "k", col("v"), col("w"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(12.5), 2L -> None)) // (30+20)/4
  }

  test("linearFit: exact fit on a perfect line (slope 2, intercept 1, " +
      "corr 1); constant x degenerates to NULLs") {
    val df = Seq((1L, 0L, 1L), (1L, 1L, 3L), (1L, 2L, 5L),
      (2L, 4L, 7L), (2L, 4L, 9L)).toDF("k", "x", "y")
    val out = Aggregates.linearFit(df, "k", col("x"), col("y"))
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map { case (k, s, i, c) => k -> ((s, i, c)) }.toMap
    assert(out(1L) == ((Some(2.0), Some(1.0), Some(1.0))))
    assert(out(2L) == ((None, None, None)))
  }

  test("groupUniqArray: duplicates collapse, sorted; maxSize keeps the " +
      "smallest distinct values") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "a", 30L),
      (1L, "2024-01-01 11:00:00", "a", 10L),
      (1L, "2024-01-01 12:00:00", "a", 30L),
      (1L, "2024-01-01 13:00:00", "a", 20L))
    val all = Aggregates.groupUniqArray(df, "user_id", col("value"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(all == Map(1L -> Seq(10L, 20L, 30L)))
    val capped = Aggregates.groupUniqArray(df, "user_id", col("value"),
      Some(2)).as[(Long, Seq[Long])].collect().toMap
    assert(capped == Map(1L -> Seq(10L, 20L)))
  }

  test("uniqUpTo: exact at or below N, N+1 sentinel above") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "a", 1L),
      (1L, "2024-01-01 11:00:00", "a", 2L),
      (2L, "2024-01-01 10:00:00", "a", 1L),
      (2L, "2024-01-01 11:00:00", "a", 2L),
      (2L, "2024-01-01 12:00:00", "a", 3L),
      (2L, "2024-01-01 13:00:00", "a", 4L))
    val out = Aggregates.uniqUpTo(df, "user_id", col("value"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 4L)) // 4 distinct > 3 → sentinel 4
  }

  // --- argMinMax ------------------------------------------------------

  test("argMinMax: picks arg at extreme ord; equal ords break ties on " +
      "the tie column (max takes largest, min smallest)") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "u10", 5L), // event_id 0
      (1L, "2024-01-01 11:00:00", "u20", 9L), // event_id 1
      (1L, "2024-01-01 12:00:00", "u30", 9L), // event_id 2: tie on 9
      (1L, "2024-01-01 13:00:00", "u40", 5L)) // event_id 3: tie on 5
    val out = Aggregates.argMinMax(df, "user_id", col("event_type"),
      col("value"), "event_id")
      .as[(Long, String, String)].collect()
      .map { case (k, mx, mn) => k -> ((mx, mn)) }.toMap
    assert(out == Map(1L -> (("u30", "u10"))))
  }

  test("argMinMax: NULL-ord rows are skipped (CH semantics) — they " +
      "neither win min nor max; an all-NULL key yields NULL args") {
    val df = Seq(
      (1L, Some(5L), "u10", 0L), (1L, None, "uNN", 1L),
      (1L, Some(9L), "u20", 2L),
      (2L, Option.empty[Long], "uX", 3L), (2L, None, "uY", 4L))
      .toDF("user_id", "value", "event_type", "event_id")
    val out = Aggregates.argMinMax(df, "user_id", col("event_type"),
      col("value"), "event_id")
      .as[(Long, Option[String], Option[String])].collect()
      .map { case (k, mx, mn) => k -> ((mx, mn)) }.toMap
    // without the NULL guard, min(struct) would return "uNN" for arg_min
    assert(out == Map(1L -> ((Some("u20"), Some("u10"))),
      2L -> ((None, None))))
  }

  // --- interval sweeps ------------------------------------------------

  private def intervals(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "s", "e")

  test("intervalLengthSum: overlaps count once, nested absorbed, " +
      "touching intervals concatenate, zero/negative length ignored") {
    val df = intervals(
      (1L, 0L, 10L), (1L, 5L, 15L),   // union [0,15) = 15
      (1L, 20L, 30L), (1L, 22L, 25L), // nested: +10
      (1L, 30L, 35L),                 // touching: +5
      (1L, 40L, 40L),                 // zero length
      (2L, 7L, 3L))                   // negative: clamps to 0
    val out = Aggregates.intervalLengthSum(df, "k", col("s"), col("e"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 30L, 2L -> 0L))
  }

  test("maxIntersections: half-open [s,e) — an interval ending where " +
      "another starts does not overlap it; nested stack counts") {
    val df = intervals(
      (1L, 0L, 10L), (1L, 10L, 20L),          // touching: max 1
      (2L, 0L, 30L), (2L, 5L, 25L), (2L, 10L, 20L), // nested: 3
      (3L, 0L, 0L))                            // zero-length only: dropped
    val out = Aggregates.maxIntersections(df, "k", col("s"), col("e"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 3L)) // key 3 has no real interval
  }

  // --- movingSum ------------------------------------------------------

  test("movingSum: W=3 sliding sums in time order, short prefix uses " +
      "what exists") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "m", 1L),
      (1L, "2024-01-01 11:00:00", "m", 2L),
      (1L, "2024-01-01 12:00:00", "m", 3L),
      (1L, "2024-01-01 13:00:00", "m", 4L))
    val out = Aggregates.movingSum(df, "user_id", "ts", "event_id",
      col("value"), 3).as[(Long, Seq[Long])].collect().toMap
    assert(out == Map(1L -> Seq(1L, 3L, 6L, 9L)))
  }

  test("entropy: uniform 4-symbol distribution scores exactly 2 bits, " +
      "a single-symbol key exactly 0") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), (2L, "a"),
      (2L, "a")).toDF("k", "v")
    val out = Aggregates.entropy(df, "k", col("v"))
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 2.0, 2L -> 0.0))
  }

  test("moments: symmetric two-point distribution has skew 0 and " +
      "kurt 1; constant input degenerates to NULL skew/kurt, stddev 0") {
    val df = Seq((1L, 0L), (1L, 0L), (1L, 10L), (1L, 10L),
      (2L, 7L), (2L, 7L)).toDF("k", "x")
    val out = Aggregates.moments(df, "k", col("x"))
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map { case (k, s, sk, ku) => k -> ((s, sk, ku)) }.toMap
    assert(out(1L) == ((Some(5.0), Some(0.0), Some(1.0))))
    assert(out(2L) == ((Some(0.0), None, None)))
  }

  test("moments: catastrophic cancellation (constant 12345678.9 × 7 " +
      "gives m2 = -0.03125 in double) clamps stddev to 0, not NaN") {
    // one partition so the double summation order is deterministic
    val df = Seq.fill(7)((1L, 12345678.9)).toDF("k", "x").repartition(1)
    val out = Aggregates.moments(df, "k", col("x"))
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(out._2.contains(0.0),
      s"stddev_pop must clamp negative m2 to 0, got ${out._2}")
  }

  test("histogram: equal-width bins cover [min, max], the max value " +
      "lands in the last bin, a constant key collapses to bin 0") {
    val df = (0 to 7).map(i => (1L, i.toDouble)).toDF("k", "v")
      .union(Seq((2L, 5.0), (2L, 5.0)).toDF("k", "v"))
    val out = Aggregates.histogram(df, "k", col("v"), 4)
      .as[(Long, Long, Double, Double, Long)].collect()
      .map { case (k, b, lo, hi, c) => (k, b) -> ((lo, hi, c)) }.toMap
    assert(out((1L, 0L)) == ((0.0, 1.75, 2L)))   // 0, 1
    assert(out((1L, 3L)) == ((5.25, 7.0, 2L)))   // 6, 7 (max in last bin)
    assert(out.keys.count(_._1 == 1L) == 4)
    assert(out((2L, 0L)) == ((5.0, 5.0, 2L)))    // constant key
  }

  test("runningDifference: 0 on the first row, signed lag deltas " +
      "after; movingAvg divides by the FIXED window even on the " +
      "short prefix") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "m", 10L),
      (1L, "2024-01-01 11:00:00", "m", 7L),
      (1L, "2024-01-01 12:00:00", "m", 13L))
    val diffs = Aggregates.runningDifference(df, "user_id", "ts",
      "event_id", col("value"))
      .select($"event_id", $"running_diff").as[(Long, Long)]
      .collect().toMap
    assert(diffs == Map(0L -> 0L, 1L -> -3L, 2L -> 6L))
    val avgs = Aggregates.movingAvg(df, "user_id", "ts", "event_id",
      col("value"), 3).as[(Long, Seq[Double])].collect().toMap
    // sums 10, 17, 30 over the FIXED divisor 3
    assert(avgs(1L).map(x => math.round(x * 1e6) / 1e6.toDouble) ==
      Seq(3.333333, 5.666667, 10.0))
  }

  // --- sequenceNextNode ----------------------------------------------

  private def next(df: DataFrame): Map[Long, Option[String]] =
    Aggregates.sequenceNextNode(df, "user_id", "ts", "event_id",
      col("event_type"),
      Seq(col("event_type") === "view", col("event_type") === "click"))
      .as[(Long, Option[String])].collect().toMap

  test("sequenceNextNode: returns the event right after the EARLIEST " +
      "consecutive view→click run; an intervening event breaks the run") {
    val df = events(
      // user 1: view, click, purchase → 'purchase'
      (1L, "2024-01-01 10:00:00", "view", 0L),
      (1L, "2024-01-01 11:00:00", "click", 0L),
      (1L, "2024-01-01 12:00:00", "purchase", 0L),
      // later second match must not win
      (1L, "2024-01-01 13:00:00", "view", 0L),
      (1L, "2024-01-01 14:00:00", "click", 0L),
      (1L, "2024-01-01 15:00:00", "error", 0L),
      // user 2: view, ERROR, click — not consecutive → no match
      (2L, "2024-01-01 10:00:00", "view", 0L),
      (2L, "2024-01-01 11:00:00", "error", 0L),
      (2L, "2024-01-01 12:00:00", "click", 0L))
    assert(next(df) == Map(1L -> Some("purchase"), 2L -> None))
  }

  test("sequenceNextNode: a match ending the stream yields NULL next " +
      "node (matched, nothing follows)") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "view", 0L),
      (1L, "2024-01-01 11:00:00", "click", 0L))
    assert(next(df) == Map(1L -> None))
  }

  test("sequenceNextNode backward/last_match: backward scans " +
      "newest→oldest (next = the still-older event); last_match takes " +
      "the latest run") {
    val df = events(
      (1L, "2024-01-01 09:00:00", "error", 0L),
      (1L, "2024-01-01 10:00:00", "click", 0L),
      (1L, "2024-01-01 11:00:00", "view", 0L),
      (1L, "2024-01-01 12:00:00", "purchase", 0L))
    // backward: purchase, view, click, error — run (view, click) at
    // scan pos 2..3, next = error
    val back = Aggregates.sequenceNextNode(df, "user_id", "ts",
      "event_id", col("event_type"),
      Seq(col("event_type") === "view", col("event_type") === "click"),
      forward = false)
      .as[(Long, Option[String])].collect().toMap
    assert(back == Map(1L -> Some("error")))
    // forward last_match: two view→click runs, the LATER one's next wins
    val two = events(
      (1L, "2024-01-01 10:00:00", "view", 0L),
      (1L, "2024-01-01 11:00:00", "click", 0L),
      (1L, "2024-01-01 12:00:00", "purchase", 0L),
      (1L, "2024-01-01 13:00:00", "view", 0L),
      (1L, "2024-01-01 14:00:00", "click", 0L),
      (1L, "2024-01-01 15:00:00", "error", 0L))
    val last = Aggregates.sequenceNextNode(two, "user_id", "ts",
      "event_id", col("event_type"),
      Seq(col("event_type") === "view", col("event_type") === "click"),
      firstMatch = false)
      .as[(Long, Option[String])].collect().toMap
    assert(last == Map(1L -> Some("error")))
  }

  test("boundingRatio: slope between the extreme-x points; constant x " +
      "is NULL") {
    val df = Seq((1L, 0L, 1L, 10L), (1L, 2L, 7L, 11L), (1L, 1L, 99L, 12L),
      (2L, 5L, 3L, 13L), (2L, 5L, 9L, 14L)).toDF("k", "x", "y", "tie")
    val out = Aggregates.boundingRatio(df, "k", col("x"), col("y"), "tie")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(3.0), 2L -> None))
  }

  test("categoricalAssociation: identical columns score V = 1, " +
      "independent uniform columns score chi2 = 0 and V = 0") {
    val dep = Seq((1L, "a", "a"), (1L, "a", "a"), (1L, "b", "b"),
      (1L, "b", "b")).toDF("k", "a", "b")
    val d = Aggregates.categoricalAssociation(dep, "k", col("a"), col("b"))
      .as[(Long, Double, Option[Double], Double)].collect().head
    assert(d._3.contains(1.0) && d._2 == 4.0)
    val ind = Seq((1L, "a", "x"), (1L, "a", "y"), (1L, "b", "x"),
      (1L, "b", "y")).toDF("k", "a", "b")
    val i = Aggregates.categoricalAssociation(ind, "k", col("a"), col("b"))
      .as[(Long, Double, Option[Double], Double)].collect().head
    assert(i._2 == 0.0 && i._3.contains(0.0) && i._4 == 0.0)
  }

  // --- statistical tests ----------------------------------------------

  test("welchT: hand-computed two-sample case matches the closed form; " +
      "degenerate cells (n<2 or both constant) are NULL") {
    val df = Seq((1L, true, 1L), (1L, true, 2L), (1L, true, 3L),
      (1L, false, 2L), (1L, false, 4L), (1L, false, 6L), (1L, false, 8L),
      (2L, true, 5L), (2L, false, 3L), (2L, false, 4L), // n1 = 1
      (3L, true, 7L), (3L, true, 7L), (3L, false, 7L), (3L, false, 7L))
      .toDF("k", "a", "x")
    val out = Aggregates.welchT(df, "k", col("a"), col("x"))
      .as[(Long, Option[Double], Option[Double])]
      .collect().map { case (k, t, d) => k -> ((t, d)) }.toMap
    // A = [1,2,3]: m 2, v 1; B = [2,4,6,8]: m 5, v 20/3
    val t = (2.0 - 5.0) / math.sqrt(1.0 / 3 + (20.0 / 3) / 4)
    assert(math.abs(out(1L)._1.get - t) < 1e-6)
    val se1 = 1.0 / 3; val se2 = (20.0 / 3) / 4
    val dfW = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / 2 + se2 * se2 / 3)
    assert(math.abs(out(1L)._2.get - dfW) < 1e-6)
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((None, None)))
  }

  test("welchT: NULL x rows don't deflate n — key 1's statistic is " +
      "identical with NULL-x padding rows added") {
    val base = Seq((1L, true, Some(1L)), (1L, true, Some(2L)),
      (1L, true, Some(3L)), (1L, false, Some(2L)), (1L, false, Some(4L)),
      (1L, false, Some(6L)), (1L, false, Some(8L)))
    val padded = base ++ Seq((1L, true, Option.empty[Long]),
      (1L, false, None), (1L, false, None))
    def run(rows: Seq[(Long, Boolean, Option[Long])]) =
      Aggregates.welchT(rows.toDF("k", "a", "x"), "k", col("a"), col("x"))
        .as[(Long, Option[Double], Option[Double])].head()
    assert(run(base) == run(padded))
  }

  test("mannWhitneyU: exact U with average tie ranks; empty sample " +
      "is NULL") {
    val df = Seq((1L, true, 1L), (1L, true, 2L), (1L, false, 3L),
      (1L, false, 4L),                             // clean: U = 0
      (2L, true, 1L), (2L, true, 1L), (2L, false, 1L), (2L, false, 2L),
      (3L, false, 9L))                             // n1 = 0
      .toDF("k", "a", "x")
    val out = Aggregates.mannWhitneyU(df, "k", col("a"), col("x"))
      .as[(Long, Option[Double], Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((Some(0.0), 2L, 2L)))
    // ties: three 1s share avg rank 2 → R1 = 4, U1 = 1, U2 = 3
    assert(out(2L) == ((Some(1.0), 2L, 2L)))
    assert(out(3L) == ((None, 0L, 1L)))
  }

  test("rankCorr: perfect monotone ±1, ties use average ranks, " +
      "constant column is NULL") {
    val df = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),   // ρ = 1
      (2L, 1L, 30L), (2L, 2L, 20L), (2L, 3L, 10L),   // ρ = -1
      // ties on y: x = (1,2,3,4), y = (5,5,8,9) → avg ranks
      // a = (1,2,3,4), b = (1.5,1.5,3,4) → ρ = 0.948683298...
      (3L, 1L, 5L), (3L, 2L, 5L), (3L, 3L, 8L), (3L, 4L, 9L),
      (4L, 1L, 7L), (4L, 2L, 7L), (4L, 3L, 7L))      // constant y
      .toDF("k", "x", "y")
    val out = Aggregates.rankCorr(df, "k", col("x"), col("y"))
      .as[(Long, Option[Double], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(1.0), 3L)))
    assert(out(2L) == ((Some(-1.0), 3L)))
    assert(math.abs(out(3L)._1.get - 0.948683298) < 1e-9)
    assert(out(4L) == ((None, 3L)))
  }

  test("ksTest: identical samples D = 0, disjoint samples D = 1, " +
      "interleaved exact sup, empty sample NULL") {
    val df = Seq(
      (1L, true, 1L), (1L, true, 2L), (1L, false, 1L), (1L, false, 2L),
      (2L, true, 1L), (2L, true, 2L), (2L, false, 5L), (2L, false, 6L),
      // A = {1,3}, B = {2,4}: ECDF gap peaks at 1/2 after x=1 and x=3
      (3L, true, 1L), (3L, true, 3L), (3L, false, 2L), (3L, false, 4L),
      (4L, true, 1L))
      .toDF("k", "a", "x")
    val out = Aggregates.ksTest(df, "k", col("a"), col("x"))
      .as[(Long, Option[Double], Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((Some(0.0), 2L, 2L)))
    assert(out(2L) == ((Some(1.0), 2L, 2L)))
    assert(out(3L) == ((Some(0.5), 2L, 2L)))
    assert(out(4L) == ((None, 1L, 0L)))
  }

  test("proportionsZTest: equal rates z = 0, known hand case, " +
      "degenerate pools and empty arms are NULL") {
    val df = Seq(
      // key 1: arm A 2/4 converts, arm B 1/4 → p̂ = 3/8
      (1L, true, true), (1L, true, true), (1L, true, false),
      (1L, true, false),
      (1L, false, true), (1L, false, false), (1L, false, false),
      (1L, false, false),
      // key 2: identical rates → z = 0
      (2L, true, true), (2L, true, false),
      (2L, false, true), (2L, false, false),
      // key 3: nobody converts → denominator 0 → NULL
      (3L, true, false), (3L, false, false),
      // key 4: arm B empty → NULL
      (4L, true, true))
      .toDF("k", "a", "y")
    val out = Aggregates.proportionsZTest(df, "k", col("a"), col("y"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val pp = 3.0 / 8
    val expect = (0.5 - 0.25) /
      math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(out(1L)._1.get - expect) < 1e-8)
    assert(out(1L)._2 == 4L && out(1L)._3 == 2L && out(1L)._5 == 1L)
    assert(out(2L)._1.contains(0.0))
    assert(out(3L)._1.isEmpty && out(4L)._1.isEmpty)
  }

  test("gini: uniform mass → ~0, one-holder concentration → (n-1)/n, " +
      "tie order doesn't matter, degenerate keys NULL") {
    val df = Seq(
      (1L, 10L), (1L, 10L), (1L, 10L), (1L, 10L),        // uniform → 0
      (2L, 0L), (2L, 0L), (2L, 0L), (2L, 100L),          // all mass on 1
      (3L, 5L),                                          // single row
      (4L, 0L), (4L, 0L))                                // zero sum
      .toDF("k", "x")
    val out = Aggregates.gini(df, "k", col("x"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2),
          r.getLong(3)))).toMap
    assert(out(1L)._1.contains(0.0) && out(1L)._2 == 4L &&
      out(1L)._3 == 40L)
    // max concentration with n = 4: G = (n-1)/n = 0.75
    assert(out(2L)._1.contains(0.75))
    assert(out(3L)._1.isEmpty && out(4L)._1.isEmpty)
  }

  test("informationValue: hand-computed WoE/IV, independent category " +
      "scores 0, zero-sided category is NULL not ±inf") {
    val df = Seq(
      // key 1: cat "x": 3 good, 1 bad; cat "y": 1 good, 3 bad
      // G = 4, B = 4 → WoE(x) = ln((3/4)/(1/4)) = ln 3
      (1L, "x", true), (1L, "x", true), (1L, "x", true), (1L, "x", false),
      (1L, "y", true), (1L, "y", false), (1L, "y", false), (1L, "y", false),
      // key 2: outcome independent of cat → WoE = ln 1 = 0
      (2L, "x", true), (2L, "x", false), (2L, "y", true), (2L, "y", false),
      // key 3: cat "z" has zero bads → NULL, no ±inf
      (3L, "z", true), (3L, "z", true), (3L, "w", true), (3L, "w", false))
      .toDF("k", "cat", "o")
    val out = Aggregates.informationValue(df, "k", col("cat"), col("o"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    val (g, b, woe, iv) = ((x: (Long, Long, Option[Double], Option[Double])) => x)(out((1L, "x")))
    assert(g == 3L && b == 1L)
    assert(math.abs(woe.get - math.log(3.0)) < 1e-8)
    // iv term = (3/4 - 1/4) * ln 3 = 0.5 ln 3
    assert(math.abs(iv.get - 0.5 * math.log(3.0)) < 1e-8)
    // symmetric category mirrors with negative WoE
    assert(math.abs(out((1L, "y"))._3.get + math.log(3.0)) < 1e-8)
    // independence → exactly 0 (ln 1 prounds to 0)
    assert(out((2L, "x"))._3.contains(0.0) && out((2L, "x"))._4.contains(0.0))
    // zero-sided: NULL woe and iv
    assert(out((3L, "z"))._3.isEmpty && out((3L, "z"))._4.isEmpty)
    assert(out((3L, "w"))._3.isDefined)
  }

  test("theilsU: b determines a → U = 1; independent b → U = 0; " +
      "constant a → NULL (H(a) = 0); asymmetric by construction") {
    val df = Seq(
      // b fully determines a (a = b): H(a|b) = 0
      (1L, "x", 1L), (1L, "x", 1L), (1L, "y", 2L), (1L, "y", 2L),
      // a ⟂ b: every (a,b) cell equal count
      (2L, "x", 1L), (2L, "x", 2L), (2L, "y", 1L), (2L, "y", 2L),
      // constant a
      (3L, "x", 1L), (3L, "x", 2L))
      .toDF("k", "a", "b")
    val out = Aggregates.theilsU(df, "k", col("a"), col("b"))
      .as[(Long, Option[Double], Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1.contains(1.0) && out(1L)._2 == 1.0 &&
      out(1L)._3 == 0.0)
    assert(out(2L)._1.contains(0.0))
    assert(out(3L)._1.isEmpty)
    // asymmetry: a has 2 levels, b has 4 → knowing a can't pin b
    val asym = Seq(
      (1L, "x", 1L), (1L, "x", 2L), (1L, "y", 3L), (1L, "y", 4L))
      .toDF("k", "a", "b")
    val uab = Aggregates.theilsU(asym, "k", col("a"), col("b"))
      .as[(Long, Option[Double], Double, Double)].head()._2.get
    val uba = Aggregates.theilsU(asym, "k", col("b"), col("a"))
      .as[(Long, Option[Double], Double, Double)].head()._2.get
    assert(uab == 1.0)            // b pins a exactly
    assert(math.abs(uba - 0.5) < 1e-9) // a halves b's 2 bits to 1
  }
}
