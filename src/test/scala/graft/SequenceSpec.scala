package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.operators.{Profile, Sequence}

class SequenceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*) =
    rows.zipWithIndex
      .map { case ((u, t, e), i) => (u, ts(t), e, i.toLong) }
      .toSeq.toDF("user_id", "ts", "event_type", "event_id")

  private def spanning(df: org.apache.spark.sql.DataFrame,
                       conds: Seq[String]): Map[Long, Boolean] =
    Sequence.matchSpanning(df, "user_id", "ts",
      conds.map(col("event_type") === _))
      .as[(Long, Boolean)].collect().toMap

  private def pairs(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Boolean)] =
    Sequence.countAdjacentPairs(df, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  // --- matchSpanning --------------------------------------------------

  test("spanning: in-order chain matches regardless of gaps between " +
      "steps; missing middle step does not") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-03-01 10:00:00", "view"), // months later: no window bound
      (1L, "2024-06-01 10:00:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "signup"),
      (2L, "2024-01-01 11:00:00", "purchase")) // no view in between
    assert(spanning(df, Seq("signup", "view", "purchase")) ==
      Map(1L -> true, 2L -> false))
  }

  test("spanning: order matters — steps present but reversed do not " +
      "match, and equal timestamps do not chain (strict increase)") {
    val reversed = events(
      (1L, "2024-01-01 10:00:00", "purchase"),
      (1L, "2024-01-01 11:00:00", "view"),
      (1L, "2024-01-01 12:00:00", "signup"))
    assert(spanning(reversed, Seq("signup", "view", "purchase")) ==
      Map(1L -> false))
    val equalTs = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "purchase"))
    assert(spanning(equalTs, Seq("signup", "view", "purchase")) ==
      Map(1L -> false))
  }

  test("spanning: keys without a first-condition event are absent; an " +
      "early dead-end start does not shadow a later complete one") {
    val df = events(
      // user 1: first signup never completes, second does — the walk
      // tries every start
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-02 10:00:00", "signup"),
      (1L, "2024-01-03 10:00:00", "view"),
      (1L, "2024-01-04 10:00:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "view"), // no signup: absent
      (2L, "2024-01-01 11:00:00", "purchase"))
    assert(spanning(df, Seq("signup", "view", "purchase")) ==
      Map(1L -> true))
  }

  // --- matchTimed -----------------------------------------------------

  private def timed(df: org.apache.spark.sql.DataFrame,
                    conds: Seq[String],
                    gaps: Seq[Option[Long]]): Map[Long, Boolean] =
    Sequence.matchTimed(df, "user_id", "ts",
      conds.map(col("event_type") === _), gaps)
      .as[(Long, Boolean)].collect().toMap

  test("timed: a gap exactly at the bound matches ((?t<=N) is " +
      "inclusive); one second over does not") {
    val exact = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 11:00:00", "view"),      // gap = 3600 s exactly
      (1L, "2024-01-01 11:30:00", "purchase"))
    assert(timed(exact, Seq("signup", "view", "purchase"),
      Seq(Some(3600L), Some(3600L))) == Map(1L -> true))
    val over = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 11:00:01", "view"),      // gap = 3601 s
      (1L, "2024-01-01 11:30:00", "purchase"))
    assert(timed(over, Seq("signup", "view", "purchase"),
      Seq(Some(3600L), Some(3600L))) == Map(1L -> false))
  }

  test("timed: None gaps behave as .* (any distance) and mix with " +
      "bounded gaps") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-03-01 10:00:00", "view"),       // months later: unbounded
      (1L, "2024-03-01 10:05:00", "purchase"))   // 5 min: inside 600 s
    assert(timed(df, Seq("signup", "view", "purchase"),
      Seq(None, Some(600L))) == Map(1L -> true))
    assert(timed(df, Seq("signup", "view", "purchase"),
      Seq(Some(600L), None)) == Map(1L -> false))
  }

  test("timed: reachability beats greedy — the earliest middle event " +
      "overstretches the next gap where a later one fits") {
    // greedy would take view@10:01 and fail purchase's 10-min bound;
    // the valid chain goes through view@14:55
    val df = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:01:00", "view"),
      (1L, "2024-01-01 14:55:00", "view"),
      (1L, "2024-01-01 15:00:00", "purchase"))
    assert(timed(df, Seq("signup", "view", "purchase"),
      Seq(Some(6L * 3600L), Some(600L))) == Map(1L -> true))
  }

  test("timed: strict increase at ties; keys without a first-condition " +
      "event are absent, unmatched keys report false") {
    val tie = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 10:00:00", "view"),      // same instant: no chain
      (1L, "2024-01-01 10:30:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "view"),      // no signup: absent
      (3L, "2024-01-01 10:00:00", "signup"))    // signup only: false
    assert(timed(tie, Seq("signup", "view", "purchase"),
      Seq(Some(3600L), Some(3600L))) == Map(1L -> false, 3L -> false))
  }

  test("timed: guards — short cond list, wrong gap arity, non-positive " +
      "bound all fail loudly") {
    val df = events((1L, "2024-01-01 10:00:00", "signup"))
    intercept[IllegalArgumentException] {
      Sequence.matchTimed(df, "user_id", "ts",
        Seq(col("event_type") === "signup"), Nil)
    }
    intercept[IllegalArgumentException] {
      Sequence.matchTimed(df, "user_id", "ts",
        Seq(col("event_type") === "signup", col("event_type") === "view"),
        Seq(Some(10L), Some(10L)))
    }
    intercept[IllegalArgumentException] {
      Sequence.matchTimed(df, "user_id", "ts",
        Seq(col("event_type") === "signup", col("event_type") === "view"),
        Seq(Some(0L)))
    }
  }

  // --- countAdjacentPairs ---------------------------------------------

  test("adjacency is over the condition-filtered subsequence: " +
      "non-matching events between view and click are skipped") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "error"), // skipped, ClickHouse rule
      (1L, "2024-01-01 10:02:00", "signup"), // skipped
      (1L, "2024-01-01 10:03:00", "click"))
    assert(pairs(df) == Map(1L -> ((1L, true))))
  }

  test("a matching event BETWEEN breaks adjacency: view,view,click " +
      "counts one pair; view,click,view,click counts two") {
    val vvc = events(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "view"),
      (1L, "2024-01-01 10:02:00", "click"))
    assert(pairs(vvc) == Map(1L -> ((1L, true))))
    val vcvc = events(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "click"),
      (1L, "2024-01-01 10:02:00", "view"),
      (1L, "2024-01-01 10:03:00", "click"))
    assert(pairs(vcvc) == Map(1L -> ((2L, true))))
  }

  test("click before any view counts zero but the key is present " +
      "(it has matching events); equal timestamps order by the tie " +
      "column") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"), // same ts: event_id orders
      (2L, "2024-01-01 10:00:00", "click"))
    assert(pairs(df) == Map(1L -> ((0L, false)), 2L -> ((1L, true))))
  }

  // --- hllEstimate ----------------------------------------------------

  test("HLL estimate: exact below the linear-counting floor, within " +
      "~3σ of truth at 2k distinct, and insensitive to duplication") {
    val small = (1 to 40).map(i => ("a", i)).toDF("g", "v")
    val sm = Profile.hllEstimate(small, "g", col("v"))
      .select("n_exact", "hll_est").as[(Long, Double)].head()
    assert(sm._1 == 40L)
    // linear counting at 40 of 256 registers is near-exact
    assert(math.abs(sm._2 - 40.0) <= 3.0, s"lc estimate ${sm._2}")

    val big = (1 to 2000).flatMap(i => Seq(("b", i), ("b", i)))
      .toDF("g", "v") // every value twice: distinct must collapse
    val bg = Profile.hllEstimate(big, "g", col("v"))
      .select("n_exact", "hll_est", "rel_err")
      .as[(Long, Double, Double)].head()
    assert(bg._1 == 2000L)
    // σ ≈ 1.04/√256 = 6.5%; 3σ ≈ 19.5%
    assert(bg._3 <= 0.195, s"rel_err ${bg._3} (est ${bg._2})")
  }

  test("HLL overlap matrix: identical sets overlap at their own " +
      "estimate, near-disjoint sets near zero (clamped), and the " +
      "group-count guard trips loudly") {
    val same = ((1 to 1000).map(i => ("a", i)) ++
      (1 to 1000).map(i => ("b", i))).toDF("g", "v")
    val sm = Profile.hllOverlapMatrix(same, "g", col("v"))
      .select("est_a", "est_b", "est_union", "overlap_est")
      .as[(Double, Double, Double, Double)].head()
    // A = B → identical registers → union = each → overlap = est
    assert(sm._1 == sm._2 && sm._2 == sm._3 && sm._4 == sm._1)
    val disjoint = ((1 to 1000).map(i => ("a", i)) ++
      (2001 to 3000).map(i => ("b", i))).toDF("g", "v")
    val dj = Profile.hllOverlapMatrix(disjoint, "g", col("v"))
      .select("overlap_est").as[Double].head()
    // true overlap 0; sketch noise is O(σ·n) — clamp keeps it ≥ 0
    assert(dj >= 0.0 && dj < 400.0, s"disjoint overlap $dj")
    val many = (1 to 40).map(i => (s"g$i", i)).toDF("g", "v")
    val ex = intercept[IllegalStateException] {
      Profile.hllOverlapMatrix(many, "g", col("v"), maxGroups = 10)
    }
    assert(ex.getMessage.contains("pair matrix"), ex.getMessage)
  }

  test("HLL registers merge by MAX: the union's estimate equals the " +
      "register-wise max of the halves' sketches (mergeable-state " +
      "contract)") {
    // Identical estimate when built from the union vs from
    // overlapping halves — groupBy(bucket).max(rho) over a union is
    // register-wise max by construction; this pins the value-level
    // consequence: duplication across batches cannot move the sketch.
    val h1 = (1 to 1200).map(i => ("g", i))
    val h2 = (800 to 2000).map(i => ("g", i))
    val union = Profile.hllEstimate((h1 ++ h2).toDF("g", "v"), "g", col("v"))
      .select("hll_est").as[Double].head()
    val direct = Profile.hllEstimate(
      (1 to 2000).map(i => ("g", i)).toDF("g", "v"), "g", col("v"))
      .select("hll_est").as[Double].head()
    assert(union == direct)
  }

  test("k-ary adjacent runs: consecutive in the FILTERED subsequence — " +
      "a non-matching event between steps does not break the run, a " +
      "condition-matching one does") {
    def runs(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
      Sequence.countAdjacentRuns(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"))
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val df = events(
      // user 1: view, ERROR(skipped), click, purchase → 1 run
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:10:00", "error"),
      (1L, "2024-01-01 10:20:00", "click"),
      (1L, "2024-01-01 10:30:00", "purchase"),
      // user 2: view, PURCHASE (matches a condition → breaks), click,
      // purchase → 0 runs
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:10:00", "purchase"),
      (2L, "2024-01-01 10:20:00", "click"),
      (2L, "2024-01-01 10:30:00", "purchase"),
      // user 3: two complete disjoint runs → 2
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 10:10:00", "click"),
      (3L, "2024-01-01 10:20:00", "purchase"),
      (3L, "2024-01-01 11:00:00", "view"),
      (3L, "2024-01-01 11:10:00", "click"),
      (3L, "2024-01-01 11:20:00", "purchase"))
    assert(runs(df) == Map(1L -> ((1L, true)), 2L -> ((0L, false)),
      3L -> ((2L, true))))
  }

  // --- (?t op N) full grammar ----------------------------------------

  private def bounds(df: org.apache.spark.sql.DataFrame,
                     conds: Seq[String],
                     gs: Seq[Option[Sequence.TimeBound]])
      : Map[Long, Boolean] =
    Sequence.matchTimedBounds(df, "user_id", "ts",
      conds.map(col("event_type") === _), gs)
      .as[(Long, Boolean)].collect().toMap

  test("min-gap bounds: decided by the EARLIEST valid predecessor — " +
      "a key whose latest middle event is too recent still matches " +
      "through the earlier one") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 11:00:00", "view"),   // 11 h before purchase
      (1L, "2024-01-01 20:00:00", "view"),   // 2 h before: too recent
      (1L, "2024-01-01 22:00:00", "purchase"))
    assert(bounds(df, Seq("signup", "view", "purchase"),
      Seq(Some(Sequence.TimeBound("<=", 43200L)),
        Some(Sequence.TimeBound(">=", 3L * 3600L)))) == Map(1L -> true))
    // tighten the min gap past the earliest view: no chain
    assert(bounds(df, Seq("signup", "view", "purchase"),
      Seq(Some(Sequence.TimeBound("<=", 43200L)),
        Some(Sequence.TimeBound(">=", 12L * 3600L)))) == Map(1L -> false))
  }

  test("(?t>=N) is inclusive at the exact bound, (?t>N) is strict; " +
      "(?t<N) excludes the exact bound") {
    val df = events(
      (1L, "2024-01-01 10:00:00", "signup"),
      (1L, "2024-01-01 11:00:00", "view"),      // gap 1 h exactly
      (1L, "2024-01-01 12:00:00", "purchase"))  // gap 1 h exactly
    def g(op1: String, op2: String) =
      bounds(df, Seq("signup", "view", "purchase"),
        Seq(Some(Sequence.TimeBound(op1, 3600L)),
          Some(Sequence.TimeBound(op2, 3600L))))
    assert(g("<=", ">=") == Map(1L -> true))
    assert(g("<=", ">") == Map(1L -> false))
    assert(g("<", ">=") == Map(1L -> false))
  }

  test("time-bound guards: bad operator and non-positive bound fail " +
      "loudly") {
    intercept[IllegalArgumentException] {
      Sequence.TimeBound("==", 10L)
    }
    intercept[IllegalArgumentException] {
      Sequence.TimeBound(">=", 0L)
    }
  }
}
