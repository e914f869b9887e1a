package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val steps = Seq("view", "click", "purchase")

  private def funnel(rows: Seq[(Long, Timestamp, String)],
                     windowSec: Long): Map[Long, Int] =
    Funnel.windowFunnel(
      rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, windowSec)
      .as[(Long, Int)].collect().toMap

  test("full chain in order within the window reaches level 3") {
    val out = funnel(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase")), windowSec = 3600)
    assert(out == Map(1L -> 3))
  }

  test("steps out of order only credit the in-order prefix") {
    // purchase BEFORE the click: chain stops at view→click
    val out = funnel(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "purchase"),
      (1L, ts("2024-01-01 10:10:00"), "click")), windowSec = 3600)
    assert(out == Map(1L -> 2))
  }

  test("the window binds the WHOLE chain to its first event") {
    // click at +50 min is inside, purchase at +70 min is outside 1 h
    val out = funnel(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:50:00"), "click"),
      (1L, ts("2024-01-01 11:10:00"), "purchase")), windowSec = 3600)
    assert(out == Map(1L -> 2))
  }

  test("a later start can out-run an earlier one (any-start semantics)") {
    // from the 09:00 view the chain exceeds the window; the 10:45 view
    // catches the same click+purchase inside it
    val out = funnel(Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:45:00"), "view"),
      (1L, ts("2024-01-01 10:50:00"), "click"),
      (1L, ts("2024-01-01 11:10:00"), "purchase")), windowSec = 3600)
    assert(out == Map(1L -> 3))
  }

  test("strict increase: equal-timestamp events do not chain") {
    val out = funnel(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase")), windowSec = 3600)
    // click is simultaneous with view → not after it → level 1... but
    // greedy then has no click at all, so purchase can't attach either
    assert(out == Map(1L -> 1))
  }

  test("greedy earliest-next is depth-optimal: a dead-end earliest step-2 " +
    "does not exist — any later completion implies greedy completion") {
    // earliest click (10:05) is followed by a purchase at 10:55; a rival
    // chain via the 10:30 click reaches the same purchase. Greedy must
    // find level 3 through the EARLIEST click.
    val out = funnel(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 10:55:00"), "purchase")), windowSec = 3600)
    assert(out == Map(1L -> 3))
  }

  test("users without a step-1 event are absent; independent users " +
    "level independently") {
    val out = funnel(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "click"),
      (2L, ts("2024-01-01 10:10:00"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:10:00"), "click")), windowSec = 3600)
    assert(out == Map(1L -> 1, 3L -> 2))
  }

  test("guards: empty steps and non-positive window fail loudly") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(df, "user_id", "ts", "event_type", Nil, 60)
    }
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(df, "user_id", "ts", "event_type", steps, 0)
    }
  }

  private def funnelMode(rows: Seq[(Long, Timestamp, String)],
                         strictOrder: Boolean = false,
                         strictDedup: Boolean = false): Map[Long, Int] =
    Funnel.windowFunnel(
      rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, windowSec = 3600,
      strictOrder = strictOrder, strictDedup = strictDedup)
      .as[(Long, Int)].collect().toMap

  test("strict_order: an intervening foreign event aborts the chain " +
    "(the ClickHouse A→B→D→C example stops at level 2)") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:15:00"), "error"),  // D intervenes
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(rows) == Map(1L -> 3)) // default mode unaffected
    assert(funnelMode(rows, strictOrder = true) == Map(1L -> 2))
  }

  test("strict_order: a repeat of the step-1 type itself intervenes, " +
    "and any-start semantics still find the clean later chain") {
    // start view@10:00: next event is view@10:05 → abort at level 1;
    // start view@10:05: next is click → level 2, then purchase → 3
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(rows, strictOrder = true) == Map(1L -> 3))
  }

  test("strict_order: a foreign event sharing the step event's exact " +
    "instant does not abort (deterministic tie reading)") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "error"), // same instant as click
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(rows, strictOrder = true) == Map(1L -> 3))
  }

  test("strict_dedup: repeating an already-matched condition before " +
    "the next step aborts (A→B→A→C stops at level 2)") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:15:00"), "view"),   // repeat of matched cond 1
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(rows) == Map(1L -> 3)) // default mode unaffected
    assert(funnelMode(rows, strictDedup = true) == Map(1L -> 2))
    // foreign (unmatched-condition) events do NOT interrupt dedup mode
    val foreign = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:15:00"), "error"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(foreign, strictDedup = true) == Map(1L -> 3))
  }

  test("strict_dedup: a dup sharing the step event's instant is allowed " +
    "— and a later start can still complete after an aborted one") {
    val sameInstant = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "view"),    // dup AT purchase instant
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(sameInstant, strictDedup = true) == Map(1L -> 3))
    // start@10:00 aborted by the 10:05 view; start@10:05 completes
    val restart = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"))
    assert(funnelMode(restart, strictDedup = true) == Map(1L -> 3))
  }

  test("cohort retention counts each cohort member once per offset day " +
    "and rates against the day-0 cohort size") {
    val rows = Seq(
      // user 1: signs up day 1, active days 1,2,3
      (1L, ts("2024-01-01 09:00:00"), "signup"),
      (1L, ts("2024-01-02 09:00:00"), "view"),
      (1L, ts("2024-01-02 18:00:00"), "click"),   // same day — one count
      (1L, ts("2024-01-03 09:00:00"), "view"),
      // user 2: signs up day 1, active day 1 only
      (2L, ts("2024-01-01 12:00:00"), "signup"),
      // user 3: signs up day 2 (second signup ignored), active day 3
      (3L, ts("2024-01-02 10:00:00"), "signup"),
      (3L, ts("2024-01-05 10:00:00"), "signup"),
      (3L, ts("2024-01-03 10:00:00"), "view"),
      // user 4: never signs up → not in any cohort
      (4L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.cohortRetention(rows, "user_id", "ts",
      col("event_type") === "signup", maxOffsetDays = 7)
      .select($"cohort_day".cast("string"), $"day_offset",
        $"active_users", $"cohort_size", $"retained_rate")
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out(("2024-01-01", 0)) == (2L, 2L, 1.0))
    assert(out(("2024-01-01", 1)) == (1L, 2L, 0.5))
    assert(out(("2024-01-01", 2)) == (1L, 2L, 0.5))
    assert(out(("2024-01-02", 0)) == (1L, 1L, 1.0))
    assert(out(("2024-01-02", 1)) == (1L, 1L, 1.0))
    // day-5 signup of user 3 does NOT open a second cohort row
    assert(!out.contains(("2024-01-05", 0)))
    // offsets with no active users are absent, not zero
    assert(!out.contains(("2024-01-01", 3)))
  }

  test("kaplanMeier: textbook product-limit curve — censoring shrinks " +
      "the risk set without killing, exhaustion pins the tail to 0, " +
      "all-censored cohort stays at 1.0") {
    val subj = Seq(
      // cohort a: deaths at 1 and 3(×2), censored at 2 and 4
      ("a", 1, true), ("a", 2, false), ("a", 3, true), ("a", 3, true),
      ("a", 4, false),
      // cohort b: the whole risk set dies at t=1
      ("b", 1, true), ("b", 1, true),
      // cohort c: nobody ever churns
      ("c", 2, false), ("c", 5, false))
      .toDF("cohort", "duration", "churned")
    val out = graft.operators.Funnel.kaplanMeier(
      subj, "cohort", "duration", "churned")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // S(1) = 1 - 1/5 = 0.8
    assert(out(("a", 1))._1 == 5L && out(("a", 1))._2 == 1L)
    assert(math.abs(out(("a", 1))._4 - 0.8) < 1e-8)
    // t=2 censored only: risk set shrinks, survival unchanged
    assert(out(("a", 2)) == ((4L, 0L, 1L, out(("a", 1))._4)))
    // S(3) = 0.8 * (1 - 2/3) = 0.2666...
    assert(out(("a", 3))._1 == 3L && out(("a", 3))._2 == 2L)
    assert(math.abs(out(("a", 3))._4 - 0.8 / 3.0) < 1e-6)
    // trailing censor keeps the last survival
    assert(out(("a", 4))._4 == out(("a", 3))._4)
    // exhaustion: d = n_risk → exactly 0, no ln(0) evaluated
    assert(out(("b", 1)) == ((2L, 2L, 0L, 0.0)))
    // all-censored: survival exactly 1.0 throughout
    assert(out(("c", 2))._4 == 1.0 && out(("c", 5))._4 == 1.0)
  }
}
