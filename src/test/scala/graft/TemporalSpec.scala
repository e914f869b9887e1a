package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, expr}

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("as-of join picks the version current at the fact timestamp") {
    val facts = Seq(
      (1L, 10, ts("2024-01-15")),  // between v1 and v2 → v1
      (2L, 10, ts("2024-03-15")),  // after v2 → v2
      (3L, 10, ts("2023-12-31")),  // before any version → null
      (4L, 99, ts("2024-06-01")))  // key with no versions → null
      .toDF("fact_id", "key", "ts")
    val dim = Seq(
      (10, ts("2024-01-01"), "v1"),
      (10, ts("2024-02-01"), "v2"))
      .toDF("k", "valid_from", "tag")
    val out = Temporal.asOfJoin(facts, dim, "fact_id", "key", "ts",
      "k", "valid_from", Seq("tag"))
      .select($"fact_id", $"tag").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).contains("v1"))
    assert(out(2L).contains("v2"))
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("ties on the version timestamp break deterministically") {
    val facts = Seq((1L, 10, ts("2024-02-01"))).toDF("fact_id", "key", "ts")
    val dim = Seq(
      (10, ts("2024-01-01"), 5, "a"),
      (10, ts("2024-01-01"), 9, "b"))  // same valid_from → max seq wins
      .toDF("k", "valid_from", "seq", "tag")
    val out = Temporal.asOfJoin(facts, dim, "fact_id", "key", "ts",
      "k", "valid_from", Seq("tag"), tieBreak = Seq("seq"))
      .select("tag").as[String].head()
    assert(out == "b")
  }

  test("every fact survives the left as-of join (no fan-out residue)") {
    val events = Tables.load(spark, sf, "events")
    val out = Temporal.asOfJoin(events, Tables.load(spark, sf, "orders"),
      "event_id", "user_id", "ts", "o_custkey", "o_orderdate",
      Seq("o_orderkey"))
    assert(out.count() == events.count())
  }

  test("binned range join equals the naive join+filter, including window " +
    "boundaries and bin crossings") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // window (0, 300]: boundary rows at exactly +300s (in) and 0s (out),
    // plus pairs straddling multiples of the 300 s bin width
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:05:00")),   // exactly +300 from e1: in
      (3L, 1L, ts("2024-01-01 10:00:00")),   // equal ts to e1: out
      (4L, 1L, ts("2024-01-01 10:04:59")),   // in e1's window; e2 in e4's
      (5L, 2L, ts("2024-01-01 10:01:00")),   // other key
      (6L, 1L, ts("2024-01-01 10:09:59")))   // in e2's and e4's window
      .toDF("event_id", "user_id", "ts")
    val binned = Temporal.rangeJoin(rows, rows, "user_id", "user_id",
      "ts", "ts", 0L, 300L, Seq("event_id"))
      .select($"event_id", $"r_event_id")
    val naive = rows.as("e").join(rows.as("f"),
      col("f.user_id") === col("e.user_id") &&
        col("f.ts") > col("e.ts") &&
        col("f.ts") <= col("e.ts") + expr("INTERVAL 300 SECONDS"))
      .select(col("e.event_id"), col("f.event_id").as("r_event_id"))
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    // each pair exactly once (a right row lives in exactly one bin)
    assert(binned.count() == binned.distinct().count())
    val pairs = binned.as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (3L, 2L), (3L, 4L),
      (4L, 2L), (4L, 6L), (2L, 6L)))
  }

  test("decayedAgg halves weights per half-life and rejects " +
      "non-positive half-lives loudly") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2024-01-02 00:00:00"), 10.0),  // dt=0  -> w=1
      (1L, t("2024-01-01 00:00:00"), 4.0),   // dt=1d -> w=0.5
      (2L, t("2023-12-31 00:00:00"), 8.0))   // dt=2d -> w=0.25
      .toDF("key", "ts", "value")
    val out = Temporal.decayedAgg(events, "key", "ts", "value",
      halfLifeSec = 86400L, refTs = "2024-01-02 00:00:00")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 12.0, 1.5)))
    assert(out(2L) == ((1L, 2.0, 0.25)))
    val e = intercept[IllegalArgumentException] {
      Temporal.decayedAgg(events, "key", "ts", "value", 0L,
        "2024-01-02 00:00:00")
    }
    assert(e.getMessage.contains("halfLifeSec"))
  }

  test("decayedRunning: each event's counter is its own value plus the " +
      "half-life-decayed prefix; the span guard trips loudly") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), 4.0),
      (2L, 1L, t("2024-01-02 00:00:00"), 2.0),  // 4*0.5 + 2   = 4.0
      (3L, 1L, t("2024-01-04 00:00:00"), 1.0),  // 4*.125+2*.25+1 = 2.0
      (4L, 2L, t("2024-01-01 00:00:00"), 7.0))  // other key
      .toDF("event_id", "key", "ts", "value")
    val out = Temporal.decayedRunning(events, "key", "ts", "value",
      halfLifeSec = 86400L, tieBreak = Seq("event_id"))
      .select($"event_id", $"decayed_running")
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 4.0, 2L -> 4.0, 3L -> 2.0, 4L -> 7.0),
      s"got $out")
    // ties on ts: the tieBreak order decides the prefix
    val tied = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), 3.0),
      (2L, 1L, t("2024-01-01 00:00:00"), 5.0))
      .toDF("event_id", "key", "ts", "value")
    val tiedOut = Temporal.decayedRunning(tied, "key", "ts", "value",
      86400L, tieBreak = Seq("event_id"))
      .select($"event_id", $"decayed_running")
      .as[(Long, Double)].collect().toMap
    assert(tiedOut == Map(1L -> 3.0, 2L -> 8.0))
    // a key spanning > maxHalfLives fails loudly, and <= 0 disables
    val wide = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, t("2024-06-01 00:00:00"), 1.0))
      .toDF("event_id", "key", "ts", "value")
    val e = intercept[IllegalStateException] {
      Temporal.decayedRunning(wide, "key", "ts", "value", 86400L,
        tieBreak = Seq("event_id"), maxHalfLives = 40.0)
    }
    assert(e.getMessage.contains("half-lives"))
    assert(Temporal.decayedRunning(wide, "key", "ts", "value", 86400L,
      tieBreak = Seq("event_id"), maxHalfLives = 0).count() == 2)
  }

  test("resampleFfill: gaps carry the last observation forward, a grid " +
      "instant coinciding with an observation reads IT, alignment padding " +
      "before the first observation is null, and same-instant duplicates " +
      "resolve last-wins by tieBreak") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // key 1: first obs at 00:30 (so the 00:00 grid point is padding),
      // duplicate instant at 00:30 (event 3 must win), obs ON the 02:00
      // grid point, then a gap through 04:xx.
      (1L, 1L, t("2024-01-01 00:30:00"), 10.0),
      (3L, 1L, t("2024-01-01 00:30:00"), 11.0),
      (4L, 1L, t("2024-01-01 02:00:00"), 20.0),
      (5L, 1L, t("2024-01-01 04:10:00"), 30.0),
      (6L, 2L, t("2024-01-01 09:15:00"), 5.0))
      .toDF("event_id", "user", "ts", "value")
    val out = Temporal.resampleFfill(events, "user", "ts", "value",
      stepSec = 3600L, tieBreak = Seq("event_id"))
      .select($"user", $"grid_ts", $"value_ffill")
      .as[(Long, Timestamp, Option[Double])]
      .collect().map { case (k, g, v) => (k, g.toString) -> v }.toMap
    // key 1 grid: 00:00 (padding) through 04:00
    assert(out((1L, "2024-01-01 00:00:00.0")).isEmpty, "padding is null")
    assert(out((1L, "2024-01-01 01:00:00.0")).contains(11.0),
      "same-instant dup: the higher event_id wins")
    assert(out((1L, "2024-01-01 02:00:00.0")).contains(20.0),
      "a coincident observation is read at its own grid instant")
    assert(out((1L, "2024-01-01 03:00:00.0")).contains(20.0), "gap carries")
    assert(out((1L, "2024-01-01 04:00:00.0")).contains(20.0),
      "04:10 observation is after the 04:00 grid point")
    // key 2: single obs → single grid point at its aligned hour
    assert(out.keys.count(_._1 == 2L) == 1)
    assert(out((2L, "2024-01-01 09:00:00.0")).isEmpty,
      "09:00 precedes the 09:15 observation")
    // grid size guard: a second-cadence grid over a year-wide key trips
    val wide = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, t("2025-01-01 00:00:00"), 1.0))
      .toDF("event_id", "user", "ts", "value")
    val e = intercept[IllegalStateException] {
      Temporal.resampleFfill(wide, "user", "ts", "value", stepSec = 1L,
        tieBreak = Seq("event_id"), maxPointsPerKey = 100000L)
    }
    assert(e.getMessage.contains("grid points"))
  }
}
