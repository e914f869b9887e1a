package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 history building, snapshot merge, and snapshot diffing —
  * including the applySnapshot idempotency contract its scaladoc
  * promises and the non-timestamp tsCol interval typing.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("buildHistory: change points open intervals, unchanged " +
      "observations collapse, the open row is current") {
    val changes = Seq(
      (1L, ts("2024-01-01"), "a", 10),
      (1L, ts("2024-01-05"), "a", 10),  // unchanged -> collapses
      (1L, ts("2024-01-10"), "b", 10),  // attr1 change
      (1L, ts("2024-01-20"), "b", 20),  // attr2 change
      (2L, ts("2024-02-01"), "x", 1))
      .toDF("key", "ts", "attr1", "attr2")
    val h = Scd.buildHistory(changes, "key", "ts", Seq("attr1", "attr2"))
      .as[(Long, String, Int, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._4.getTime))
    assert(h.length == 4, s"3 change points for key 1 + 1 for key 2: ${h.toSeq}")
    val k1 = h.filter(_._1 == 1L)
    assert(k1.map(r => (r._2, r._3)).toSeq ==
      Seq(("a", 10), ("b", 10), ("b", 20)))
    // intervals chain: each valid_to equals the next valid_from
    assert(k1(0)._5.contains(k1(1)._4) && k1(1)._5.contains(k1(2)._4))
    assert(k1(2)._5.isEmpty && k1(2)._6, "last row open + current")
    assert(k1.take(2).forall(!_._6))
    val k2 = h.filter(_._1 == 2L).head
    assert(k2._5.isEmpty && k2._6)
  }

  test("buildHistory: a first observation with all-null attrs is still " +
      "a change point, and tieBreak totals the order within a timestamp") {
    val changes = Seq(
      (1L, ts("2024-01-01"), Option.empty[String], 1L),
      (1L, ts("2024-01-01"), Some("b"), 2L))  // same ts, seq breaks tie
      .toDF("key", "ts", "attr1", "seq")
    val h = Scd.buildHistory(changes, "key", "ts", Seq("attr1"),
      tieBreak = Seq("seq"))
      .as[(Long, Option[String], Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(_._3.getTime)
    assert(h.length == 2)
    assert(h(0)._2.isEmpty && !h(0)._5, "null-attr first row captured")
    assert(h(1)._2.contains("b") && h(1)._5)
  }

  private val hist0 = Seq(
    (1L, "a", ts("2024-01-01"), Some(ts("2024-02-01")), false),
    (1L, "b", ts("2024-02-01"), Option.empty[Timestamp], true),
    (2L, "x", ts("2024-01-15"), Option.empty[Timestamp], true))
    .toDF("key", "attr1", "valid_from", "valid_to", "is_current")

  test("applySnapshot: changed key closes + reopens, unseen key stays " +
      "current, new key opens; same snapshot twice is a no-op") {
    val snap = Seq((1L, "c"), (3L, "n")).toDF("key", "attr1") // 2 absent
    val once = Scd.applySnapshot(hist0, snap, "key", Seq("attr1"),
      "2024-03-01 00:00:00")
    val rows = once
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(rows.map(r => (r._1, r._2, r._5)) == Seq(
      (1L, "a", false), (1L, "b", false), (1L, "c", true),
      (2L, "x", true), (3L, "n", true)))
    // the closed-at-asOf row and the new open row share the boundary
    assert(rows(1)._4.contains(ts("2024-03-01")) &&
      rows(2)._3 == ts("2024-03-01"))
    // idempotency: the SAME snapshot applied to the merged history
    // changes nothing (doc contract)
    val twice = Scd.applySnapshot(once, snap, "key", Seq("attr1"),
      "2024-03-01 00:00:00")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(twice == rows, "applySnapshot must be idempotent")
  }

  test("applySnapshot accepts a history whose tsCol was not " +
      "timestamp-typed (valid_from casts like valid_to)") {
    // a DATE-typed change log: buildHistory emits date-typed intervals
    val changes = Seq((1L, "2024-01-01", "a"), (1L, "2024-02-01", "b"))
      .toDF("key", "d", "attr1")
      .withColumn("d", col("d").cast("date"))
    val h = Scd.buildHistory(changes, "key", "d", Seq("attr1"))
    val out = Scd.applySnapshot(h, Seq((1L, "c")).toDF("key", "attr1"),
      "key", Seq("attr1"), "2024-03-01 00:00:00")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(_._3.getTime).toSeq
    assert(out.map(r => (r._2, r._5)) ==
      Seq(("a", false), ("b", false), ("c", true)))
    assert(out(1)._4.contains(ts("2024-03-01")))
  }

  test("snapshotDiff classifies insert/delete/update/unchanged " +
      "null-safely") {
    val older = Seq(
      (1L, Some("a")), (2L, Some("x")), (3L, Option.empty[String]),
      (4L, Some("gone")))
      .toDF("key", "v")
    val newer = Seq(
      (1L, Some("a")), (2L, Some("y")), (3L, Option.empty[String]),
      (5L, Some("new")))
      .toDF("key", "v")
    val d = Scd.snapshotDiff(older, newer, Seq("key"), Seq("v"))
      .select($"key", $"change").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "update", 3L -> "unchanged",
      4L -> "delete", 5L -> "insert"))
  }

  test("asOf: exactly one covering row per key observed by then, equal to " +
      "the latest change at or before the lookup instant; boundary instants " +
      "resolve to the row OPENING there ([from, to) intervals); future keys absent") {
    val changes = Seq(
      (1L, ts("2024-01-01"), "a"),
      (1L, ts("2024-01-10"), "b"),
      (1L, ts("2024-01-20"), "c"),
      (2L, ts("2024-01-12"), "x"),
      (3L, ts("2024-03-01"), "late"))
      .toDF("key", "ts", "attr")
    val h = Scd.buildHistory(changes, "key", "ts", Seq("attr"))
    val at = Scd.asOf(h, "2024-01-15 00:00:00")
      .select($"key", $"attr").as[(Long, String)].collect().toMap
    assert(at == Map(1L -> "b", 2L -> "x"), "key 3 not yet observed")
    // boundary: at an interval edge the NEW row is in force, not the closed one
    val edge = Scd.asOf(h, "2024-01-10 00:00:00")
      .select($"key", $"attr").as[(Long, String)].collect().toMap
    assert(edge == Map(1L -> "b"))
    // one row per key at any instant (intervals partition the timeline)
    val all = Scd.asOf(h, "2024-12-01 00:00:00")
    assert(all.count() == all.select("key").distinct().count())
  }
}
