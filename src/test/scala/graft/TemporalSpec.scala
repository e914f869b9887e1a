package graft

import java.sql.Timestamp

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
}
