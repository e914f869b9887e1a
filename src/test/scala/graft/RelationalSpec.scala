package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.load(spark, sf, "events")

  test("watermark falls back to 2000-01-01 epoch on empty target (v2/dag:113-114)") {
    val empty = events.filter(lit(false))
    assert(Relational.watermark(empty, "ts").toString.startsWith("2000-01-01"))
    assert(Relational.monthWatermark(empty, "ts").toString.startsWith("2000-01-01"))
  }

  test("watermark is the true max") {
    val wm = Relational.watermark(events, "ts")
    val expected = events.agg(max("ts")).first().getTimestamp(0)
    assert(wm == expected)
  }

  test("strict vs inclusive watermark filters (F1 vs F2)") {
    val wm = "2024-01-15 00:00:00"
    val strict = Relational.newerThan(events, "ts", wm).count()
    val incl = Relational.onOrAfter(events, "ts", wm).count()
    assert(strict <= incl)
    assert(strict + events.filter($"ts" < lit(wm).cast("timestamp")).count()
      == events.count())
  }

  test("modulo shards are disjoint and complete (F4, v1/dag:119,124)") {
    val s0 = Relational.moduloShard(events, "event_id", 2, 0)
    val s1 = Relational.moduloShard(events, "event_id", 2, 1)
    assert(s0.count() + s1.count() == events.count())
    assert(s0.join(s1, Seq("event_id"), "inner").count() == 0)
  }

  test("dedupLatest keeps exactly the latest version per key (A4)") {
    val df = Seq(
      (1, "2024-01-01 00:00:00", "old"),
      (1, "2024-02-01 00:00:00", "new"),
      (2, "2024-01-05 00:00:00", "only"))
      .toDF("id", "ts", "tag")
      .withColumn("ts", $"ts".cast("timestamp"))
    val out = Relational.dedupLatest(df, Seq("id"), "ts").orderBy("id")
      .select("id", "tag").as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "new"), (2, "only")))
  }

  test("dedupLatest is idempotent and deterministic under ties") {
    val df = Seq((1, "2024-01-01 00:00:00", 10), (1, "2024-01-01 00:00:00", 20))
      .toDF("id", "ts", "v").withColumn("ts", $"ts".cast("timestamp"))
    val once = Relational.dedupLatest(df, Seq("id"), "ts", Seq("v"))
    val twice = Relational.dedupLatest(once, Seq("id"), "ts", Seq("v"))
    assert(once.collect().toSeq == twice.collect().toSeq)
    assert(once.select("v").as[Int].head() == 20) // tie → max tieBreak wins
  }

  test("enrich behaves as a broadcast left join keeping unmatched facts (J1)") {
    val facts = Seq((1L, 10L), (2L, 999L)).toDF("id", "fk")
    val dim = Seq((10L, "alice")).toDF("k", "name")
    val out = Relational.enrich(facts, dim, "fk", "k", Seq("name"))
    assert(out.count() == 2)
    assert(out.filter($"id" === 2).select("name").first().isNullAt(0))
  }

  test("anti + semi partition the source by key presence (J2)") {
    val c = Tables.load(spark, sf, "customer").select("c_custkey")
    val o = Tables.load(spark, sf, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
    val in = Relational.inTarget(c, o, "c_custkey").count()
    val outN = Relational.notInTarget(c, o, "c_custkey").count()
    assert(in + outN == c.count())
  }

  test("retention horizon truncates to month start (M2, v2/dag:134)") {
    val df = Seq("2024-07-20 12:34:56").toDF("a")
      .select(Relational.retentionHorizon($"a".cast("timestamp"), 30).as("h"))
    assert(df.first().getTimestamp(0).toString.startsWith("2022-01-01"))
  }

  test("defaults fill repairs nulls per §1.4 contract") {
    val df = Seq((1, null: String, null: java.lang.Integer))
      .toDF("id", "action", "user_id")
    val out = graft.schema.Schemas.applyDefaults(df,
      Map("action" -> "undefined", "user_id" -> -1))
    val r = out.first()
    assert(r.getString(1) == "undefined" && r.getInt(2) == -1)
  }

  test("timestamp defaults coalesce to 1997-01-01") {
    val df = Seq((1, null: String)).toDF("id", "t")
      .withColumn("t", $"t".cast("timestamp"))
    val out = graft.schema.Schemas.fillTimestampDefaults(df, Seq("t"))
    assert(out.first().getTimestamp(1).toString.startsWith("1997-01-01"))
  }
}
