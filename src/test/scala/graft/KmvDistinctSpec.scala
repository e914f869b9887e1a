package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvDistinct

class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k: small cardinalities are counted exactly") {
    val df = (1 to 50).map(i => i % 10).toDF("v")
    val est = df.agg(KmvDistinct.column(spark, $"v", 64).as("d"))
      .as[Long].head()
    assert(est == 10)
  }

  test("estimate within ~3/sqrt(k) of exact on fixture data") {
    val e = Tables.load(spark, sf, "events")
    val exact = e.select("event_id").distinct().count() // 1000 distinct
    val est = e.agg(KmvDistinct.column(spark, $"event_id", 256).as("d"))
      .as[Long].head()
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 3.0 / math.sqrt(256), s"exact=$exact est=$est err=$err")
  }

  test("mergeable across partitions: repartitioned input gives same estimate") {
    val e = Tables.load(spark, sf, "events")
    val a = e.repartition(16)
      .agg(KmvDistinct.column(spark, $"event_id", 128)).as[Long].head()
    val b = e.coalesce(1)
      .agg(KmvDistinct.column(spark, $"event_id", 128)).as[Long].head()
    assert(a == b) // k-min set is order-insensitive
  }

  test("usable from SQL text and in GROUP BY") {
    KmvDistinct.register(spark)
    Tables.load(spark, sf, "events").createOrReplaceTempView("kmv_events")
    val rows = spark.sql(
      """SELECT event_type, kmv_distinct(user_id, 64) AS approx_users
        |FROM kmv_events GROUP BY event_type""".stripMargin)
      .collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
