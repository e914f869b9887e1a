package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline keeps exactly the non-dominated points") {
    // minimize x, maximize y
    val df = Seq(
      (1L, 1.0, 10),  // skyline (cheapest)
      (2L, 2.0, 20),  // skyline (better y than 1, worse x)
      (3L, 3.0, 15),  // dominated by 2 (worse x, worse y)
      (4L, 2.0, 20),  // tie with 2 → neither dominates → both skyline
      (5L, 5.0, 30))  // skyline (best y)
      .toDF("id", "x", "y")
    val out = Skyline.skyline(df, Seq("x"), Seq("y"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 4L, 5L))
  }

  test("two-phase result equals the brute-force dominance check on fixture parts") {
    val parts = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size")
    val fast = Skyline.skyline(parts, Seq("p_retailprice"), Seq("p_size"))
      .select("p_partkey").as[Long].collect().toSet
    val p = parts.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = p.filter { case (_, px, py) =>
      !p.exists { case (_, qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.map(_._1).toSet
    assert(fast == brute)
  }

  test("rows with null criteria are excluded, partition count does not change results") {
    val df = Seq(
      (1L, Some(1.0), Some(10)), (2L, None, Some(20)), (3L, Some(0.5), None))
      .toDF("id", "x", "y")
    val out = Skyline.skyline(df, Seq("x"), Seq("y"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L))
    val parts = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size")
    val a = Skyline.skyline(parts.repartition(7), Seq("p_retailprice"), Seq("p_size"))
      .select("p_partkey").as[Long].collect().toSet
    val b = Skyline.skyline(parts.coalesce(1), Seq("p_retailprice"), Seq("p_size"))
      .select("p_partkey").as[Long].collect().toSet
    assert(a == b)
  }
}
