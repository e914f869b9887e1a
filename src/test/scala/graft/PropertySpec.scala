package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Relational, Skew}

/** Property tests for the invariants the reference relies on implicitly
  * (SURVEY.md §5.3). scalatestplus is not on the offline classpath, so a
  * minimal deterministic forAll drives scalacheck Gens directly.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))
        .foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.listOfN(60, for {
      id <- Gen.choose(0, 9)
      version <- Gen.choose(0, 1000)
      payload <- Gen.choose(0, 1000)
    } yield (id, version, payload))

  test("dedupLatest: one row per key, max version, idempotent") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "v", "p")
        val out = Relational.dedupLatest(df, Seq("id"), "v", Seq("p"))
        val collected = out.select("id", "v").as[(Int, Int)].collect()
        // one row per key
        assert(collected.map(_._1).distinct.length == collected.length)
        // max version wins
        val maxV = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
        collected.foreach { case (k, v) => assert(v == maxV(k)) }
        // idempotent
        assert(Relational.dedupLatest(out, Seq("id"), "v", Seq("p"))
          .count() == out.count())
      }
    }
  }

  test("incremental equivalence: full load == union of watermarked batches") {
    forAll(Gen.choose(1, 99)) { cutPct =>
      val events = Tables.load(spark, sf, "events").limit(200)
      val cut = events.stat.approxQuantile("event_id", Array(cutPct / 100.0), 0)(0)
      val first = events.filter($"event_id" <= cut)
      val wm = first.agg(max("ts")).first().getTimestamp(0)
      // second batch: strictly newer than the first batch's watermark —
      // plus the leftovers with older ts (late data), which the strict
      // watermark would drop; assert the drop is exactly what F1 says
      val second = Relational.newerThan(events, "ts", wm.toString)
      val expectedDropped = events
        .filter($"event_id" > cut && $"ts" <= lit(wm.toString).cast("timestamp"))
        .count()
      assert(first.count() + second.count() + expectedDropped
        - first.filter($"ts" > lit(wm.toString).cast("timestamp")).count()
        == events.count())
    }
  }

  test("salted join equals plain join (inner and left)") {
    val facts = Seq((1, "a"), (1, "b"), (2, "c"), (99, "d"))
      .toDF("k", "payload")
    val dim = Seq((1, "x"), (2, "y")).toDF("dk", "attr")
    for (jt <- Seq("inner", "left")) {
      val plain = facts.join(dim, facts("k") === dim("dk"), jt)
        .select("k", "payload", "attr")
      val salted = Skew.saltedJoin(facts, dim, "k", "dk", 4, jt)
        .select("k", "payload", "attr")
      assert(salted.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(salted).count() == 0)
    }
  }
}
