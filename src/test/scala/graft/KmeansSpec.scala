package graft

import graft.operators.Kmeans

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  /** Driver replay of lloydFixed's exact contract: sequential-fold
    * -2·dot(v,c)+dot(c,c) argmin with (dist, cell) tie-break, then
    * integer-1e-8-unit per-dim means; empty cells keep their centroid.
    */
  private def simulate(vecs: Seq[(Long, Array[Float])],
                       init: Seq[Seq[Float]], iters: Int): Map[Long, Int] = {
    var cents: Seq[Seq[Double]] = init.map(_.map(_.toDouble))
    var assign = Map.empty[Long, Int]
    for (t <- 1 to iters) {
      assign = vecs.map { case (id, v) =>
        id -> cents.zipWithIndex.map { case (c, ci) =>
          var dvc = 0.0
          var dcc = 0.0
          for (i <- v.indices) dvc += v(i).toDouble * c(i)
          for (i <- c.indices) dcc += c(i) * c(i)
          (dvc * -2 + dcc, ci)
        }.min._2
      }.toMap
      if (t < iters) cents = cents.zipWithIndex.map { case (old, ci) =>
        val members = vecs.filter(p => assign(p._1) == ci)
        if (members.isEmpty) old
        else old.indices.map { d =>
          members.map(m =>
            math.floor(m._2(d).toDouble * Kmeans.CoordUnit + 0.5).toLong)
            .sum.toDouble / members.size.toDouble / Kmeans.CoordUnit
        }
      }
    }
    assign
  }

  private def blob(ids: Range, axis: Int): Seq[(Long, Array[Float])] =
    ids.map { id =>
      val v = Array.fill(4)(0.015625f * (id % 4))
      v(axis) = 1f + 0.03125f * (id % 3)
      (id.toLong, v)
    }

  test("lloydFixed equals the quantized reference simulation exactly; " +
      "the boundary group migrates once the heavy blob pulls its seed") {
    // A at x=0, B at x=10, a small middle group at x=4; seeds 0 and 6.
    // Round 1 sends the middle to seed 1 (|4-6| < |4-0|); the update
    // drags cell 1's centroid onto B (~9), so round 2 flips the middle
    // to cell 0 — assignments depend on the iteration count.
    val a = (1 to 10).map(i => (i.toLong, Array(0f, 0f, 0f, 0.015625f * i)))
    val b = (31 to 40).map(i => (i.toLong, Array(10f, 0f, 0f, 0.015625f * i)))
    val mid = Seq((20L, Array(4f, 0f, 0f, 0f)),
      (21L, Array(4f, 0f, 0f, 0.25f)))
    val vecs = a ++ b ++ mid
    val init = Seq(Seq(0f, 0f, 0f, 0f), Seq(6f, 0f, 0f, 0f))
    val got = Kmeans.lloydFixed(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", init, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(got == simulate(vecs, init, iters = 3))
    assert((1 to 10).forall(i => got(i.toLong) == 0))
    assert((31 to 40).forall(i => got(i.toLong) == 1))
    assert(got(20L) == 0 && got(21L) == 0, "middle group must migrate")
    val oneRound = Kmeans.lloydFixed(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", init, iters = 1)
      .as[(Long, Int)].collect().toMap
    assert(oneRound == simulate(vecs, init, iters = 1))
    assert(oneRound(20L) == 1 && oneRound(21L) == 1,
      "pre-update the middle group sits with seed 1")
  }

  test("an empty cell keeps its centroid and the run stays total") {
    val vecs = blob(1 to 10, 0)
    // centroid 1 is antipodal: captures nothing, must not NaN or drop
    val init = Seq(Seq(1f, 0f, 0f, 0f), Seq(-8f, -8f, -8f, -8f))
    val got = Kmeans.lloydFixed(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", init, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(got == simulate(vecs, init, iters = 3))
    assert(got.values.forall(_ == 0), "all vectors stay in cell 0")
  }
}
