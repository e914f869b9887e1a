package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Rollup

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16
  private val keys = Seq("g")

  private def finalRows(state: DataFrame) =
    Rollup.finalizeState(state, keys, K)
      .select($"g", $"n", $"sum_v", $"min_v", $"max_v", $"avg_v",
        $"distinct_est")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSet

  private def df(rows: Seq[(String, Double, Long)]) =
    rows.toDF("g", "v", "u")

  test("merge of any batch split finalizes identically to the one-shot " +
    "build (MergeTree merge associativity)") {
    val rows = (1 to 400).map { i =>
      (s"g${i % 3}", (i % 37) * 1.25 - 7.0, (i % 55).toLong)
    }
    val full = finalRows(Rollup.aggregateState(df(rows), keys, "v", "u", K))
    // adversarial splits: singleton batch, interleaved, skewed
    val splits = Seq(
      Seq(rows.take(1), rows.drop(1)),
      Seq(rows.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
        rows.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)),
      Seq(rows.take(390), rows.slice(390, 395), rows.drop(395)))
    splits.foreach { batches =>
      val merged = Rollup.merge(
        batches.map(b => Rollup.aggregateState(df(b), keys, "v", "u", K)),
        keys, K)
      assert(finalRows(merged) == full)
    }
  }

  test("merging a merged state again is idempotent-shaped: re-merging " +
    "with an empty state frame changes nothing") {
    val rows = (1 to 100).map(i => (s"g${i % 2}", i * 0.5, (i % 9).toLong))
    val st = Rollup.aggregateState(df(rows), keys, "v", "u", K)
    val empty = Rollup.aggregateState(
      df(rows).filter(lit(false)), keys, "v", "u", K)
    assert(finalRows(Rollup.merge(Seq(st, empty), keys, K)) == finalRows(st))
  }

  test("disjoint-key batches pass through the merge unchanged") {
    val a = Rollup.aggregateState(
      df(Seq(("a", 1.0, 1L), ("a", 3.0, 2L))), keys, "v", "u", K)
    val b = Rollup.aggregateState(
      df(Seq(("b", 10.0, 1L))), keys, "v", "u", K)
    val out = finalRows(Rollup.merge(Seq(a, b), keys, K))
    assert(out == Set(
      ("a", 2L, 4.0, 1.0, 3.0, 2.0, 2L),
      ("b", 1L, 10.0, 10.0, 10.0, 10.0, 1L)))
  }

  test("KMV state is bounded at k hashes and the estimate is exact " +
    "below saturation") {
    val rows = (1 to 500).map(i => ("g", 1.0, (i % 12).toLong)) // 12 < k
    val st = Rollup.aggregateState(df(rows), keys, "v", "u", K)
    val kmvSize = st.select(size($"kmv")).as[Int].head()
    assert(kmvSize == 12)
    val est = finalRows(st).head._7
    assert(est == 12L)
  }

  test("a saturated KMV state stays at k hashes and estimates within " +
    "the sketch's error band") {
    val rows = (1 to 2000).map(i => ("g", 1.0, i.toLong)) // 2000 >> k
    val st = Rollup.aggregateState(df(rows), keys, "v", "u", K)
    assert(st.select(size($"kmv")).as[Int].head() == K)
    val est = finalRows(st).head._7
    // k=16 → std err ≈ 1/√14 ≈ 27%; allow 4σ
    assert(est > 200 && est < 8000, s"estimate $est implausible for 2000")
  }

  test("guard: k below 16 fails loudly") {
    intercept[IllegalArgumentException] {
      Rollup.aggregateState(df(Seq(("a", 1.0, 1L))), keys, "v", "u", 8)
    }
  }
}
