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

  test("uniqCombined mode algebra: sparse∪sparse stays exact below the " +
    "threshold, converts to dense across it, and sparse∪dense merges " +
    "into the dense registers — one-shot ≡ any split in every case") {
    val T = 32
    def state(rows: Seq[(String, Double, Long)]) =
      Rollup.aggregateState(df(rows), keys, "v", "u", K, sparseThreshold = T)
    def fin(state: DataFrame) = Rollup.finalizeState(state, keys, K)
      .select($"g", $"n", $"distinct_est", $"hll_distinct_est", $"hll_mode")
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap

    // below threshold from both sides: stays sparse, estimate EXACT
    val a = (1 to 10).map(i => ("g", i * 1.0, i.toLong))
    val b = (6 to 20).map(i => ("g", i * 1.0, i.toLong)) // overlap 6..10
    val small = fin(Rollup.merge(Seq(state(a), state(b)), keys, K,
      sparseThreshold = T))
    // the HLL side is EXACT in sparse mode (20 distinct); the KMV
    // beside it is past its k=16 saturation and estimates (~19)
    assert(small("g")._2 == 20.0 && small("g")._3 == "sparse",
      small("g").toString)
    assert(small("g") == fin(state(a ++ b))("g")) // split-invariant

    // union crosses the threshold: converts to dense, registers equal
    // the one-shot build's (so the estimate is identical)
    val c = (1 to 25).map(i => ("g", i * 1.0, i.toLong))
    val d = (20 to 45).map(i => ("g", i * 1.0, i.toLong))
    val crossed = fin(Rollup.merge(Seq(state(c), state(d)), keys, K,
      sparseThreshold = T))
    val oneShot = fin(state(c ++ d))
    assert(crossed("g")._3 == "dense" && oneShot("g")._3 == "dense")
    assert(crossed("g") == oneShot("g"),
      s"${crossed("g")} vs ${oneShot("g")}")

    // sparse ∪ dense: dense wins, registers still split-invariant
    val big = (1 to 100).map(i => ("g", i * 1.0, i.toLong))
    val mixed = fin(Rollup.merge(Seq(state(big), state(a)), keys, K,
      sparseThreshold = T))
    val mixedOneShot = fin(state(big ++ a))
    assert(mixed("g")._3 == "dense")
    assert(mixed("g") == mixedOneShot("g"))
  }

  test("NULL distinct-column values do not count as a distinct value " +
    "(count(DISTINCT) semantics) and do not crash the sketch builds") {
    val withNulls = Seq(
      ("g0", 1.0, Some(1L)), ("g0", 2.0, Some(2L)),
      ("g0", 3.0, None), ("g0", 4.0, None),
      ("g1", 5.0, None)) // a key whose distinct values are ALL null
      .toDF("g", "v", "u")
    val state = Rollup.aggregateState(withNulls, keys, "v", "u", K)
    val fin = Rollup.finalizeState(state, keys, K)
      .select($"g", $"n", $"distinct_est", $"hll_distinct_est")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // scalar aggregates still count every row; distinct ignores nulls
    assert(fin(("g0"))._1 == 4L && fin(("g0"))._2 == 2L)
    // linear counting at 2/256 registers: 256·ln(256/254) ≈ 2.008
    assert(math.abs(fin(("g0"))._3 - 2.0) < 0.05, fin(("g0"))._3.toString)
    assert(fin(("g1"))._1 == 1L && fin(("g1"))._2 == 0L)
    assert(fin(("g1"))._3 == 0.0)
  }

  test("funnel state: build(all) ≡ merge(build(bᵢ)) for splits that cut " +
    "chains mid-way, and the merge is idempotent under replay") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val steps = Seq("view", "click", "purchase")
    val all = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (2L, ts("2024-01-01 11:05:00"), "click"),
      (3L, ts("2024-01-01 12:00:00"), "view"))
    def st(rows: Seq[(Long, Timestamp, String)]) =
      Rollup.aggregateFunnelState(rows.toDF("user_id", "ts", "event_type"),
        Seq("user_id"), "ts", "event_type", steps)
    def levels(state: DataFrame) =
      Rollup.finalizeFunnel(state, Seq("user_id"), steps, 3600)
        .as[(Long, Int)].collect().toMap
    val oneShot = levels(st(all))
    assert(oneShot == Map(1L -> 3, 2L -> 2, 3L -> 1))
    // cut user 1's chain between click and purchase
    val (a, b) = all.splitAt(2)
    val merged = Rollup.mergeFunnelStates(Seq(st(a), st(b)), Seq("user_id"))
    assert(levels(merged) == oneShot)
    // replay: merging a batch's state twice cannot move a level
    val replayed = Rollup.mergeFunnelStates(Seq(merged, st(b)), Seq("user_id"))
    assert(levels(replayed) == oneShot)
    // mega-key guard fails loudly
    val ex = intercept[IllegalStateException] {
      Rollup.aggregateFunnelState(all.toDF("user_id", "ts", "event_type"),
        Seq("user_id"), "ts", "event_type", steps, maxEventsPerKey = 2L)
    }
    assert(ex.getMessage.contains("maxEventsPerKey"))
  }

  test("guard: k below 16 fails loudly") {
    intercept[IllegalArgumentException] {
      Rollup.aggregateState(df(Seq(("a", 1.0, 1L))), keys, "v", "u", 8)
    }
  }

  test("CM state: merge(build(bi)) equals build(all) grid-for-grid for " +
    "any split; probe never underestimates; geometry mismatch is loud") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", s"t${i % 17}"))
    val all = rows.toDF("g", "term")
    val oneShot = Rollup.aggregateCmState(all, keys, $"term", 3, 32)
      .as[(String, Seq[Long])].collect().toMap
    // adversarial split: uneven thirds, one empty-ish slice per key
    val parts = Seq(
      rows.take(7), rows.slice(7, 180), rows.drop(180))
      .map(_.toDF("g", "term"))
      .map(Rollup.aggregateCmState(_, keys, $"term", 3, 32))
    val merged = Rollup.mergeCmStates(parts, keys, 3, 32)
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == oneShot)
    // probe: estimate >= exact for every (g, term)
    val probe = all.select($"term").distinct()
    val est = Rollup.finalizeCm(Rollup.mergeCmStates(parts, keys, 3, 32),
      keys, probe, "term", 3, 32)
      .as[(String, String, Long)].collect()
      .map { case (g, t, e) => (g, t) -> e }.toMap
    val exact = all.groupBy("g", "term").count()
      .as[(String, String, Long)].collect()
      .map { case (g, t, n) => (g, t) -> n }.toMap
    exact.foreach { case (k2, n) =>
      assert(est(k2) >= n, s"$k2: est ${est(k2)} < exact $n")
    }
    // a state built with different geometry must raise, not truncate
    val wrong = Rollup.aggregateCmState(all, keys, $"term", 2, 32)
    val ex = intercept[Exception] {
      Rollup.mergeCmStates(Seq(parts.head, wrong), keys, 3, 32).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        messages(x.getCause))
    assert(messages(ex).exists(_.contains("grid size")), ex.getMessage)
  }

  test("merge rejects an old-format state frame (missing sketch " +
    "column) with an actionable message instead of undercounting") {
    val st = Rollup.aggregateState(df(Seq(("a", 1.0, 1L))), keys, "v", "u", K)
    val ex = intercept[IllegalArgumentException] {
      Rollup.merge(Seq(st.drop("hll")), keys, K)
    }
    assert(ex.getMessage.contains("older state format"), ex.getMessage)
  }

  test("HLL state: dense 256-register array, split-merge invariant, " +
    "near-exact in the linear-counting range, 4σ at 2k distinct") {
    // u decoupled from the group key (i%3 and i%12 share a factor —
    // i/3 % 12 gives each group the full 12-value universe)
    val rows = (1 to 400).map { i =>
      (s"g${i % 3}", i * 0.5, (i / 3 % 12).toLong) // 12 distinct per group
    }
    val full = Rollup.aggregateState(df(rows), keys, "v", "u", K)
    assert(full.select(size($"hll")).as[Int].collect().forall(_ == 256))
    val fullEst = Rollup.finalizeState(full, keys, K)
      .select($"g", $"hll_distinct_est").as[(String, Double)]
      .collect().toMap
    // register-wise MAX merge: same finalized sketch for any split
    val merged = Rollup.merge(Seq(
      Rollup.aggregateState(df(rows.take(123)), keys, "v", "u", K),
      Rollup.aggregateState(df(rows.drop(123)), keys, "v", "u", K)),
      keys, K)
    val mergedEst = Rollup.finalizeState(merged, keys, K)
      .select($"g", $"hll_distinct_est").as[(String, Double)]
      .collect().toMap
    assert(mergedEst == fullEst)
    // linear counting at 12 of 256 registers is near-exact
    assert(fullEst.values.forall(e => math.abs(e - 12.0) < 2.0),
      s"lc estimates $fullEst")
    val big = Rollup.aggregateState(
      (1 to 2000).map(i => ("g", 1.0, i.toLong)).toDF("g", "v", "u"),
      keys, "v", "u", K)
    val bigEst = Rollup.finalizeState(big, keys, K)
      .select($"hll_distinct_est").as[Double].head()
    // σ ≈ 1.04/√256 = 6.5%; 4σ = 26%
    assert(bigEst > 1480 && bigEst < 2520, s"estimate $bigEst for 2000")
  }

  // --- topK state (ClickHouse topKState/topKMerge) --------------------

  private def topkRows(state: DataFrame): Set[(String, String, Long)] =
    Rollup.finalizeTopK(state, Seq("g"), 10)
      .select($"g", $"item", $"cnt").as[(String, String, Long)]
      .collect().toSet

  test("topK state below saturation: merge(build(bᵢ)) ≡ build(all) ≡ " +
      "the exact GROUP BY for any batch split") {
    val rows = Seq.fill(5)(("g", "a")) ++ Seq.fill(3)(("g", "b")) ++
      Seq(("g", "c"), ("h", "z"))
    val all = rows.toDF("g", "item")
    val k = 8
    val oneShot = Rollup.aggregateTopKState(all, Seq("g"), $"item", k)
    val exact = Set(("g", "a", 5L), ("g", "b", 3L), ("g", "c", 1L),
      ("h", "z", 1L))
    assert(topkRows(oneShot) == exact)
    // adversarial split: duplicates straddle batches
    val (r1, r2) = rows.splitAt(4)
    val merged = Rollup.mergeTopKStates(Seq(
      Rollup.aggregateTopKState(r1.toDF("g", "item"), Seq("g"), $"item", k),
      Rollup.aggregateTopKState(r2.toDF("g", "item"), Seq("g"), $"item", k)),
      Seq("g"), k)
    assert(topkRows(merged) == exact)
  }

  test("topK state above saturation: heavy items survive any merge " +
      "order within the N/(k+1) guarantee; state stays bounded at k") {
    // 40×a, 24×b, 8 singletons; k = 2 → bound = 72/3 = 24: 'a' must
    // survive with count in [16, 40]
    val rows = Seq.fill(40)(("g", "a")) ++ Seq.fill(24)(("g", "b")) ++
      (1 to 8).map(i => ("g", s"s$i"))
    val k = 2
    val (r1, r2) = rows.splitAt(30)
    val merged = Rollup.mergeTopKStates(Seq(
      Rollup.aggregateTopKState(r1.toDF("g", "item"), Seq("g"), $"item", k),
      Rollup.aggregateTopKState(r2.toDF("g", "item"), Seq("g"), $"item", k)),
      Seq("g"), k)
    val state = merged.select($"topk_state").as[Seq[(String, Long)]]
      .head()
    assert(state.size <= k)
    val a = state.toMap.get("a")
    assert(a.nonEmpty, s"heavy item 'a' missing from $state")
    assert(a.get <= 40L && a.get >= 40L - 24L, s"count ${a.get}")
  }

  test("topK merge rejects a non-state frame loudly") {
    val bogus = Seq(("g", 1L)).toDF("g", "n")
    val err = intercept[IllegalArgumentException] {
      Rollup.mergeTopKStates(Seq(bogus), Seq("g"), 4)
    }
    assert(err.getMessage.contains("topk_state"))
  }

  test("quantile state: build(all) ≡ merge(build(bᵢ)) for any split; " +
      "finalize brackets the exact percentile; below/above lanes open") {
    // values 1..100 in one group plus out-of-range extremes
    val rows = (1L to 100L).map(v => ("g", v.toDouble)) ++
      Seq(("g", -5.0), ("g", 1e9))
    val df = rows.toDF("k", "v")
    val (lo, res, nb) = (0.0, 10.0, 10)
    val all = Rollup.aggregateQuantileState(df, Seq("k"), $"v", lo, res, nb)
    val merged = Rollup.mergeQuantileStates(
      Seq(
        Rollup.aggregateQuantileState(
          df.filter($"v" < 37), Seq("k"), $"v", lo, res, nb),
        Rollup.aggregateQuantileState(
          df.filter($"v" >= 37 && $"v" < 80), Seq("k"), $"v", lo, res, nb),
        Rollup.aggregateQuantileState(
          df.filter($"v" >= 80), Seq("k"), $"v", lo, res, nb)),
      Seq("k"))
    val a = all.orderBy("bucket").collect().toSeq
    val m = merged.orderBy("bucket").collect().toSeq
    assert(a == m, s"merge must equal one-shot: $m vs $a")
    // p50 over 102 values: rank ceil(0.5*102)=51 → value 50 → bucket 5
    // ([50,60)); the true median 50 sits inside the bracket
    val fin = Rollup.finalizeQuantile(merged, Seq("k"),
      Seq(0.5, 0.99, 1.0), lo, res, nb)
      .collect().map(r => r.getDouble(2) ->
        ((r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(fin(0.5) == ((5L, Some(50.0), Some(60.0))))
    // p99: rank ceil(0.99*102)=101 → value 100 → bucket 10 = the ABOVE
    // lane (100 lands exactly on hi), open upper edge
    assert(fin(0.99) == ((10L, Some(100.0), None)))
    // p100 = the max (1e9) — also the above lane
    assert(fin(1.0) == ((10L, Some(100.0), None)))
    // the below lane is present in the state with an open lower edge
    val below = Rollup.finalizeQuantile(
      Rollup.aggregateQuantileState(
        Seq(("g", -1.0)).toDF("k", "v"), Seq("k"), $"v", lo, res, nb),
      Seq("k"), Seq(0.5), lo, res, nb).collect().head
    assert(below.getLong(1) == -1L && below.isNullAt(3) &&
      below.getDouble(4) == 0.0)
    // geometry drift raises loudly at finalize
    val drifted = Seq(("g", 99L, 3L)).toDF("k", "bucket", "cnt")
    val err = intercept[Exception] {
      Rollup.finalizeQuantile(drifted, Seq("k"), Seq(0.5), lo, res, nb)
        .collect()
    }
    assert(err.getMessage.contains("different geometry") ||
      Option(err.getCause).exists(_.getMessage.contains("different geometry")))
  }
}
