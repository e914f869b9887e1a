package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Rollup
import graft.streaming.RollupStream

class RollupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16
  private val keys = Seq("g")

  private def rows(ids: Range) =
    ids.map(i => (s"g${i % 3}", (i % 23) * 0.5, (i % 31).toLong))

  private def finalSet(df: DataFrame) =
    df.select($"g", $"n", $"sum_v", $"min_v", $"max_v", $"avg_v",
      $"distinct_est")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSet

  test("streamed micro-batch maintenance converges to the one-shot " +
    "batch rollup (materialized-view equivalence)") {
    val src = tempDir("rollup_stream_src")
    val state = tempDir("rollup_stream_state")
    val ckpt = tempDir("rollup_stream_ckpt")
    def writeBatch(r: Seq[(String, Double, Long)]): Unit =
      r.toDF("g", "v", "u").coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("g STRING, v DOUBLE, u BIGINT").parquet(src)
      val q = RollupStream.maintainSink(stream, state, keys, "v", "u", K)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(120000)
    }
    writeBatch(rows(0 until 100)); runOnce()
    writeBatch(rows(100 until 150)); runOnce()
    writeBatch(rows(150 until 400)); runOnce()
    val streamed = finalSet(
      RollupStream.readFinalized(spark, state, keys, K))
    val oneShot = finalSet(Rollup.finalizeState(
      Rollup.aggregateState(rows(0 until 400).toDF("g", "v", "u"),
        keys, "v", "u", K), keys, K))
    assert(streamed == oneShot)
  }

  test("a replayed batch is idempotent: re-merging the same batchId " +
    "overwrites its own generation, not double-counts") {
    val state = tempDir("rollup_replay_state")
    val b1 = rows(0 until 60).toDF("g", "v", "u")
    val b2 = rows(60 until 90).toDF("g", "v", "u")
    RollupStream.mergeBatch(b1, state, keys, "v", "u", K, batchId = 0L)
    RollupStream.mergeBatch(b2, state, keys, "v", "u", K, batchId = 1L)
    val once = finalSet(RollupStream.readFinalized(spark, state, keys, K))
    // crash-replay of batch 1: same inputs, same id
    RollupStream.mergeBatch(b2, state, keys, "v", "u", K, batchId = 1L)
    val twice = finalSet(RollupStream.readFinalized(spark, state, keys, K))
    assert(twice == once)
  }

  test("old generations are pruned, the newest survive") {
    val state = tempDir("rollup_prune_state")
    (0 until 6).foreach { b =>
      RollupStream.mergeBatch(rows(b * 10 until (b + 1) * 10)
        .toDF("g", "v", "u"), state, keys, "v", "u", K,
        batchId = b.toLong, keepGenerations = 2)
    }
    val gens = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("gen=")).map(_.getName).sorted
    assert(gens.toSeq == Seq("gen=4", "gen=5"), gens.mkString(","))
    // and the surviving state still reflects ALL six batches
    val fin = finalSet(RollupStream.readFinalized(spark, state, keys, K))
    val oneShot = finalSet(Rollup.finalizeState(
      Rollup.aggregateState(rows(0 until 60).toDF("g", "v", "u"),
        keys, "v", "u", K), keys, K))
    assert(fin == oneShot)
  }

  test("streamed funnel-state maintenance converges to the one-shot " +
    "batch walk — chains split across micro-batches still convert") {
    import java.sql.Timestamp
    val src = tempDir("funnel_stream_src")
    val state = tempDir("funnel_stream_state")
    val ckpt = tempDir("funnel_stream_ckpt")
    val steps = Seq("view", "click", "purchase")
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 converts ACROSS the two batches (view+click in batch 1,
    // purchase in batch 2); user 2 stalls at level 2
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (2L, ts("2024-01-01 09:00:00"), "view"))
    val b2 = Seq(
      (1L, ts("2024-01-01 10:20:00"), "purchase"),
      (2L, ts("2024-01-01 09:30:00"), "click"))
    def writeBatch(r: Seq[(Long, Timestamp, String)]): Unit =
      r.toDF("user_id", "ts", "event_type").coalesce(1)
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING")
        .parquet(src)
      val q = RollupStream.maintainFunnelSink(stream, state,
        Seq("user_id"), "ts", "event_type", steps)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(120000)
    }
    writeBatch(b1); runOnce()
    writeBatch(b2); runOnce()
    val streamed = RollupStream.readFinalizedFunnel(spark, state,
      Seq("user_id"), steps, windowSec = 3600)
      .as[(Long, Int)].collect().toMap
    assert(streamed == Map(1L -> 3, 2L -> 2))
    val oneShot = graft.operators.Funnel.windowFunnel(
      (b1 ++ b2).toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, windowSec = 3600)
      .as[(Long, Int)].collect().toMap
    assert(streamed == oneShot)
    // replaying the last batch is a no-op (set union is idempotent)
    RollupStream.mergeFunnelBatch(b2.toDF("user_id", "ts", "event_type"),
      state, Seq("user_id"), "ts", "event_type", steps, batchId = 1L)
    val replayed = RollupStream.readFinalizedFunnel(spark, state,
      Seq("user_id"), steps, windowSec = 3600)
      .as[(Long, Int)].collect().toMap
    assert(replayed == streamed)
  }

  test("streamed topK-state maintenance converges to the one-shot " +
    "exact counts below saturation; replaying the last batch is a " +
    "no-op (generation overwrite, not merge idempotency)") {
    val src = tempDir("topk_stream_src")
    val state = tempDir("topk_stream_state")
    val ckpt = tempDir("topk_stream_ckpt")
    // duplicates straddle the micro-batches
    val b1 = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("h", "z"))
    val b2 = Seq(("g", "a"), ("g", "b"), ("g", "c"))
    def writeBatch(r: Seq[(String, String)]): Unit =
      r.toDF("g", "item").coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("g STRING, item STRING").parquet(src)
      val q = RollupStream.maintainTopKSink(stream, state, Seq("g"),
        "item", k = 8)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(120000)
    }
    writeBatch(b1); runOnce()
    writeBatch(b2); runOnce()
    def readTop: Set[(String, String, Long)] =
      RollupStream.readFinalizedTopK(spark, state, Seq("g"), n = 10)
        .select($"g", $"item", $"cnt").as[(String, String, Long)]
        .collect().toSet
    val streamed = readTop
    assert(streamed == Set(("g", "a", 3L), ("g", "b", 2L),
      ("g", "c", 1L), ("h", "z", 1L)))
    // replay of the final batchId overwrites its own generation
    RollupStream.mergeTopKBatch(b2.toDF("g", "item"), state, Seq("g"),
      "item", k = 8, batchId = 1L)
    assert(readTop == streamed)
  }

  test("streamed CM-state maintenance equals the one-shot grid; point " +
    "probes see every batch; replaying the last batch is a no-op") {
    val src = tempDir("cm_stream_src")
    val state = tempDir("cm_stream_state")
    val ckpt = tempDir("cm_stream_ckpt")
    val b1 = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("h", "z"))
    val b2 = Seq(("g", "a"), ("g", "c"), ("h", "z"))
    def writeBatch(r: Seq[(String, String)]): Unit =
      r.toDF("g", "term").coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("g STRING, term STRING").parquet(src)
      val q = RollupStream.maintainCmSink(stream, state, Seq("g"),
        "term", depth = 3, width = 64)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(120000)
    }
    writeBatch(b1); runOnce()
    writeBatch(b2); runOnce()
    val probe = Seq("a", "b", "c", "z").toDF("term")
    def readEst: Map[(String, String), Long] =
      RollupStream.readFinalizedCm(spark, state, Seq("g"), probe, "term",
        depth = 3, width = 64)
        .as[(String, String, Long)].collect()
        .map { case (g, t, e) => (g, t) -> e }.toMap
    val streamed = readEst
    // 4 keys in 64 cells: estimates are exact here, and the streamed
    // grid must equal the one-shot grid over the union of batches
    val oneShot = graft.pipeline.Rollup.aggregateCmState(
      (b1 ++ b2).toDF("g", "term"), Seq("g"), $"term", 3, 64)
    val oneShotEst = graft.pipeline.Rollup.finalizeCm(oneShot, Seq("g"),
      probe, "term", 3, 64)
      .as[(String, String, Long)].collect()
      .map { case (g, t, e) => (g, t) -> e }.toMap
    assert(streamed == oneShotEst)
    assert(streamed(("g", "a")) == 3L && streamed(("h", "z")) == 2L &&
      streamed(("h", "a")) == 0L)
    // replay: same batchId re-lands its own generation, counts unchanged
    RollupStream.mergeCmBatch(b2.toDF("g", "term"), state, Seq("g"),
      "term", depth = 3, width = 64, batchId = 1L)
    assert(readEst == streamed)
  }

  test("streamed quantile-grid maintenance equals the one-shot grid; " +
      "brackets see every batch; replaying the last batch is a no-op") {
    val src = tempDir("q_stream_src")
    val state = tempDir("q_stream_state")
    val ckpt = tempDir("q_stream_ckpt")
    val b1 = (1 to 40).map(v => ("g", v.toDouble))
    val b2 = (41 to 100).map(v => ("g", v.toDouble)) :+ ("g", -3.0)
    val (lo, res, nb) = (0.0, 10.0, 10)
    def writeBatch(r: Seq[(String, Double)]): Unit =
      r.toDF("g", "v").coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("g STRING, v DOUBLE").parquet(src)
      val q = RollupStream.maintainQuantileSink(stream, state, Seq("g"),
        "v", lo, res, nb)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(120000)
    }
    writeBatch(b1); runOnce()
    writeBatch(b2); runOnce()
    def readQ: Seq[(String, Long, Double, Option[Double], Option[Double])] =
      RollupStream.readFinalizedQuantile(spark, state, Seq("g"),
        Seq(0.5, 0.9), lo, res, nb)
        .as[(String, Long, Double, Option[Double], Option[Double])]
        .collect().sortBy(_._3).toSeq
    val streamed = readQ
    val oneShot = graft.pipeline.Rollup.finalizeQuantile(
      graft.pipeline.Rollup.aggregateQuantileState(
        (b1 ++ b2).toDF("g", "v"), Seq("g"), $"v", lo, res, nb),
      Seq("g"), Seq(0.5, 0.9), lo, res, nb)
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect().sortBy(_._3).toSeq
    assert(streamed == oneShot)
    // 101 values (-3, 1..100): p50 rank 51 → value 50 → bucket [50,60)
    assert(streamed.head == (("g", 5L, 0.5, Some(50.0), Some(60.0))))
    // replay: same batchId re-lands its own generation, state unchanged
    RollupStream.mergeQuantileBatch(b2.toDF("g", "v"), state, Seq("g"),
      "v", lo, res, nb, batchId = 1L)
    assert(readQ == streamed)
  }

  test("keepGenerations < 2 is rejected: pruning the immediate " +
    "predecessor would break replay idempotency") {
    val state = tempDir("rollup_keep_guard")
    val b = rows(0 until 10).toDF("g", "v", "u")
    intercept[IllegalArgumentException] {
      RollupStream.mergeBatch(b, state, keys, "v", "u", K,
        batchId = 0L, keepGenerations = 1)
    }
    intercept[IllegalArgumentException] {
      RollupStream.maintainSink(b, state, keys, "v", "u", K,
        keepGenerations = 1)
    }
  }

  test("reading an empty state path fails actionably") {
    val e = intercept[IllegalStateException] {
      RollupStream.readFinalized(spark, tempDir("rollup_empty"), keys, K)
    }
    assert(e.getMessage.contains("no committed generation"))
  }
}
