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
