package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.pipeline.Rollup

/** Streaming materialized-view maintenance — the ClickHouse pattern
  * where a materialized view populates an Aggregating/SummingMergeTree
  * rollup ON INSERT, Spark-first: each micro-batch reduces to its own
  * partial-aggregate state ([[Rollup.aggregateState]]) and folds into
  * the stored rollup with the same reduction ([[Rollup.merge]]) —
  * per-batch cost ∝ |batch| + |keys|, never a base-table rescan. The
  * batch twin is `pipeline_rollup_incremental_e2e`; this is the same
  * merge driven by Structured Streaming.
  *
  * Exactly-once is structural, the [[DocStream]] discipline adapted to
  * a REPLACED (not appended) artifact: each batch writes the merged
  * state to its own `gen=<batchId>` directory, reading the latest
  * COMMITTED generation strictly BEFORE its own id as the merge base.
  * A replayed batch (foreachBatch is at-least-once) recomputes from
  * that same base — its own half-written generation is excluded by the
  * `< batchId` bound, and Structured Streaming only starts batch N+1
  * after N's checkpoint commit, so the base is always the true
  * predecessor. Generations older than `keepGenerations` are pruned
  * after a successful write; the current generation is never touched.
  */
object RollupStream {

  /** AvailableNow maintenance sink over an event stream. */
  def maintainSink(events: DataFrame, statePath: String, keys: Seq[String],
                   valCol: String, distinctCol: String, k: Int,
                   keepGenerations: Int = 3): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, statePath, keys, valCol, distinctCol, k,
          batchId, keepGenerations)
      }

  /** One micro-batch fold (also the testable batch-mode entry).
    * Idempotent in `batchId`: a replay re-reads the same predecessor
    * generation and overwrites its own. */
  def mergeBatch(batch: DataFrame, statePath: String, keys: Seq[String],
                 valCol: String, distinctCol: String, k: Int,
                 batchId: Long, keepGenerations: Int = 3): Unit = {
    val spark = batch.sparkSession
    val inc = Rollup.aggregateState(batch, keys, valCol, distinctCol, k)
    val merged = latestCommittedGen(statePath, before = batchId) match {
      case Some(g) =>
        Rollup.merge(Seq(spark.read.parquet(s"$statePath/gen=$g"), inc),
          keys, k)
      case None => inc
    }
    merged.write.mode("overwrite").parquet(s"$statePath/gen=$batchId")
    prune(statePath, batchId, keepGenerations)
  }

  /** The rollup a reader sees: latest committed state, finalized. */
  def readFinalized(spark: SparkSession, statePath: String,
                    keys: Seq[String], k: Int): DataFrame =
    latestCommittedGen(statePath, before = Long.MaxValue) match {
      case Some(g) => Rollup.finalizeState(
        spark.read.parquet(s"$statePath/gen=$g"), keys, k)
      case None => throw new IllegalStateException(
        s"rollup state at $statePath has no committed generation")
    }

  /** Largest `gen=<id>` directory with a `_SUCCESS` marker and
    * `id < before` — half-written generations (no marker) and the
    * caller's own replayed generation are both excluded. */
  private def latestCommittedGen(statePath: String,
                                 before: Long): Option[Long] = {
    val root = new java.io.File(statePath)
    val kids = Option(root.listFiles()).getOrElse(Array.empty)
    kids.iterator
      .filter(_.isDirectory)
      .flatMap { d =>
        d.getName match {
          case s if s.startsWith("gen=") =>
            scala.util.Try(s.stripPrefix("gen=").toLong).toOption
          case _ => None
        }
      }
      .filter(g => g < before &&
        new java.io.File(root, s"gen=$g/_SUCCESS").exists())
      .reduceOption(_ max _)
  }

  private def prune(statePath: String, current: Long, keep: Int): Unit = {
    val root = new java.io.File(statePath)
    val gens = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("gen="))
      .flatMap(d => scala.util.Try(
        d.getName.stripPrefix("gen=").toLong).toOption)
      .sorted
    gens.dropRight(keep).filter(_ < current).foreach { g =>
      val dir = new java.io.File(root, s"gen=$g")
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      dir.delete()
    }
  }
}
