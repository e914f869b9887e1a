package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational
import graft.sources.IO

/** The v1 pipeline: staged shard loads + atomic month swap
  * (SURVEY.md §3.3; reference v1/dag:59-104).
  *
  * The reference's five steps — month-truncated watermark, two
  * modulo-predicate shard loads into a staging table, partition
  * discovery from system.parts, per-partition REPLACE, staging teardown
  * — collapse into one Spark job: partition-parallel scan (Spark task
  * splits replace the manual id%2 fan-out), month-inclusive filter, and
  * a dynamic-partition-overwrite write whose commit protocol provides
  * REPLACE PARTITION's atomicity. The staging table ceases to exist.
  *
  * The reference's `partitions[0]` iteration bug (v1/dag:97) and its
  * unordered LIMIT batch cap are deliberately not reproduced (intent
  * over bugs, SURVEY.md §7.4).
  */
object PartitionSwapLoad {

  def run(spark: SparkSession, source: DataFrame, targetPath: String,
          tsCol: String, keyCol: String): DataFrame = {
    val target = IncrementalLoad.readTargetOrEmpty(spark, targetPath, source)
    val wm = Relational.monthWatermark(target, tsCol)
    // F2: inclusive, month-truncated — whole months reload, replaced
    // wholesale by dynamic overwrite (idempotent re-runs).
    val batch = Relational.onOrAfter(source, tsCol, wm.toString)
    IO.writeFact(batch, targetPath, tsCol, keyCol, overwritePartitions = true)
    batch
  }
}
