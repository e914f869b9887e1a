package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.IO

/** The engine's flagship job: the v2 `upload_data` incremental load
  * (SURVEY.md §3.2; reference v2/dag:98-122), generalized.
  *
  * One logical plan per run:
  *   watermark(target) → filter source newer-than → project → lineage
  *   literal → null-repair → keep-latest dedup → month-partitioned,
  *   shard-keyed, sorted write with dynamic partition overwrite.
  *
  * The reference runs this per table (logs/ab_user/dashboards) with
  * `(table, refresh_field)` parameters (v2/dag:157-168); `Config` is the
  * typed replacement for its `{{ params.* }}` string templating.
  *
  * Scale: the watermark is the only driver-side value; everything else is
  * one distributed plan — the incremental filter pushes to the source
  * scan, the dedup window and the write share the shard-key exchange, and
  * dynamic overwrite touches only the months present in the batch.
  */
object IncrementalLoad {

  /** Typed job parameters (replaces op:36-43 textual templating). */
  final case class Config(
      keyCol: String,          // dedup + shard key ("id")
      tsCol: String,           // watermark + partition column ("dttm")
      versionCol: String,      // dedup freshness column ("changed_on")
      projection: Seq[String], // P1 explicit column list
      sourceName: String,      // P2 lineage literal; "" to skip
      defaults: Map[String, Any] = Map.empty, // §1.4 null repair
      monthTruncatedWatermark: Boolean = false) // v1 (F2) vs v2 (F1)

  /** One incremental run: returns the batch that was written. */
  def run(spark: SparkSession, source: DataFrame, targetPath: String,
          cfg: Config): DataFrame = {
    val target = readTargetOrEmpty(spark, targetPath, source)
    val wm =
      if (cfg.monthTruncatedWatermark) Relational.monthWatermark(target, cfg.tsCol)
      else Relational.watermark(target, cfg.tsCol)
    val incremental =
      if (cfg.monthTruncatedWatermark)
        Relational.onOrAfter(source, cfg.tsCol, wm.toString)
      else Relational.newerThan(source, cfg.tsCol, wm.toString)
    val projected = Relational.project(incremental, cfg.projection)
    val withSource =
      if (cfg.sourceName.nonEmpty) Relational.withLineage(projected, cfg.sourceName)
      else projected
    val repaired = graft.schema.Schemas.applyDefaults(withSource, cfg.defaults)
    val deduped = Relational.dedupLatest(repaired, Seq(cfg.keyCol), cfg.versionCol)
    // v2 (strict watermark): batches are disjoint → append, duplicates
    // across batches resolved ReplacingMergeTree-style at read
    // (readDeduped). v1 (month watermark): whole months reload → dynamic
    // partition overwrite makes the re-load idempotent.
    IO.writeFact(deduped, targetPath, cfg.tsCol, cfg.keyCol,
      overwritePartitions = cfg.monthTruncatedWatermark)
    deduped
  }

  /** Read the target with ReplacingMergeTree read-side semantics: the
    * storage may hold multiple versions of a key (append path); the
    * query view collapses to the latest (A4).
    */
  def readDeduped(spark: SparkSession, path: String, keyCol: String,
                  versionCol: String): DataFrame =
    Relational.dedupLatest(spark.read.parquet(path), Seq(keyCol), versionCol)

  /** Cold start: missing/empty target reads as an empty frame with the
    * source's schema, so the watermark falls back to the 2000-01-01 epoch
    * (v2/dag:113-114).
    */
  def readTargetOrEmpty(spark: SparkSession, path: String,
                        like: DataFrame): DataFrame =
    try {
      val df = spark.read.parquet(path)
      df.drop("month")
    } catch {
      // Missing path surfaces as AnalysisException(PATH_NOT_FOUND) or, on
      // some Spark builds, a raw FileNotFoundException from the streaming-
      // sink metadata probe that runs before path resolution.
      case _: org.apache.spark.sql.AnalysisException =>
        like.filter(lit(false))
      case _: java.io.FileNotFoundException =>
        like.filter(lit(false))
    }
}
