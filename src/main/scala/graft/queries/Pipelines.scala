package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.pipeline.{IncrementalLoad, PartitionSwapLoad}

/** End-to-end pipeline queries: each runs a whole composed job (write +
  * read-back) inside a scratch directory and returns the final target
  * content, which the DuckDB oracle checks against the equivalent
  * one-shot SQL over the source. This is the strongest correctness form:
  * the oracle sees none of the intermediate machinery, only the contract
  * "after the pipeline, the target equals X".
  */
object Pipelines {

  private def scratch(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.resolve("target").toString
  }

  private val eventCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // v2 flagship (SURVEY.md §3.2): cold start on the first half of the
    // month, then a true incremental run over the full source; final
    // target must equal one lineage-stamped copy of the whole source.
    "pipeline_incremental_e2e" -> ((s, dir) => {
      val src = Tables.load(s, dir, "events")
      val path = scratch("graft_inc")
      val cfg = IncrementalLoad.Config(
        keyCol = "event_id", tsCol = "ts", versionCol = "ts",
        projection = eventCols, sourceName = "superset")
      val firstHalf = src.filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
      IncrementalLoad.run(s, firstHalf, path, cfg) // cold start (epoch wm)
      IncrementalLoad.run(s, src, path, cfg)       // incremental (wm = max of half)
      IncrementalLoad.readDeduped(s, path, "event_id", "ts")
        .drop("month")
        .select("event_id", "ts", "user_id", "event_type", "value", "props", "source")
        .orderBy("event_id")
    }),

    // v1 (SURVEY.md §3.3): month-truncated watermark + whole-month
    // replacement; second run reloads the watermark month idempotently.
    "pipeline_partition_swap_e2e" -> ((s, dir) => {
      val src = Tables.load(s, dir, "events")
      val path = scratch("graft_swap")
      PartitionSwapLoad.run(s, src, path, "ts", "event_id")
      PartitionSwapLoad.run(s, src, path, "ts", "event_id") // idempotent re-run
      s.read.parquet(path).drop("month")
        .select(eventCols.map(col): _*)
        .orderBy("event_id")
    }),

    // Multimodal plumbing, SQL-expressible slice: binary payload size +
    // checksum (the decode stage itself is exercised in the test suite —
    // deterministic stub, no SQL equivalent).
    "multimodal_binary_meta" -> ((s, dir) => {
      val m = Multimodal.attachBinary(Tables.load(s, dir, "documents"),
        "doc_id", "text")
      m.select(col("doc_id"), col("kind"),
        length(col("media")).cast("long").as("n_bytes"),
        sha2(col("media"), 256).as("checksum"))
        .orderBy("doc_id")
    }))

  val oracle: Map[String, String] = Map(
    "pipeline_incremental_e2e" ->
      """SELECT event_id, ts, user_id, event_type, value, props, 'superset' AS source
        |FROM events ORDER BY event_id""".stripMargin,
    "pipeline_partition_swap_e2e" ->
      "SELECT event_id, ts, user_id, event_type, value, props FROM events ORDER BY event_id",
    "multimodal_binary_meta" ->
      """SELECT doc_id, 'application/x-fake' AS kind,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin)
}
