package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Quality}

/** Streaming corpus ingest: the training-data tier's arrival path.
  * Documents stream in (directory source here; Kafka/queue at scale),
  * and every micro-batch runs the same pipeline a batch build runs:
  *
  *   quality gate → minhash-dedup against the STORED signature index
  *   (and within the batch) → append survivors to the corpus, their
  *   signatures to the index.
  *
  * The dedup join is [[Dedup.minHashLshPairsIncremental]] — new×index
  * band rows only, never index×index — so per-batch cost scales with
  * batch size × bucket occupancy, not corpus size: the property that
  * lets ingest keep up while the corpus grows to 100 TB.
  *
  * Exactly-once discipline mirrors [[EventStream.factSink]]: batchId
  * commit markers make replayed micro-batches no-ops; the residual
  * window (a crash between the corpus append and the marker) leaves one
  * batch duplicated, which the NEXT batch's index join would not catch
  * (its signatures were not yet appended) — readers needing a hard
  * guarantee dedup exactly on doc_id at read.
  */
object DocStream {

  /** Fixture `documents` schema for the directory stream source. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docsSchema).parquet(dir)

  /** The quality gate applies unchanged to a stream: `Quality.clean` is
    * a pure per-row filter predicate (no aggregation, no state).
    */
  def qualityFiltered(docs: DataFrame, t: Quality.Thresholds): DataFrame =
    Quality.clean(docs, "doc_id", "text", t)

  /** Ingest sink. `corpusPath` receives surviving documents (parquet
    * append), `indexPath` their minhash signatures — the persistent
    * corpus index the next batch dedups against.
    */
  def ingestSink(docs: DataFrame, corpusPath: String, indexPath: String,
                 thresholds: Quality.Thresholds, shingleN: Int,
                 bands: Int, rowsPerBand: Int): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty &&
            !EventStream.isCommitted(spark, corpusPath, batchId)) {
          ingestBatch(batch, corpusPath, indexPath, thresholds, shingleN,
            bands, rowsPerBand)
          EventStream.markCommitted(spark, corpusPath, batchId)
        }
      }

  /** One micro-batch (also the testable batch-mode entry): returns the
    * number of documents that survived both gates.
    */
  def ingestBatch(batch: DataFrame, corpusPath: String, indexPath: String,
                  thresholds: Quality.Thresholds, shingleN: Int,
                  bands: Int, rowsPerBand: Int): Long = {
    val spark = batch.sparkSession
    val clean = Quality.clean(batch, "doc_id", "text", thresholds)
    // signatures feed the drop decision AND the index append — persist
    // so the batch is shingled once
    val sigs = Dedup.minHashSignatures(clean, "doc_id", "text", shingleN,
      bands * rowsPerBand).persist()
    try {
      val existing = readIndexOrEmpty(spark, indexPath, sigs)
      // the tiny drop-id set feeds both anti-joins; persist it so the
      // index read + incremental band join run once per batch, not twice
      val drops = Dedup.incrementalDropIds(existing, sigs, "doc_id", bands,
        rowsPerBand).persist()
      val kept = clean.join(drops, Seq("doc_id"), "left_anti").persist()
      try {
        val n = kept.count()
        if (n > 0) {
          kept.write.mode("append").parquet(corpusPath)
          sigs.join(drops, Seq("doc_id"), "left_anti")
            .write.mode("append").parquet(indexPath)
        }
        n
      } finally {
        kept.unpersist(blocking = false)
        drops.unpersist(blocking = false)
      }
    } finally sigs.unpersist(blocking = false)
  }

  /** First-batch bootstrap: an index that does not exist yet reads as
    * empty. ONLY the two conditions that mean "nothing written yet"
    * (missing path, or a present-but-empty directory Spark can't infer a
    * schema from) are treated that way — a corrupt index, a wrong-schema
    * index, or a mistyped `indexPath` that resolves to something else
    * must fail loudly, because silently returning empty would disable
    * cross-batch dedup and let duplicates into the corpus.
    */
  private val EmptyIndexConditions =
    Set("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")

  private def readIndexOrEmpty(spark: SparkSession, indexPath: String,
                               like: DataFrame): DataFrame =
    try spark.read.parquet(indexPath)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            EmptyIndexConditions.contains(e.getCondition) =>
        like.filter(lit(false))
    }
}
