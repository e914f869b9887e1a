package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators._

/** The training-data tier end to end: one driver program that takes a
  * raw document corpus to training-ready artifacts, every stage an
  * operator this library ships and tests individually:
  *
  *   1. quality gate (`Quality.clean`) — map-only scan
  *   2. PII scrub (`TextFunctions.scrubPii`) — map-only
  *   3. line-level boilerplate removal (`LineDedup`) — 1 line-key shuffle
  *   4. document near-dup removal: MinHash-LSH pairs → connected
  *      components → keep each cluster's canonical (min-id) doc
  *   5. eval-set decontamination (`Contamination.overlapPrefiltered`
  *      anti-join — broadcast-bloom prefilter, exact verify)
  *   6. train/val/test split (`Sampling.splitLabel`) — map-only
  *   7. shuffle-then-pack per language (`Packing.packBins`)
  *   8. mixture stats + τ-flattening rates (`Profile`)
  *
  * Outputs: the corpus (partitioned by split), the packing manifest, and
  * the mixture table. Per-stage row counts are returned so operators
  * (human or scheduler) can alert on anomalous drop rates — the
  * observability a production corpus build needs.
  *
  * Stage order matters and is the standard one: line-level cleanup
  * changes document text, so it runs BEFORE document fingerprinting;
  * decontamination runs on the deduped corpus (fewer docs to shingle);
  * packing runs last, on final surviving text.
  */
object CorpusBuildJob {

  final case class StageCounts(raw: Long, afterQuality: Long,
                               afterLineDedup: Long, afterDocDedup: Long,
                               afterDecontamination: Long, train: Long,
                               eval_ : Long)

  /** @param evalPredicate rows of `docs` that are the held-out eval set
    *                      (they skip the pipeline and are written
    *                      separately; training docs are cleaned against
    *                      them)
    */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
          evalPredicate: org.apache.spark.sql.Column,
          thresholds: Quality.Thresholds = Quality.Thresholds(),
          shingleN: Int = 5, bands: Int = 8, rowsPerBand: Int = 2,
          lineChunk: Int = 10, maxLineDocs: Int = 2,
          minContainment: Double = 0.2, budget: Int = 2048,
          seed: String = "s42"): StageCounts = {
    val raw = docs.count()
    val eval_ = docs.filter(evalPredicate).persist()
    val train0 = docs.filter(!evalPredicate)

    // 1+2: quality gate, then PII scrub on survivors (scrub before any
    // fingerprinting so near-dup detection sees the text users will see)
    val gated = Quality.clean(train0, "doc_id", "text", thresholds)
    val scrubbed = gated.withColumn("text",
      TextFunctions.scrubPii(col("text")))
    val afterQuality = scrubbed.count()

    // 3: line-level boilerplate removal; docs left with no content drop
    val lines = LineDedup.dedupLines(scrubbed, "doc_id",
      TextFunctions.wordChunks(col("text"), lineChunk), maxLineDocs)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
    val relined = scrubbed.drop("text")
      .join(lines, Seq("doc_id"))
      .persist()
    val afterLineDedup = relined.count()

    // 4: document-level near-dup clusters; each cluster keeps its
    // canonical (min-id) member
    val pairs = Dedup.minHashLshPairs(relined, "doc_id", "text",
      shingleN, bands, rowsPerBand)
    val labels = DedupCluster.components(relined, "doc_id", pairs)
    val deduped = relined.join(
      labels.filter(col("id") === col("cluster_id"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi").persist()
    labels.unpersist(blocking = false)
    val afterDocDedup = deduped.count()

    // 5: decontamination against the eval set — through the broadcast
    // bloom prefilter, so at corpus scale only documents that might
    // share a shingle with the eval set ever reach the exact
    // containment join (identical result: no false negatives)
    val together = deduped.select(col("doc_id"), col("text"), lit(false).as("is_eval"))
      .unionByName(eval_.select(col("doc_id"), col("text"), lit(true).as("is_eval")))
    val flagged = Contamination.overlapPrefiltered(together, "doc_id", "text",
      shingleN, col("is_eval"), minContainment)
      .select(col("train_id").as("doc_id")).distinct()
    val decontaminated = deduped.join(flagged, Seq("doc_id"), "left_anti")
      .persist()
    val afterDecontamination = decontaminated.count()

    // 6: split assignment (train/val/test), membership-stable
    val withSplit = decontaminated.withColumn("split",
      Sampling.splitLabel(col("doc_id"), 16, 32))

    // 7: shuffle-then-pack the training split per language
    val manifest = Packing.packBins(
      withSplit.filter(col("split") === "train"), "doc_id", "lang",
      TextFunctions.tokenCount(col("text")), budget,
      Seq(Sampling.shuffleKey(col("doc_id"), seed), col("doc_id")))

    // 8: mixture table with τ=0.5 flattening rates
    val mix = Profile.temperatureRates(
      Profile.mixSummary(withSplit.filter(col("split") === "train"),
        "lang", TextFunctions.tokenCount(col("text")))
        .select("lang", "n_tokens"),
      "lang", "n_tokens", tau = 0.5)

    withSplit.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    eval_.write.mode("overwrite").parquet(s"$outDir/eval")
    manifest.write.mode("overwrite").parquet(s"$outDir/pack_manifest")
    mix.write.mode("overwrite").parquet(s"$outDir/mixture")

    val trainN = spark.read.parquet(s"$outDir/corpus")
      .filter(col("split") === "train").count()
    val evalN = eval_.count()
    relined.unpersist(blocking = false)
    deduped.unpersist(blocking = false)
    decontaminated.unpersist(blocking = false)
    eval_.unpersist(blocking = false)
    StageCounts(raw, afterQuality, afterLineDedup, afterDocDedup,
      afterDecontamination, trainN, evalN)
  }
}
