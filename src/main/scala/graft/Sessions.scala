package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Locally `cores` is the machine; on a cluster the same settings apply
  * with `shufflePartitions` sized to total executor cores (the
  * reference-scale default of 200 is wrong in both directions). AQE owns
  * runtime re-planning: partition coalescing, skew-join splitting, and
  * broadcast demotion/promotion by observed sizes.
  */
object Sessions {

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = tuned(SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions = cores).getOrCreate()
    // Reliable checkpoint target (operators materializing small results —
    // Dedup/DedupCluster — checkpoint here so they survive executor loss
    // and stay out of the CacheManager). On a cluster, point this at
    // durable shared storage (HDFS/S3) instead of a local tmp dir.
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    s
  }

  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC") // CH DATETIME is TZ-naive
      // runtime bloom-filter pruning: the J2 anti-join reconsistency and
      // big fact-fact joins skip row groups that cannot match
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.files.maxPartitionBytes", s"${256 * 1024 * 1024}")
      .config("spark.sql.ui.explainMode", "formatted")
      .config("spark.ui.enabled", "false")
}
