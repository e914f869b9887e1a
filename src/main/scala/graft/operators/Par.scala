package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out (optimization guide §2.5, "input skew:
  * one huge unsplittable file … repartition immediately after the
  * read").
  *
  * The heavy per-row kernels of the text/dedup/vector tier (md5
  * shingle signatures, token explodes, regex quality panels, fused
  * cosine scans) inherit their parallelism from the SCAN. A corpus
  * that arrives as few / non-splittable parquet files (single row
  * group, gzip, a small fixture) therefore runs those kernels on a
  * handful of tasks while the rest of the cluster idles — the
  * round-15 stage breakdown measured the whole minhash signature
  * pipeline serializing on ONE task (2.6 s of a 4.8 s entry) because
  * each fixture table is a single-row-group file Spark cannot split.
  *
  * [[fanOut]] repartitions a scan-side frame up to the cluster's
  * default parallelism ONLY when the plan's native parallelism is
  * below it — derived from the data, not a tuned constant: at 100 TB
  * a corpus scan has thousands of splits, the condition never fires,
  * and the plan is byte-identical to before; on under-split inputs it
  * inserts one round-robin exchange of the raw rows ahead of the
  * expensive projection. Round-robin repartition keeps Spark's
  * sort-before-repartition determinism (retried tasks reproduce the
  * same assignment), and every consumer here is partitioning-agnostic
  * (commutative aggregations, equi-joins, or a final orderBy over a
  * unique key), so results are unchanged.
  *
  * CONTRACT: call on frames with no exchange below them (scans plus
  * map-side work). The partition probe compiles the physical plan; on
  * an exchange-bearing plan under AQE that would materialize upstream
  * stages eagerly, so the helper returns such frames unchanged instead
  * of probing them.
  */
object Par {
  private def target(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange) df // parallelism already set by the upstream shuffle
    else if (df.rdd.getNumPartitions >= target(df)) df
    else df.repartition(target(df))
  }

  /** Unconditional spread for CONTRACT-BOUNDED slices feeding a
    * quadratic broadcast kernel (exact silhouette's ≤ maxEval rows):
    * the frame usually sits below an exchange whose byte-based AQE
    * coalescing packs the few-KB slice into one partition — correct
    * for byte-bound work, serializing for a kernel that does
    * |slice|·|broadcast| fused-cosine work per partition. The slice is
    * bounded by the caller's own guard, so one extra exchange of it is
    * O(bound) at ANY corpus size — this is a statement about the
    * kernel ("spread the quadratic diagnostic across the cluster"),
    * not a local-mode tuning. Do NOT use on corpus-scale frames.
    */
  private[graft] def spread(df: DataFrame): DataFrame =
    df.repartition(target(df))
}
