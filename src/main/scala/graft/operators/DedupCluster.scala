package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup PAIRS (from any detector —
  * Jaccard, MinHash, SimHash, embedding) become duplicate CLUSTERS, and
  * each cluster keeps one canonical document. This is the step that
  * turns pair detection into an actual deduplicated corpus.
  *
  * Connected components by iterative min-label propagation: every doc
  * starts labeled with its own id; each round, a doc adopts the
  * smallest label among itself and its neighbors. Rounds needed =
  * graph diameter — for near-dup graphs that is tiny (dup clusters are
  * cliques or short chains), so the default cap of 10 shuffle rounds
  * covers any realistic corpus; the loop exits early at fixpoint via a
  * cheap count of changed labels. Every `checkpointEvery` rounds the
  * label frame is localCheckpoint'ed so lineage stays bounded on
  * chain-shaped graphs (the iterative-algorithm hazard at scale), and
  * hitting the round budget without convergence raises — silent
  * mislabeling is worse than a loud retry with a higher cap.
  */
object DedupCluster {

  /** @param pairs columns (id_a, id_b) — undirected near-dup edges
    * @param maxRounds round budget; convergence needs component
    *        diameter + 1 rounds (one per hop plus a final zero-change
    *        round that proves the fixpoint), so size it at least one
    *        above the largest expected diameter
    * @return (labels, converged): (doc_id, cluster_id) for every doc in
    *         `docs` (singletons are their own cluster), and whether a
    *         fixpoint was reached within `maxRounds`. The labels frame
    *         is persisted; callers own its unpersist once consumed.
    */
  def componentsWithStatus(docs: DataFrame, idCol: String, pairs: DataFrame,
                           maxRounds: Int = 10,
                           checkpointEvery: Int = 3): (DataFrame, Boolean) = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().persist()
    var labels = docs.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
      .persist()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("id"))
        .agg(min("cluster_id").as("neighbor_min"))
      val step = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"),
            coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
      // bound the lineage: a plain persist still drags the full
      // round-by-round plan behind it; the periodic checkpoint cuts it.
      // Checkpoint rounds skip persist(): localCheckpoint already pins
      // the blocks in executor storage, and persisting on top would
      // register a second full copy with the CacheManager.
      val materialized =
        if ((round + 1) % checkpointEvery == 0) step.localCheckpoint(false)
        else step.persist()
      val changed = materialized
        .join(labels.withColumnRenamed("cluster_id", "prev"), Seq("id"))
        .filter(col("cluster_id") =!= col("prev")).count()
      labels.unpersist(blocking = false)
      labels = materialized
      converged = changed == 0
      round += 1
    }
    edges.unpersist(blocking = false)
    (labels, converged)
  }

  /** As [[componentsWithStatus]], but failing loudly when the round
    * budget is exhausted before fixpoint — labels would be silently
    * wrong for any component with diameter > maxRounds.
    */
  def components(docs: DataFrame, idCol: String, pairs: DataFrame,
                 maxRounds: Int = 10): DataFrame = {
    val (labels, converged) =
      componentsWithStatus(docs, idCol, pairs, maxRounds)
    if (!converged) {
      labels.unpersist(blocking = false)
      throw new IllegalStateException(
        s"DedupCluster.components: no fixpoint after $maxRounds rounds — " +
          "a component has diameter >= maxRounds; raise maxRounds " +
          "(label propagation needs diameter + 1 rounds: one per hop " +
          "plus a final zero-change round to detect the fixpoint)")
    }
    labels
  }

  /** One row per cluster: the canonical doc (min id) + member count.
    * The per-doc labels frame is released here once the (tiny) aggregate
    * is materialized — reliable checkpoint when the session has a
    * checkpoint dir, localCheckpoint fallback for single-JVM runs — so
    * no cache entry outlives the call and the returned plan can never be
    * CacheManager-substituted into a later query.
    */
  def canonicalize(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val labels = components(docs, idCol, pairs)
    val agg = labels
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
      .withColumnRenamed("cluster_id", idCol)
    val out = Dedup.materializeDetached(agg)
    labels.unpersist(blocking = false)
    out
  }
}
