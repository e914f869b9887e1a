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
  * label frame's lineage is cut — reliable checkpoint when the session
  * has a checkpoint dir, localCheckpoint fallback otherwise — so
  * lineage stays bounded on chain-shaped graphs (the
  * iterative-algorithm hazard at scale), and
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
    val spark = docs.sparkSession
    // Periodic lineage cut: RELIABLE checkpoint when the session has a
    // checkpoint dir (blocks live on reliable storage, survive executor
    // loss, predecessors releasable immediately — the right mode on a
    // cluster); localCheckpoint fallback for single-JVM runs. The
    // fallback stores its data AS executor cache blocks, so unpersisting
    // a localCheckpointed round would delete the only copy that later
    // persist()ed (recomputable-through-lineage) rounds recompute FROM —
    // after an executor loss their recomputation dies on missing
    // checkpoint blocks. The most recent local cut therefore stays
    // `pinned` until the next cut supersedes it.
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().persist()
    var labels = docs.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
      .persist()
    var pinned: DataFrame = null
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
      // round-by-round plan behind it; the periodic cut truncates it.
      // Cut rounds skip persist(): both checkpoint flavors already
      // materialize the data, and persisting on top would register a
      // second full copy with the CacheManager.
      val isCut = (round + 1) % checkpointEvery == 0
      val materialized =
        if (isCut && reliable) Dedup.materializeDetached(step)
        else if (isCut) step.localCheckpoint(false)
        else step.persist()
      val changed = materialized
        .join(labels.withColumnRenamed("cluster_id", "prev"), Seq("id"))
        .filter(col("cluster_id") =!= col("prev")).count()
      if (labels ne pinned) labels.unpersist(blocking = false)
      if (isCut) {
        // the new cut truncates lineage at `materialized`; nothing
        // downstream can reach the previous cut's blocks any more
        if (pinned != null) pinned.unpersist(blocking = false)
        pinned = if (reliable) null else materialized
      }
      labels = materialized
      converged = changed == 0
      round += 1
    }
    edges.unpersist(blocking = false)
    if (pinned == null || (pinned eq labels)) (labels, converged)
    else {
      // The returned frame must not depend on a pin the caller doesn't
      // know about: cut its lineage (streams from labels' still-cached
      // blocks, so no recompute), then release both loop frames. The
      // caller releases the returned frame as documented.
      val out = labels.localCheckpoint(eager = true)
      labels.unpersist(blocking = false)
      pinned.unpersist(blocking = false)
      (out, converged)
    }
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
