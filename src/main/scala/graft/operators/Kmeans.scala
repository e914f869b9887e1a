package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd k-means with FIXED initial centroids and a FIXED iteration
  * count — the deterministic, oracle-checkable form of the clustering
  * step every vector tier here otherwise delegates to an
  * engine-specific KMeans fit (IVF coarse cells, PQ codebooks,
  * SemDeDup cells). With init and iteration count pinned, the whole
  * training trajectory — assignments AND the centroids they produce —
  * is bit-identical across engines, so `emb_kmeans_fixed` can
  * hash-check the one numeric step the stored-index oracles previously
  * had to treat as opaque.
  *
  * Cross-engine exactness, stage by stage:
  *  - assignment distance is the [[Similarity.withCellDist]] fold
  *    (`-2·dot(v,c) + dot(c,c)`, fused codegen'd sequential double
  *    accumulation — argmin-equivalent to true L2, same tie-break
  *    `(dist, cell)` in both engines);
  *  - centroid update quantizes every coordinate to integer 10⁻⁸
  *    units BEFORE the sum (`floor(x·1e8 + 0.5)` — all-IEEE, exact),
  *    so the per-(cell, dim) reduction is an order-independent
  *    integer sum, and the mean is two IEEE divides
  *    (`sum / count / 1e8`) every engine rounds identically;
  *  - empty cells keep their previous centroid.
  *
  * Scale shape: an iteration is one corpus × k broadcast scan through
  * the fused dot (min_by aggregation, map-side combinable — nothing
  * corpus×k-sized is sorted or shuffled) plus one posexplode →
  * map-side-combinable integer-sum shuffle that carries k·d partial
  * rows per map partition. The k·d means are collected to the driver
  * between iterations (bounded model state, the codebook precedent) —
  * the next broadcast then ships a plain literal frame instead of a
  * grown plan, so iteration lineage never stacks.
  */
object Kmeans {

  /** Coordinate quantum for centroid updates: 10⁻⁸ units. Exact for
    * |x| ≲ 10⁷ and keeps a 10⁹-row cell's per-dim sum inside int64.
    */
  val CoordUnit: Double = 1.0e8

  /** Run `iters` assign/update rounds from `init` (k centroids, any
    * dim); returns the FINAL assignment `(id, cell)` — the update
    * after the last assignment is skipped, matching the unrolled
    * oracle. `init` values should be dyadic (k/2ⁿ) so the seed
    * centroids are exact in float, double, and decimal SQL literals.
    */
  def lloydFixed(vectors: DataFrame, idCol: String, vecCol: String,
                 init: Seq[Seq[Float]], iters: Int): DataFrame = {
    require(iters >= 1 && init.nonEmpty)
    val spark = vectors.sparkSession
    var cents: Seq[(Int, Seq[Double])] =
      init.zipWithIndex.map { case (c, i) => (i, c.map(_.toDouble)) }
    // The update rounds (iters−1 driver collects) run off ONE pinned,
    // fanned-out projection: previously every round re-scanned the
    // corpus from parquet — iters× scans (and, after the Par.fanOut
    // wiring inside corpusCellAssignment, iters× fan-out exchanges) for
    // data that never changes between rounds. Cache the projection once
    // (the standard cached-Lloyd shape — ML's KMeans does the same
    // internally), run the bounded k·d collects against it, release it
    // before returning. The RETURNED final assignment stays a lazy plan
    // over the raw input, exactly as before, so no cache entry or block
    // outlives the call and the caller's action pays one scan.
    val pinned = Par.fanOut(vectors.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"))).persist()
    try {
      for (t <- 1 until iters) {
        val centDf = spark.createDataFrame(cents).toDF("cell", "centroid")
        val m = Similarity.corpusCellAssignment(
            pinned, "cand_id", "cv", centDf)
          .select(col("cell"), posexplode(col("cv")).as(Seq("dim", "x")))
          .select(col("cell"), col("dim"),
            floor(col("x").cast("double") * lit(CoordUnit) + lit(0.5))
              .as("q"))
          .groupBy("cell", "dim")
          .agg((sum(col("q")).cast("double") /
            count(lit(1)).cast("double") / lit(CoordUnit)).as("m"))
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        val byCell = m.groupBy(_._1).map { case (c, rs) =>
          c -> rs.sortBy(_._2).map(_._3).toSeq
        }
        cents = cents.map { case (c, old) => (c, byCell.getOrElse(c, old)) }
      }
    } finally pinned.unpersist(blocking = false)
    val centDf = spark.createDataFrame(cents).toDF("cell", "centroid")
    Similarity.corpusCellAssignment(vectors, idCol, vecCol, centDf)
      .select(col("cand_id").as("id"), col("cell"))
  }
}
