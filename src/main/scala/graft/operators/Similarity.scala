package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding

/** Similarity search over an embedding column (`ArrayType(FloatType)`).
  *
  * Vector math uses higher-order functions (`zip_with` + `aggregate`)
  * with explicit float→double casts: a sequential left-to-right fold,
  * bit-identical to the oracle's per-element SQL sum, and fully inside
  * whole-stage codegen (no UDF, no boxing of the array elements beyond
  * the codegen'd ArrayData access).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * against the full corpus — a map-only scan that parallelizes over
  * corpus partitions. The bucketed path is the IVF/LSH shape: a
  * deterministic sign-bucket over leading dimensions becomes the join
  * key, so each query only scans its bucket (candidate set shrinks
  * ~2^bits) — the 100 TB path, at the cost of approximate recall.
  */
object Similarity {

  /** dot(a, b) in double, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity, rounded for cross-engine determinism. */
  def cosine(a: Column, b: Column, scale: Int = 6): Column =
    Rounding.pround(dot(a, b) / (l2Norm(a) * l2Norm(b)), scale)

  /** Sign-pattern bucket over the first `bits` dimensions — a
    * deterministic LSH family (hyperplanes = coordinate axes). Vectors in
    * the same orthant of the leading subspace share a bucket.
    */
  def signBucket(v: Column, bits: Int): Column =
    (1 to bits).map(i =>
      when(element_at(v, i) >= 0f, lit(1L << (i - 1))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact brute-force top-k: for each query vector, the k nearest
    * corpus vectors by cosine. Query set is broadcast; the corpus scan
    * is embarrassingly parallel. Deterministic ordering: (score desc,
    * candidate id).
    *
    * `scoreFn` defaults to the HOF cosine; pass the fused native
    * expression (graft.functions.CosineSimilarity) for the single-pass
    * codegen'd variant — results are bit-identical.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     scoreFn: (Column, Column) => Column = cosine(_, _)): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", scoreFn(col("qv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** Approximate top-k via sign-bucket LSH: candidates limited to the
    * query's bucket. Same output shape as bruteForceTopK; recall trades
    * against the 2^bits candidate reduction.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, bits: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into nlist cells; each query probes only its
    * nprobe nearest cells. The trained centroids are tiny and broadcast;
    * cell assignment is one map pass, so index build is O(corpus) and
    * each query scans ~corpus×nprobe/nlist candidates. The classic IVF
    * trade: recall rises with nprobe, cost with nprobe/nlist.
    *
    * Deterministic given the seed; recall is validated against
    * bruteForceTopK in SimilaritySpec rather than a SQL oracle (KMeans
    * has no DuckDB equivalent).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int, nprobe: Int,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = corpus.select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val spark = corpus.sparkSession
    val centDf = spark.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq)
      .toDF("cell", "centroid")
    def withCellDist(df: DataFrame, vec: String) =
      df.crossJoin(broadcast(centDf))
        .withColumn("cdist", dot(col(vec), col("centroid")) * -2 +
          aggregate(transform(col("centroid"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, v) => a + v))
        .drop("centroid")
    // Corpus side (the big one): nearest cell via min_by aggregation, NOT
    // a row_number window — the agg gets map-side partial aggregation
    // over the corpus×nlist candidate rows, so nothing corpus×nlist-sized
    // is ever sorted or shuffled; the shuffle carries one pre-reduced row
    // per (partition, doc). struct(cdist, cell) orders lexicographically
    // = (distance, cell) with the same tie-break the window used.
    val corpusCells = withCellDist(
      corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")), "cv")
      .groupBy(col("cand_id"))
      .agg(min_by(struct(col("cell"), col("cv")),
        struct(col("cdist"), col("cell"))).as("best"))
      .select(col("cand_id"), col("best.cell").as("cell"),
        col("best.cv").as("cv"))
    // Query side stays a window: it must keep nprobe > 1 rows per query,
    // and the query set is tiny and broadcast anyway.
    val queryCells = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))
      withCellDist(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv")
        .withColumn("r", row_number().over(w)).filter(col("r") <= nprobe)
        .drop("r", "cdist")
    }
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** Embedding near-duplicate pairs: sign-bucket prefilter (same-bucket
    * candidates only — one equi-join shuffle) then exact cosine
    * threshold. The embedding analogue of MinHash-LSH + verify.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   bits: Int, minCosine: Double): DataFrame = {
    val v = corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"))
    val a = v.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("bucket"))
    val b = v.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosine(col("va"), col("vb")))
      .filter(col("score") >= minCosine)
      .select("id_a", "id_b", "score")
  }
}
