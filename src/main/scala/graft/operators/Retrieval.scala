package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Rounding, TextFunctions}

/** Full-text top-k retrieval over the corpus: BM25 ranking through an
  * inverted term index — the "find training documents like this eval
  * item" / "nearest textual neighbors" workhorse that complements the
  * Jaccard similarity join (set overlap) with a graded relevance score
  * (term frequency saturation × rarity × length normalization).
  *
  * Scale design: the only join is query-terms ⋈ postings on the term —
  * an equi-join through the inverted index, so each query document
  * meets exactly the documents sharing at least one term with it
  * (bounded by posting-list length), never the full corpus. Corpus
  * statistics (N, avgdl) are a one-row broadcast; document frequencies
  * ride the same term key as the postings join. All per-pair state is
  * one partial sum — map-side combinable — and the final top-k is a
  * bounded per-query window. At 100 TB: postings are the exploded
  * corpus (shuffle once on term, or pre-bucket the index table by term
  * via IO.writeBucketedTable and the join is exchange-free), queries
  * are the small side.
  *
  * Determinism contract (the oracle gate): the classic BM25 idf is
  * ln((N-df+0.5)/(df+0.5)+1), and `ln` is the one operation whose
  * low-order bits differ between math libraries. This implementation
  * uses the RATIONAL idf (N-df+0.5)/(df+0.5) — strictly monotone in
  * the classic idf per term, so single-term rankings are identical and
  * rare terms still dominate — keeping every score inside closed-form
  * IEEE +,-,×,÷ arithmetic that is bit-identical in any engine that
  * evaluates the same expression shape. Per-term contributions are
  * summed as DECIMAL(38,12) so the pair score is independent of
  * partition/accumulation order, then rounded (pround) to 4 digits.
  */
object Retrieval {

  /** @param queryPredicate selects the query documents (applied to the
    *        per-(doc,term) frame, so any predicate over idCol works)
    * @param k results per query
    * @param stopTermDf OPT-IN posting-list fan-out guard (0 = off, the
    *        default — dropping terms changes scores, and BM25's idf
    *        already makes ubiquitous terms contribute ≈0): terms in
    *        more than this many documents are excluded from the
    *        postings join entirely, bounding the worst-case candidate
    *        fan-out per query term at `stopTermDf` — the difference
    *        between a stop-word costing ~0 score and costing a
    *        |queries|×df join explosion on a 100 TB corpus
    * @return (query_id, cand_id, score, rank) — rank 1..k by
    *         (score desc, cand_id), candidates sharing ≥1 term only
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryPredicate: Column, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               materialize: Boolean = true,
               stopTermDf: Int = 0): DataFrame = {
    // one row per (doc, distinct term) with its in-doc frequency — the
    // inverted index; feeds postings, query terms, doc lengths, and
    // document frequencies, so persist it across those consumers
    // fanOut: tokenization + the partial agg run at scan parallelism —
    // one task on a single-row-group corpus file
    val tf0 = Par.fanOut(docs)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val tf = if (materialize) tf0.persist() else tf0

    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    // doc lengths are small integers: the double sum inside avg() is
    // exact (< 2^53), so n_docs/avgdl match any engine bit-for-bit
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))

    // the over-cap stop-term set is tiny by definition → broadcast
    // anti-join on both join inputs, no extra corpus-scale shuffle;
    // n_docs/avgdl/dl stay computed over the FULL corpus (the cap
    // bounds candidate generation, it does not redefine the statistics)
    val stop = if (stopTermDf <= 0) None
      else Some(dfreq.filter(col("df") > stopTermDf).select(col("term")))
    def capped(df0: DataFrame): DataFrame =
      stop.fold(df0)(h => df0.join(broadcast(h), Seq("term"), "left_anti"))
    val q = capped(tf.filter(queryPredicate)
      .select(col(idCol).as("query_id"), col("term")))
    val postings = capped(tf.select(col(idCol).as("cand_id"), col("term"),
      col("tf").cast("double").as("tf_c")))

    // same expression shape as the oracle SQL — parenthesization is part
    // of the determinism contract
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val sat = (col("tf_c") * lit(k1 + 1.0)) /
      (col("tf_c") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * (col("dl_c") / col("avgdl"))))
    val contrib = q
      .join(postings, Seq("term"))
      .filter(col("cand_id") =!= col("query_id"))
      .join(dfreq, Seq("term"))
      .join(dl.select(col(idCol).as("cand_id"),
        col("dl").cast("double").as("dl_c")), Seq("cand_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("cand_id"),
        (idf * sat).cast("decimal(38,12)").as("part"))

    val scored = contrib.groupBy("query_id", "cand_id")
      .agg(Rounding.pround(sum("part").cast("double"), 4).as("score"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    val ranked = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
    if (materialize) {
      // same cache discipline as the dedup tier: materialize the small
      // result detached from the plan, then release the pinned index
      val out = Dedup.materializeDetached(ranked)
      tf.unpersist(blocking = false)
      out
    } else ranked
  }

  /** Persist the BM25 index: tokenize/aggregate the corpus ONCE and
    * store (a) the postings — (term, cand_id, tf_c, dl_c) — as a
    * bucketed-by-term table, and (b) the per-term statistics joined
    * with the two corpus scalars. Retrieval then never re-tokenizes
    * the corpus (the PlanAuditSpec pin, mirroring the dedup tier's
    * stored signature index): a query is two joins against stored
    * tables. At 100 TB the index build is the one corpus-scale pass;
    * per-query cost is bounded by posting-list fan-out.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 postingsTable: String, buckets: Int = 32): Unit = {
    val tf = Par.fanOut(docs)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val postings = tf
      .join(dl.withColumnRenamed(idCol, "dl_id"),
        col(idCol) === col("dl_id"))
      .select(col("term"), col(idCol).as("cand_id"),
        col("tf").cast("double").as("tf_c"), col("dl").cast("double").as("dl_c"))
    graft.sources.IO.writeBucketedTable(postings, postingsTable, "term",
      buckets)
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val termStats = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
    graft.sources.IO.writeBucketedTable(termStats, postingsTable + "_terms",
      "term", buckets)
    tf.unpersist(blocking = false)
  }

  /** Top-k retrieval against a stored index: `queryTerms` is the tiny
    * (query_id, term) side (tokenize just the query docs, or raw user
    * terms); the corpus arrives exclusively from the two index tables.
    * Scoring/ranking semantics are identical to [[bm25TopK]] — the
    * oracle row for the indexed form reuses the direct form's SQL
    * verbatim.
    */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession,
                        postingsTable: String, queryTerms: DataFrame,
                        k: Int, k1: Double = 1.2,
                        b: Double = 0.75): DataFrame = {
    val postings = spark.table(postingsTable)
    val terms = spark.table(postingsTable + "_terms")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val sat = (col("tf_c") * lit(k1 + 1.0)) /
      (col("tf_c") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * (col("dl_c") / col("avgdl"))))
    val contrib = queryTerms
      .join(postings, Seq("term"))
      .filter(col("cand_id") =!= col("query_id"))
      .join(terms, Seq("term"))
      .select(col("query_id"), col("cand_id"),
        (idf * sat).cast("decimal(38,12)").as("part"))
    val scored = contrib.groupBy("query_id", "cand_id")
      .agg(Rounding.pround(sum("part").cast("double"), 4).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** Distinct (query_id, term) rows for a set of query documents —
    * the query side of [[bm25TopKFromIndex]].
    */
  def queryTerms(docs: DataFrame, idCol: String, textCol: String,
                 queryPredicate: Column): DataFrame =
    docs.filter(queryPredicate)
      .select(col(idCol).as("query_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("term"))

  /** Reciprocal-rank fusion of two rankers — the standard hybrid-
    * retrieval combiner (Cormack et al., SIGIR'09): sparse BM25 and a
    * dense embedding ranker each contribute `1/(k0 + rank)` and the
    * fused score needs no score calibration between systems, only the
    * ranks. `k0` (classically 60) damps the head so a single system's
    * #1 can't drown agreement deeper in the lists.
    *
    * Inputs are two `(query_id, cand_id, .., rank)` frames (any extra
    * columns ignored). A candidate surfaced by only one ranker keeps
    * its one contribution (full-outer join) — the fusion can promote
    * BOTH agreement and a strong single-system hit.
    *
    * Determinism: the two contributions are combined by one `+` of
    * coalesced doubles — commutative, so no accumulation-order hazard —
    * and every term is closed-form IEEE arithmetic replicated verbatim
    * in the oracle SQL. Scale: both inputs are k-bounded per query
    * (tiny relative to the corpora that produced them); the fusion join
    * keys on (query_id, cand_id) and never touches corpus-scale data.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    def contrib(df: DataFrame, as: String): DataFrame =
      df.select(col("query_id"), col("cand_id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))).as(as))
    val fused = contrib(a, "ca")
      .join(contrib(b, "cb"), Seq("query_id", "cand_id"), "full_outer")
      .withColumn("score", Rounding.pround(
        coalesce(col("ca"), lit(0.0)) + coalesce(col("cb"), lit(0.0)), 9))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }
}
