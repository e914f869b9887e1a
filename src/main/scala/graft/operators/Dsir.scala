package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Rounding, TextFunctions}

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): pick pretraining documents whose
  * hashed n-gram distribution looks like a TARGET corpus (the quality
  * domain you want more of) rather than the RAW crawl they came from.
  *
  * The arc: (1) featurize every document as hashed unigram+bigram
  * counts over `dim` buckets (the hashing trick — no vocabulary);
  * (2) fit two smoothed bag-of-words models over those buckets, one on
  * the target corpus, one on the raw corpus; (3) score each raw
  * document with the log importance weight
  * `log w(x) = Σ_gram (log p_target(b(gram)) − log p_raw(b(gram)))`;
  * (4) draw the selection by Gumbel top-n over the weights — a
  * without-replacement sample ∝ w(x), not a hard top-n, so the
  * selected set keeps raw-corpus diversity instead of collapsing onto
  * the single most target-like mode.
  *
  * Scale shape: featurization is explode + map-side-combinable counts
  * (the [[TextEmbedding.hashedEmbeddings]] discipline); each model is
  * one `dim`-row aggregate that BROADCASTS; scoring is a map-side
  * broadcast join + one decimal-exact per-doc sum; selection is a
  * TakeOrdered top-n (per-partition heaps — no global sort). Nothing
  * corpus-scale ever shuffles except the one per-doc aggregation.
  *
  * Cross-engine determinism: bucket hashing rides the md5 idiom the
  * sampling tier oracle-matches; per-gram log-probs round to 9 digits
  * and sum as DECIMAL(38,12) (the LanguageModel discipline — sums are
  * partition-order independent); the Gumbel noise derives from the
  * same md5 uniform as [[Sampling.weightedPriority]], so the "random"
  * draw replays byte-identically on any engine.
  */
object Dsir {

  /** (id, gram) rows: whitespace unigrams plus adjacent-pair bigrams
    * ("w1 w2") — the paper's feature space. No length filtering: both
    * engines hash the identical gram stream, empties included, so the
    * models agree without a filter-semantics contract.
    */
  private def grams(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val ws = col("ws")
    // guard: sequence(1, size-1) DESCENDS when size < 2 (Spark yields
    // [1, 0]) — the `when` keeps token-free docs at unigrams only
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    // fanOut: tokenize + gram explode + the downstream md5 bucket hash
    // run at scan parallelism — one task on a single-row-group file
    Par.fanOut(docs)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("ws"))
      .select(col(idCol), explode(concat(ws, bigrams)).as("gram"))
  }

  /** md5 bucket of a gram — first 8 hex chars as an unsigned 32-bit
    * value mod `dim` (the [[TextEmbedding.hashedEmbeddings]] spelling,
    * exact in both engines).
    */
  private def bucket(gram: Column, dim: Int): Column =
    (conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % dim)

  /** The smoothed bucket model over a corpus: one row per bucket in
    * [0, dim) — absent buckets included, so the α floor prices unseen
    * features — with `logp = ln((cnt_b + α) / (T + α·dim))` rounded at
    * 9 digits and carried as DECIMAL(38,12) for exact downstream sums.
    * `dim` rows total: broadcasts anywhere.
    */
  def bucketLogProbs(reference: DataFrame, idCol: String, textCol: String,
                     dim: Int, alpha: Double = 0.5): DataFrame = {
    require(dim >= 2, s"dim >= 2 required: $dim")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    val spark = reference.sparkSession
    val cnts = grams(reference, idCol, textCol)
      .select(bucket(col("gram"), dim).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val dense = spark.range(dim).toDF("bucket")
      .join(cnts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val tot = dense.agg(sum(col("cnt")).cast("double").as("t"))
    dense.crossJoin(broadcast(tot))
      .select(col("bucket"),
        Rounding.pround(
          log((col("cnt").cast("double") + lit(alpha)) /
            (col("t") + lit(alpha * dim))), 9)
          .cast(DecimalType(38, 12)).as("logp"))
  }

  /** Per-document log importance weight of every `corpus` row under
    * target/raw models fit on `target` and `corpus` respectively:
    * (id, n_grams, logw). Higher = more target-like. The two `dim`-row
    * models join as ONE broadcast; the only corpus-scale exchange is
    * the per-doc sum.
    */
  def importanceWeights(corpus: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, dim: Int,
                        alpha: Double = 0.5): DataFrame = {
    val model = bucketLogProbs(target, idCol, textCol, dim, alpha)
      .withColumnRenamed("logp", "logp_t")
      .join(bucketLogProbs(corpus, idCol, textCol, dim, alpha)
        .withColumnRenamed("logp", "logp_r"), Seq("bucket"))
    grams(corpus, idCol, textCol)
      .select(col(idCol), bucket(col("gram"), dim).as("bucket"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("logp_t")).as("st"), sum(col("logp_r")).as("sr"))
      .withColumn("logw",
        Rounding.pround((col("st") - col("sr")).cast("double"), 6))
      .select(col(idCol), col("n_grams"), col("logw"))
  }

  /** Gumbel top-n selection over the importance weights — the paper's
    * resampling step, derandomized: `key = logw + g(id)` with
    * `g = −ln(−ln(u))` and `u` the md5-derived uniform in (0, 1), so
    * the top-n keys ARE a without-replacement draw with probability
    * ∝ w(x), reproducible on any engine for the same seed. Returns
    * (id, logw, key), key-descending.
    */
  def resample(corpus: DataFrame, idCol: String, textCol: String,
               target: DataFrame, dim: Int, n: Int, seed: String,
               alpha: Double = 0.5): DataFrame = {
    val x = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 8),
      16, 10).cast("double")
    // (x+0.5)/2^32 ∈ (0,1) strictly — both log applications stay finite
    val u = (x + lit(0.5)) / lit(4294967296.0)
    val gumbel = Rounding.pround(-log(-log(u)), 9)
    importanceWeights(corpus, idCol, textCol, target, dim, alpha)
      .withColumn("key", col("logw") + gumbel)
      .orderBy(col("key").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col("logw"), col("key"))
  }
}
