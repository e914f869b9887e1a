package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling: one pass over the table producing per-column
  * completeness and cardinality stats in long format (column, n_rows,
  * n_nulls, n_distinct, min/max as strings). The ingest-time health
  * check the reference performs implicitly via NOT NULL + DEFAULT DDL;
  * here it is an explicit, queryable operator.
  *
  * Single aggregation job: all per-column expressions evaluate in one
  * scan (no per-column passes), then the wide row is unpivoted with
  * `stack` — at 100 TB this is exactly one read of the table.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.filter(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
        f.dataType.typeName == "timestamp")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1).otherwise(0)).as(s"${f.name}__nulls"),
        countDistinct(col(f.name)).as(s"${f.name}__distinct"),
        min(col(f.name)).cast("string").as(s"${f.name}__min"),
        max(col(f.name)).cast("string").as(s"${f.name}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(f =>
      s"'${f.name}', `${f.name}__nulls`, `${f.name}__distinct`, " +
        s"`${f.name}__min`, `${f.name}__max`").mkString(", ")
    wide.selectExpr("__n AS n_rows",
      s"stack(${cols.length}, $stackExpr) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
      .select("column_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value")
  }

  /** Temperature-flattened mixture rates (the multilingual τ-sampling
    * rule): target probability p_g ∝ share_g^τ — τ=1 keeps the natural
    * mix, τ=0 is uniform, 0<τ<1 upweights small groups. `keep_rate` is
    * the per-group single-pass downsampling rate that realizes the
    * target mix ((p_g/share_g) scaled so the most-boosted group keeps
    * everything); feed it to `Sampling.stratifiedSample` as
    * `floor(rate*256)` gates. Input is any per-group token aggregate
    * (e.g. [[mixSummary]] output); both normalizers are tiny
    * single-row aggregates broadcast back.
    */
  def temperatureRates(mix: DataFrame, groupCol: String, tokensCol: String,
                       tau: Double): DataFrame = {
    import graft.functions.Rounding.pround
    // a zero-token group would make p_raw/share = 0/0 = NaN, and NaN
    // sorts largest in max() — poisoning every group's keep_rate; an
    // empty group has nothing to sample, so it is dropped up front
    val nonEmpty = mix.filter(col(tokensCol) > 0)
    val tot = nonEmpty.agg(sum(col(tokensCol)).cast("double").as("total"))
    val s = nonEmpty.crossJoin(broadcast(tot))
      .withColumn("share", col(tokensCol).cast("double") / col("total"))
      .withColumn("p_raw", pow(col("share"), tau))
    val z = s.agg(sum("p_raw").as("z"),
      max(col("p_raw") / col("share")).as("max_boost"))
    s.crossJoin(broadcast(z))
      .select(col(groupCol), col(tokensCol),
        pround(col("share"), 6).as("share"),
        pround(col("p_raw") / col("z"), 6).as("p_tau"),
        pround((col("p_raw") / col("share")) / col("max_boost"), 6)
          .as("keep_rate"))
  }

  /** Quality-binned curriculum mixture: map-side bin assignment by
    * caller-supplied score edges, then the per-bin doc/token mass
    * table a quality-curriculum sampler reads ([[temperatureRates]]
    * runs on it with groupCol = "bin" to get per-bin keep rates —
    * downsample the junk bins, keep the top bins whole).
    *
    * Edges come from the percentile machinery at scale (the t-digest
    * sketch / doc_len_percentiles) — equal-mass bins WITHOUT the
    * global `ntile` sort that would single-partition the corpus; bin
    * assignment itself is a codegen'd CASE chain, zero shuffles beyond
    * the final tiny per-bin aggregate. Bin i covers
    * `[edges(i-1), edges(i))`; scores below `edges.head` land in bin
    * 0, at/above `edges.last` in bin `edges.size`.
    */
  def scoreBinnedMix(docs: DataFrame, score: Column, edges: Seq[Double],
                     tokens: Column): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted &&
      edges.distinct.size == edges.size,
      s"edges must be non-empty and strictly increasing: $edges")
    val bin = edges.zipWithIndex
      .foldRight(lit(edges.size).cast("int"): Column) {
        case ((e, i), acc) => when(score < e, lit(i).cast("int"))
          .otherwise(acc)
      }
    val per = docs.select(bin.as("bin"), tokens.as("__t"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
    val totals = per.agg(sum("n_tokens").cast("double").as("total_tokens"))
    per.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_docs"), col("n_tokens"),
        graft.functions.Rounding.pround(
          col("n_tokens").cast("double") / col("total_tokens"), 6)
          .as("token_share"))
  }

  /** Per-group token-distribution drift against the whole corpus:
    * KL(P_group ‖ P_corpus) in nats — the mixture-QA number that flags
    * a source/language whose unigram distribution has wandered from
    * the blend (pipeline drift, a bad crawl batch, template flooding).
    * Always ≥ 0; 0 means the group is distributionally identical.
    *
    * Exactness discipline is [[LanguageModel.crossEntropy]]'s: the
    * per-occurrence log term `ln((c_gw·N)/(N_g·c_w))` rounds at 1e-9
    * (`pround` absorbs sub-ulp engine differences in `ln`), is summed
    * as DECIMAL(38,12) — exact, order-independent — and only the final
    * per-group mean rounds at 1e-6. The ratio's cross-products stay
    * below 2⁵³ for corpora up to ~10⁹ tokens per count; beyond that
    * the number is still deterministic per engine, just not
    * bit-promised against a replica.
    *
    * Scale shape: token explode → three map-side-combinable count
    * aggregates (per (g,w), per w, per g) → the occurrence stream
    * re-joined on its word key (hot words hash-join fine; the
    * per-group and grand totals broadcast). One corpus scan plus one
    * word-keyed shuffle — the text_perplexity cost profile.
    */
  def klDrift(docs: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    import graft.functions.Rounding.pround
    import org.apache.spark.sql.types.DecimalType
    val tok = docs.select(col(groupCol).as("g"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
    val cgw = tok.groupBy("g", "w").agg(count(lit(1)).as("cgw"))
    val cw = cgw.groupBy("w").agg(sum("cgw").as("cw"))
    val ng = cgw.groupBy("g").agg(sum("cgw").as("ng"))
    val n = cw.agg(sum("cw").as("n"))
    val arg = (col("cgw").cast("double") * col("n").cast("double")) /
      (col("ng").cast("double") * col("cw").cast("double"))
    tok.join(cgw, Seq("g", "w"))
      .join(cw, Seq("w"))
      .join(broadcast(ng), Seq("g"))
      .crossJoin(broadcast(n))
      .withColumn("l9", pround(log(arg), 9).cast(DecimalType(38, 12)))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("l9")).as("s"))
      .select(col(groupCol), col("n_tokens"),
        pround(col("s").cast("double") / col("n_tokens"), 6).as("kl"))
  }

  /** Corpus mix planning: per-group document/token totals, each group's
    * share of the token budget, and the sampling weight that would flatten
    * the mix to uniform (weight > 1 = upsample, < 1 = downsample) — the
    * numbers a data-mixture config is written from. Two tiny aggregates
    * (per-group, then grand total broadcast back); one scan of the corpus.
    */
  def mixSummary(docs: DataFrame, groupCol: String, tokens: Column): DataFrame = {
    val per = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))
    val totals = per.agg(sum("n_tokens").as("total_tokens"),
      count(lit(1)).as("n_groups"))
    per.crossJoin(broadcast(totals))
      .withColumn("token_share", graft.functions.Rounding.pround(
        col("n_tokens").cast("double") / col("total_tokens"), 6))
      .withColumn("uniform_weight", graft.functions.Rounding.pround(
        col("total_tokens").cast("double") / col("n_groups") / col("n_tokens"), 6))
      .select(groupCol, "n_docs", "n_tokens", "token_share", "uniform_weight")
  }

  /** K-Minimum-Values distinct-count QA: per group, the KMV estimate
    * beside the exact distinct count and their relative error — the
    * accuracy report that justifies deploying the O(k)-state sketch
    * ([[graft.functions.KmvDistinct]]) for a cardinality the exact
    * aggregate would shuffle the full distinct set to answer.
    *
    * This declarative twin keys the sketch on md5 (cross-engine-exact,
    * so the estimator arithmetic — k-th-minimum hash → hash-space
    * fraction → (k−1)/frac — is DuckDB-replicable bit-for-bit), unlike
    * the production aggregate's xxhash64. It deliberately PAYS the
    * exact path's distinct shuffle: the row's job is to report sketch
    * accuracy, which needs the exact count anyway, and one distinct
    * frame feeds both sides. Production cardinality estimation at
    * 100 TB uses `KmvDistinct` (k longs per partition, map-side
    * mergeable, no distinct shuffle); this operator is its
    * oracle-checked accuracy meter. Standard error is ~1/√k, so the
    * reported rel_err should sit within a few multiples of that.
    *
    * The k-th minimum is found with row_number ≤ k over the hash order:
    * Spark's WindowGroupLimit prefilters each map partition to its own
    * top-k before the exchange, so the window moves ≤ k rows per task —
    * the distinct() above it dominates, as documented.
    *
    * Numeric contract: frac = first 13 md5 hex chars as an integer
    * (< 2^52, double-exact) / 16^13; estimate = floor((k−1)/frac + 0.5)
    * when k minima were seen (count itself when fewer — the sketch is
    * exact below saturation), frac = 0 guarded to the seen count
    * identically in both engines.
    */
  def kmvEstimate(df: DataFrame, groupCol: String, value: Column,
                  k: Int): DataFrame = {
    require(k >= 16, s"k >= 16 required for a usable estimate, got $k")
    import org.apache.spark.sql.expressions.Window
    val dv = df.select(col(groupCol).as("g"), value.cast("string").as("v"))
      .distinct().persist()
    val exact = dv.groupBy("g").agg(count(lit(1)).as("n_exact"))
    val w = Window.partitionBy("g").orderBy("h")
    val kth = dv.select(col("g"), md5(col("v")).as("h"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
      .groupBy("g").agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth"))
    val frac = conv(substring(col("kth"), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 16^13 = 2^52
    val est = when(col("n_seen") < k || frac <= 0.0, col("n_seen"))
      .otherwise(floor(lit((k - 1).toDouble) / frac + lit(0.5)).cast("long"))
    val out = exact.join(kth, Seq("g"))
      .withColumn("kmv_est", est)
      .select(col("g").as(groupCol), col("n_exact"), col("kmv_est"),
        graft.functions.Rounding.pround(
          abs(col("kmv_est") - col("n_exact")).cast("double") /
            col("n_exact"), 6).as("rel_err"))
    val detached = Dedup.materializeDetached(out)
    dv.unpersist(blocking = false)
    detached
  }
}
