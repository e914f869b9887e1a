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
}
