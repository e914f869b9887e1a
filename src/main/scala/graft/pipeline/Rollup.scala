package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Rounding.pround

/** ClickHouse Summing/AggregatingMergeTree semantics, Spark-first:
  * a stored rollup table holds MERGEABLE partial-aggregate states per
  * key, new batches reduce to their own states and fold in with the
  * same reduction — never a rescan of the base table. The MergeTree
  * family is thereby complete: Replacing (A4 `dedupLatest` +
  * `Retention.optimizeFinal`), Summing/Aggregating (here).
  *
  * State per key: `n` (BIGINT), `sum_v` (exact DECIMAL(38,12) of
  * l9-rounded values — accumulation-order-independent, so distributed
  * merge order can never change a digit), `min_v`/`max_v`, `kmv`
  * (the ≤k smallest md5 hashes of the distinct-counted column — the
  * classic KMV sketch state, mergeable by "k smallest of the union"),
  * and `hll` (the dense m=256 HLL register array — ClickHouse
  * `uniqHLL12`'s AggregatingMergeTree state, mergeable by
  * register-wise MAX). Everything is algebraic or bounded-state: a
  * state row costs O(k + m) regardless of how many rows fed it.
  *
  * Merge associativity/commutativity is by construction: [[merge]] is
  * the SAME groupBy reduction applied to a union of state rows, so
  * build(all) ≡ merge(build(b₁), …, build(bₙ)) for ANY batch split —
  * the property the e2e oracle checks and `RollupSpec` re-checks on
  * adversarial splits.
  *
  * 100 TB shape: batch states reduce map-side (every aggregate here is
  * partial-aggregable); the stored rollup is |keys| rows, so the merge
  * join moves state rows only. The kmv build pre-filters to each key's
  * k smallest hashes with a rank window BEFORE any collection —
  * Spark's WindowGroupLimit pushes that top-k into the map side, so
  * the shuffle carries ≤k hash rows per key, not the key's distinct
  * universe (the same rank-limit pushdown the A4 dedups lean on).
  */
object Rollup {

  /** Reduce a raw batch to one state row per key.
    *
    * Beside the KMV hash list the state carries `hll`: the dense
    * m=256 HLL register array ([[graft.functions.Hll]]) — ClickHouse's
    * `uniqHLL12` AggregatingMergeTree state. Registers build as a
    * map-side-combinable groupBy(key, bucket) MAX(ρ) (≤ m rows per key
    * cross the shuffle) and densify to a fixed 256-int array; state
    * size is constant per key where KMV's is O(k).
    */
  def aggregateState(batch: DataFrame, keys: Seq[String], valCol: String,
                     distinctCol: String, k: Int): DataFrame = {
    require(k >= 16, s"k >= 16 required for a usable KMV estimate, got $k")
    import graft.functions.Hll
    val scalars = batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(pround(col(valCol), 9).cast(DecimalType(38, 12))).as("sum_v"),
        min(col(valCol)).as("min_v"),
        max(col(valCol)).as("max_v"))
    // NULL distinct-column values do not count as a distinct value
    // (SQL count(DISTINCT x) semantics, which is also what the oracle
    // computes). Unfiltered, md5(NULL)=NULL would crash the HLL
    // map_from_entries build and silently occupy KMV top-k slots
    // (NULL sorts first ascending, then collect_list drops it — an
    // undercount). Filter once at the hash source.
    val hashed = batch
      .select(keys.map(col) :+ md5(col(distinctCol).cast("string")).as("__h"): _*)
      .filter(col("__h").isNotNull)
      .distinct()
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"))
    val kmv = hashed
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
    val hll = hashed
      .select(keys.map(col) ++ Seq(Hll.bucket(col("__h")).as("__b"),
        Hll.rho(col("__h")).as("__rho")): _*)
      .groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(max(col("__rho")).as("__m"))
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__m"))))
        .as("__regs"))
      .withColumn("hll",
        transform(sequence(lit(0), lit(Hll.M - 1)),
          i => coalesce(element_at(col("__regs"), i), lit(0))))
      .drop("__regs")
    // LEFT joins with empty defaults: a key whose distinct-counted
    // values are ALL null has no sketch rows at all, but its scalar
    // aggregates must still land (empty KMV list → estimate 0; all-
    // zero registers → linear counting gives 0)
    scalars.join(kmv, keys, "left").join(hll, keys, "left")
      .withColumn("kmv",
        coalesce(col("kmv"), array().cast("array<string>")))
      .withColumn("hll",
        coalesce(col("hll"),
          array_repeat(lit(0), graft.functions.Hll.M)))
  }

  /** Fold state frames into one — the MergeTree background merge as a
    * query. Same reduction as the build, applied to state rows. */
  def merge(states: Seq[DataFrame], keys: Seq[String], k: Int): DataFrame = {
    require(states.nonEmpty, "merge: no states")
    // State-format check with an actionable message: a state frame
    // written by an older build (e.g. pre-`hll`) would otherwise fail
    // deep inside the union/agg — or worse, a sketch column silently
    // treated as empty would UNDERCOUNT. Loud beats wrong.
    val expected = keys ++ Seq("n", "sum_v", "min_v", "max_v", "kmv", "hll")
    states.foreach { s =>
      val missing = expected.filterNot(s.columns.contains)
      require(missing.isEmpty,
        s"rollup state frame is missing column(s) ${missing.mkString(", ")} " +
          "— was it written by an older state format? Rebuild the state " +
          "with aggregateState (a stored sketch cannot be reconstructed " +
          "from finalized aggregates).")
    }
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("kmv"),
        // HLL union = register-wise MAX: fold the collected state
        // arrays with zip_with(greatest) — associative+commutative,
        // so any merge tree yields the same registers
        aggregate(collect_list(col("hll")),
          array_repeat(lit(0), graft.functions.Hll.M),
          (acc, x) => zip_with(acc, x, (a, b) => greatest(a, b)))
          .as("hll"))
  }

  /** Finalize a state into the read-side aggregate row: count, sum,
    * min, max, avg, and the KMV distinct estimate `(k−1)/frac(kth)`
    * (exact `n_seen` below saturation). The estimator arithmetic is
    * the [[graft.operators.Profile.kmvEstimate]] spelling, so the
    * DuckDB replica is shared. */
  def finalizeState(state: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    val kth: Column = element_at(col("kmv"), k)
    val frac = conv(substring(kth, 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 16^13 = 2^52
    val nSeen = size(col("kmv"))
    val est = when(nSeen < k || frac <= 0.0, nSeen.cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) / frac + lit(0.5)).cast("long"))
    // HLL read side: integer-scaled harmonic sum over the register
    // array (deterministic array order — exact), empty-register count
    // for the linear-counting branch
    val sInt = expr("aggregate(hll, CAST(0 AS BIGINT), " +
      "(acc, m) -> acc + CAST(power(2, 53 - m) AS BIGINT))")
    val vEmpty = expr("size(filter(hll, m -> m = 0))")
    state.select(keys.map(col) ++ Seq(
      col("n"),
      pround(col("sum_v").cast("double"), 6).as("sum_v"),
      col("min_v"), col("max_v"),
      pround(col("sum_v").cast("double") / col("n"), 6).as("avg_v"),
      est.as("distinct_est"),
      graft.functions.Hll.estimate(sInt, vEmpty).as("hll_distinct_est")): _*)
  }
}
