package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Rounding
import graft.operators.Relational

/** Oracle-checked queries covering the reference-parity operator
  * inventory (SURVEY.md §2.1–§2.9). Each entry is a pure
  * (SparkSession, sfDir) => DataFrame paired with equivalent DuckDB SQL
  * in `oracle`.
  *
  * Conventions for byte-exact oracle parity:
  *   - every row-level query orders by a unique key; aggregates order by
  *     their group keys (deterministic content either way);
  *   - double aggregates go through DECIMAL(18,2) so the sum is exact in
  *     both engines, then round+cast back to double;
  *   - date_trunc returns TIMESTAMP in Spark but DATE in DuckDB → oracle
  *     SQL casts to TIMESTAMP;
  *   - counts are BIGINT in both engines.
  */
object ReferenceParity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** sum(CAST(c AS DECIMAL(18,2))) rounded back to double — exact in both engines. */
  private def dsum(c: org.apache.spark.sql.Column) =
    Rounding.pround(sum(c.cast("decimal(18,2)")).cast("double"), 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2+P1: columnar scan with explicit projection (column pruning
    // reaches the parquet scan — ReadSchema shows only the named cols).
    "s2_scan_projection" -> ((s, dir) =>
      t(s, dir, "events").select("event_id", "event_type", "user_id")
        .orderBy("event_id")),

    // P1: projection with reorder (dashboards load starts with timestamps,
    // f_superset_dashboards_upload_data.sql:3-5).
    "p1_projection_reorder" -> ((s, dir) =>
      t(s, dir, "orders").select("o_orderdate", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // P2: lineage literal column (f_superset_logs_upload_data.sql:12).
    "p2_lineage_literal" -> ((s, dir) =>
      Relational.withLineage(
        t(s, dir, "events").select("event_id", "ts", "user_id"), "superset")
        .orderBy("event_id")),

    // F1(+F3): strict watermark filter with string-literal cast.
    "f1_watermark_strict" -> ((s, dir) =>
      Relational.newerThan(t(s, dir, "events"), "ts", "2024-01-15 00:00:00")
        .select("event_id", "ts", "event_type").orderBy("event_id")),

    // F2: inclusive month-scoped filter (v1 semantics).
    "f2_watermark_inclusive" -> ((s, dir) =>
      Relational.onOrAfter(t(s, dir, "events"), "ts", "2024-01-10 00:00:00")
        .filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id").orderBy("event_id")),

    // F3: cold-start epoch fallback — the 2000-01-01 filter must be a
    // full load (equivalence checked via grouped counts).
    "f3_cold_start_epoch" -> ((s, dir) =>
      Relational.newerThan(t(s, dir, "events"), "ts", Relational.ColdStartEpoch)
        .groupBy("event_type").agg(count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // F4: modulo shard split predicate (v1/dag:119,124).
    "f4_modulo_shard" -> ((s, dir) =>
      Relational.moduloShard(t(s, dir, "events"), "event_id", 2, 0)
        .select("event_id", "user_id").orderBy("event_id")),

    // F5: equality predicates.
    "f5_equality_predicates" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // A1: scalar MAX watermark.
    "a1_max_watermark" -> ((s, dir) =>
      t(s, dir, "events").agg(max(col("ts")).as("wm"))),

    // A2: month-truncated watermark (v1/dag:65).
    "a2_month_trunc_watermark" -> ((s, dir) =>
      t(s, dir, "events")
        .agg(date_trunc("month", max(col("ts"))).as("wm"))),

    // A3: distinct partition list (system.parts scan, v1/dag:88-93).
    "a3_distinct_partitions" -> ((s, dir) =>
      t(s, dir, "events")
        .select(date_trunc("month", col("ts")).as("month")).distinct()
        .orderBy("month")),

    // A4/§2.5: ReplacingMergeTree dedup — keep latest row per key.
    "a4_dedup_latest" -> ((s, dir) =>
      Relational.dedupLatest(
        t(s, dir, "events").select("user_id", "event_id", "ts", "event_type"),
        keys = Seq("user_id"), versionCol = "ts", tieBreak = Seq("event_id"))
        .orderBy("user_id")),

    // L1: deterministic batch cap (v1 limit 1000, made ordered).
    "l1_batch_cap" -> ((s, dir) =>
      Relational.batchCap(
        t(s, dir, "events").select("event_id", "ts", "user_id"),
        "event_id", 1000)),

    // L2: first-row probe (hook:53-59).
    "l2_first_row" -> ((s, dir) =>
      t(s, dir, "events").select("event_id", "ts", "user_id")
        .orderBy("ts", "event_id").limit(1)),

    // J1: dictionary-style broadcast enrichment + §1.4 null repair.
    "j1_enrich_users" -> ((s, dir) => {
      val e = Relational.enrich(
        t(s, dir, "events").select("event_id", "user_id"),
        t(s, dir, "customer"), "user_id", "c_custkey",
        Seq("c_name", "c_mktsegment"))
      e.select(col("event_id"), col("user_id"),
        coalesce(col("c_name"), lit("undefined")).as("user_name"),
        coalesce(col("c_mktsegment"), lit("undefined")).as("segment"))
        .orderBy("event_id")
    }),

    // J1 (two dictionaries): facts enriched by two broadcast dims at once.
    "j1_enrich_two_dims" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val withPart = Relational.enrich(li, t(s, dir, "part"),
        "l_partkey", "p_partkey", Seq("p_brand"))
      val withSupp = Relational.enrich(withPart, t(s, dir, "supplier"),
        "l_suppkey", "s_suppkey", Seq("s_name"))
      withSupp.groupBy("p_brand", "s_name")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand", "s_name")
    }),

    // J1 (SQL consumer form): the reference's downstream BI SQL calls
    // dictGet per row — expressed here PURELY in SQL through the
    // GraftExtensions dict_get surface, run via the script runner (the
    // path a reference user's .sql files take). The dictionary is the
    // broadcast hash table; the codegen'd probe stays inside the scan's
    // WholeStageCodegen span — no join node, no shuffle.
    "j1_dict_get_sql" -> ((s, dir) => {
      graft.functions.Dictionaries.create(s, "dg_customers",
        t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_mktsegment"), "c_custkey")
      t(s, dir, "events").createOrReplaceTempView("dg_events")
      graft.sources.IO.runScript(s,
        """SELECT event_id, user_id,
          |  dict_get_or_default('dg_customers', 'c_name', user_id,
          |                      'undefined') AS user_name,
          |  dict_get_or_default('dg_customers', 'c_mktsegment', user_id,
          |                      'undefined') AS segment
          |FROM dg_events ORDER BY event_id;""".stripMargin).get
    }),

    // J2: anti-join — keys absent from the other side (customers with no
    // high-value order, so the result is non-trivial at every sf).
    "j2_anti_missing" -> ((s, dir) =>
      Relational.notInTarget(
        t(s, dir, "customer").select("c_custkey", "c_name"),
        t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
          .withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey").orderBy("c_custkey")),

    // J2 (semi form): keys present in the other side.
    "j2_semi_present" -> ((s, dir) =>
      Relational.inTarget(
        t(s, dir, "customer").select("c_custkey", "c_name"),
        t(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey").orderBy("c_custkey")),

    // §2.7: union of source generations with lineage column
    // (v2/README:11-41 old/new Superset coexistence).
    "union_generations" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "ts", "user_id")
      val cut = "2024-01-15 00:00:00"
      val old = Relational.withLineage(
        e.filter(col("ts") < lit(cut).cast("timestamp")), "superset_old")
      val neu = Relational.withLineage(
        e.filter(col("ts") >= lit(cut).cast("timestamp")), "superset")
      Relational.unionGenerations(Seq(old, neu)).orderBy("event_id")
    }),

    // X1: date_trunc month projection (partition expression).
    "x1_date_trunc_month" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), date_trunc("month", col("ts")).as("month"))
        .orderBy("event_id")),

    // X2+X3: interval arithmetic (retention horizon, v2/dag:134) — fixed
    // anchor so the oracle is deterministic; NOW() is the production value.
    "x3_interval_arith" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          (col("ts") - expr("INTERVAL 30 MONTHS")).as("ts_minus_30m"))
        .orderBy("event_id")),

    // X4: modulo scalar.
    "x4_modulo" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), (col("event_id") % 4).as("shard"))
        .orderBy("event_id")),

    // X7: JSON payload access (json/position_json/json_metadata columns).
    "x7_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),

    // §1.4: null-repair defaults after an enrichment join.
    "null_repair_defaults" -> ((s, dir) => {
      val e = Relational.enrich(
        t(s, dir, "events").select("event_id", "user_id"),
        t(s, dir, "customer"), "user_id", "c_custkey",
        Seq("c_name", "c_acctbal"))
      e.select(col("event_id"),
        coalesce(col("c_name"), lit("undefined")).as("c_name"),
        Rounding.pround(coalesce(col("c_acctbal"), lit(-1.0)), 2).as("c_acctbal"))
        .orderBy("event_id")
    }),

    // M2: retention — keep rows at/after DATE_TRUNC(month, anchor - 30 mo).
    "m2_retention_filter" -> ((s, dir) =>
      Relational.applyRetention(
        t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate"),
        "l_shipdate", lit("1998-06-15 00:00:00").cast("timestamp"), 30)
        .orderBy("l_orderkey", "l_linenumber")),

    // Debounce: first event per (user, type) within each 10-minute
    // bucket — burst hygiene before sessionization.
    "debounce_events" -> ((s, dir) =>
      Relational.debounce(
        t(s, dir, "events").select("event_id", "ts", "user_id", "event_type"),
        keys = Seq("user_id", "event_type"), tsCol = "ts",
        bucketSeconds = 600, tieBreak = Seq("event_id"))
        .orderBy("event_id")),

    // Top-k per group with rank (value ties share a rank).
    "w2_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          rank().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("l_returnflag", "rnk", "l_orderkey", "l_linenumber")
    }),

    // Fixed-width histogram of the value column.
    "events_value_histogram" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(floor(col("value") / 25).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Rounding.pround(min("value"), 2).as("lo"),
          graft.functions.Rounding.pround(max("value"), 2).as("hi"))
        .orderBy("bucket")),

    // Skyline: Pareto-optimal parts — cheapest price vs largest size
    // (two-phase distributed skyline; dominance checked by the oracle
    // with a NOT EXISTS self-join).
    "skyline_parts" -> ((s, dir) =>
      graft.operators.Skyline.skyline(
        t(s, dir, "part").select("p_partkey", "p_retailprice", "p_size"),
        minCols = Seq("p_retailprice"), maxCols = Seq("p_size"))
        .orderBy("p_partkey")),

    // As-of (point-in-time) join: for each event, the user's most recent
    // order at/before the event — the label-leakage-free feature lookup.
    "asof_last_order" -> ((s, dir) =>
      graft.operators.Temporal.asOfJoin(
        t(s, dir, "events").select("event_id", "user_id", "ts"),
        t(s, dir, "orders"),
        factId = "event_id", factKey = "user_id", factTs = "ts",
        dimKey = "o_custkey", dimTs = "o_orderdate",
        dimCols = Seq("o_orderkey", "o_totalprice"),
        tieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_order"),
          col("o_totalprice").as("last_total"))
        .orderBy("event_id")),

    // SCD2 history from the event change log: per-user event_type
    // intervals — change points keep, repeats collapse, the open row is
    // current. The write-side twin of the as-of join above.
    "scd_build_history" -> ((s, dir) =>
      graft.operators.Scd.buildHistory(
        t(s, dir, "events").select("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", Seq("event_type"), tieBreak = Seq("event_id"))
        .orderBy("user_id", "valid_from", "event_type")),

    // SCD2 snapshot merge: history built from the first half-month,
    // then one full-corpus snapshot (latest event_type per user)
    // applied at a fixed as-of — changed keys close+reopen, unchanged
    // pass through, unseen-in-snapshot keys stay current, new keys
    // open their first row.
    "scd_apply_snapshot" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select("user_id", "ts", "event_type", "event_id")
      val hist = graft.operators.Scd.buildHistory(
        ev.filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp")),
        "user_id", "ts", Seq("event_type"), tieBreak = Seq("event_id"))
      val snap = graft.operators.Relational.dedupLatest(
        ev, Seq("user_id"), "ts", tieBreak = Seq("event_id"))
        .select("user_id", "event_type")
      graft.operators.Scd.applySnapshot(hist, snap, "user_id",
        Seq("event_type"), "2024-02-01 00:00:00")
        .orderBy("user_id", "valid_from", "event_type")
    }),

    // SCD2 point-in-time lookup: the dimension state mid-month, read
    // straight off the history with an interval filter — exactly one
    // row per user observed by then (the read-side companion of the
    // two rows above).
    "scd_point_in_time" -> ((s, dir) =>
      graft.operators.Scd.asOf(
        graft.operators.Scd.buildHistory(
          t(s, dir, "events").select("user_id", "ts", "event_type", "event_id"),
          "user_id", "ts", Seq("event_type"), tieBreak = Seq("event_id")),
        "2024-01-15 00:00:00")
        .orderBy("user_id")),

    // Snapshot CDC derivation: classify every user across the
    // half-month vs full-corpus states (insert/delete/update/
    // unchanged) — the full-outer diff that drives incremental
    // re-index decisions.
    "scd_snapshot_diff" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select("user_id", "ts", "event_type", "event_id")
      def latest(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Relational.dedupLatest(
          df, Seq("user_id"), "ts", tieBreak = Seq("event_id"))
          .select("user_id", "event_type")
      graft.operators.Scd.snapshotDiff(
        latest(ev.filter(
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))),
        latest(ev), Seq("user_id"), Seq("event_type"))
        .orderBy("user_id")
    }),

    // Exponential time-decay aggregate: half-life-weighted sum/count
    // per user against a fixed reference instant (the recency-weighted
    // engagement feature; libm pow goes through the l9 term-rounding +
    // exact decimal fold discipline).
    "decayed_agg" -> ((s, dir) =>
      graft.operators.Temporal.decayedAgg(
        t(s, dir, "events"), "user_id", "ts", "value",
        halfLifeSec = 86400L, refTs = "2024-02-01 00:00:00")
        .orderBy("user_id")),

    // Per-event running decayed sum: the recency-weighted engagement
    // counter AT each event (prefix-rescaled window cumsum — no
    // recursion, one key exchange).
    "decayed_running" -> ((s, dir) =>
      graft.operators.Temporal.decayedRunning(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "value", halfLifeSec = 86400L,
        tieBreak = Seq("event_id"))
        .select("event_id", "user_id", "decayed_running")
        .orderBy("event_id")),

    // Regular-grid resampling with forward fill: per user, an hourly
    // timestamp grid carrying the latest observed value at or before
    // each instant — the fixed-cadence series a model consumes. Grid
    // points before a user's first observation stay null.
    "ts_resample_hourly" -> ((s, dir) =>
      graft.operators.Temporal.resampleFfill(
        t(s, dir, "events").filter(col("user_id") < 20),
        "user_id", "ts", "value", stepSec = 3600L,
        tieBreak = Seq("event_id"))
        .orderBy("user_id", "grid_ts")),

    // Binned range join: per event, how many events the same user fires
    // in the following 5 minutes (burst/velocity feature). Events with
    // no follower report 0 via the left re-join.
    "range_join_next_events" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "user_id", "ts")
      val pairs = graft.operators.Temporal.rangeJoin(e, e,
        "user_id", "user_id", "ts", "ts", 0L, 300L, Seq("event_id"))
      val counts = pairs.groupBy("event_id")
        .agg(count(lit(1)).as("n_next"))
      e.select("event_id").join(counts, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_next"), lit(0L)).as("n_next"))
        .orderBy("event_id")
    }),

    // Pivot: event-type counts as columns per user (fixed value list so
    // the schema is stable; absent combinations coalesce to 0).
    "pivot_event_types" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, dir, "events").groupBy("user_id")
        .pivot("event_type", types).agg(count(lit(1)))
      p.select(col("user_id") +:
        types.map(tp => coalesce(col(s"`$tp`"), lit(0L)).as(tp)): _*)
        .orderBy("user_id")
    }),

    // §2.7 set operations: INTERSECT / EXCEPT with set (distinct)
    // semantics over key sets.
    "setop_intersect" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("custkey"))
        .intersect(t(s, dir, "customer")
          .filter(col("c_acctbal") > 5000.0)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")),

    "setop_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, dir, "orders")
          .filter(col("o_totalprice") > 300000.0)
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // A-family extension: CUBE grouping sets (all 4 combinations).
    "a7_cube" -> ((s, dir) =>
      t(s, dir, "events").cube("event_type",
        // stable second dimension: user parity
        "user_id").agg(count(lit(1)).as("n"))
        .withColumn("user_id", col("user_id"))
        .filter(col("user_id").isNull || col("user_id") < 5)
        .orderBy(col("event_type").asc_nulls_first,
          col("user_id").asc_nulls_first)),

    // A-family extension: exact distinct-count aggregate.
    "a5_count_distinct" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // A-family extension: ROLLUP grouping sets (subtotals + grand total).
    "a6_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // §2.5 full window surface: running sum + lag/lead over an ordered
    // per-key frame (beyond the dedup row_number the reference needs).
    "w1_running_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_qty"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("l_suppkey", "rn")
    }),

    // Headline agg: pricing-summary style full-table aggregation.
    "q1_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          Rounding.pround(sum(disc).cast("double"), 2).as("sum_disc_price"),
          Rounding.pround(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Headline join+agg+topk: shipping-priority style (3-way join).
    "q3_revenue_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(li("l_orderkey"), o("o_orderdate"))
        .agg(Rounding.pround(sum(disc).cast("double"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Headline 6-way join: local-supplier-volume style.
    "q5_region_volume" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(Rounding.pround(sum(disc).cast("double"), 2).as("revenue"))
        .orderBy("n_name")
    }),

    // Batch sessionization: a >30-min gap per user starts a new session
    // (the batch twin of EventStream's stateful sessionizer). Timestamps
    // compare as fractional epoch seconds (timestamp→double cast is
    // exact micros in both engines — unix_timestamp would truncate).
    "w3_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("ts"), 1).over(w)
      val newSession = when(prev.isNull ||
        col("ts").cast("double") - prev.cast("double") > 1800.0, 1L)
        .otherwise(0L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          newSession.as("ns"))
        .withColumn("session_seq", sum(col("ns")).over(run))
        .select("event_id", "user_id", "ts", "session_seq")
        .orderBy("event_id")
    }),

    // Time-RANGE rolling frame: per event, activity of the same user in
    // the preceding hour (inclusive) — the RANGE-frame shape ROWS
    // windows can't express when events are unevenly spaced.
    "w4_rolling_hour" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("double"))
        .rangeBetween(-3600L, 0L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("n_hour", count(lit(1)).over(w))
        .withColumn("sum_hour",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select("event_id", "user_id", "n_hour", "sum_hour")
        .orderBy("event_id")
    }),

    // Rank-statistics windows: ntile deciles, percent_rank, cume_dist —
    // all ratios of row counts (exact rational doubles in any engine).
    "w5_rank_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          ntile(10).over(w).cast("long").as("decile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("doc_id")
    }),

    // TPC-H q7 shape: bidirectional trade volume between two nations —
    // a 6-way join where Catalyst broadcasts both nation dims and the
    // supplier/customer sides, leaving only the lineitem⋈orders shuffle.
    "q7_nation_volume" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), sup("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(Rounding.pround(sum(disc).cast("double"), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H q17 shape: revenue of small-quantity orders vs the per-part
    // average. The correlated avg becomes a per-part aggregate join, and
    // the threshold l_quantity < 0.2·avg is rearranged to the EXACT
    // decimal comparison 5·qty·cnt < sum(qty) — no double division, so
    // any engine draws the same boundary.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
      val qd = col("l_quantity").cast("decimal(18,2)")
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(qd).as("sum_qty"), count(lit(1)).as("cnt_qty"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(perPart, li("l_partkey") === col("pk"))
        .filter(qd * lit(5) * col("cnt_qty") < col("sum_qty"))
        .agg(Rounding.pround(
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0,
          2).as("avg_yearly"))
    }),

    // TPC-H q6 shape: forecast-revenue-change — a pure scan+filter+agg
    // whose three range predicates all push into the parquet scan; at
    // 100 TB this is the query class where pushdown IS the runtime.
    "q6_forecast_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
        .agg(Rounding.pround(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")).cast("double"), 2)
          .as("revenue"))
    }),

    // TPC-H q10 shape: returned-item reporting — who returned the most
    // revenue last quarter. Fact-side join keyed on orderkey; the
    // customer/nation dimensions broadcast; top-20 runs as TakeOrdered.
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(Rounding.pround(sum(disc).cast("double"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    }),

    // TPC-H q14 shape: promo revenue share — conditional aggregation
    // over one join, both sums exact-decimal, one double division at
    // the very end (order-independent, oracle-hash-stable).
    "q14_promo_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val p = t(s, dir, "part")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(Rounding.pround(
          lit(100.0) * sum(when(col("p_type") === "ECONOMY", disc))
            .cast("double") / sum(disc).cast("double"), 4)
          .as("promo_share"))
    }),

    // TPC-H q4 shape: order-priority checking — EXISTS becomes a
    // LEFT SEMI join, so the fact side is never duplicated and the
    // probe stream stays one row per order (the fixture lacks
    // commit/receipt dates; returned-lineitem existence plays the
    // "late" role). Date range pushes into the orders scan.
    "q4_priority_check" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      val lr = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      o.join(lr, o("o_orderkey") === lr("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H q8 shape: national market share — an 8-way join where every
    // dimension (part, both nations, region, supplier, customer)
    // broadcasts, leaving lineitem⋈orders as the only shuffle; the
    // share is two conditional exact-decimal sums and one double
    // division at the end (order-independent).
    "q8_market_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), c("c_nationkey") === col("c_nkey"))
        .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n2), sup("s_nationkey") === col("s_nkey"))
        .join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(Rounding.pround(
          sum(when(col("supp_nation") === "NATION_5", disc)).cast("double") /
            sum(disc).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H q13 shape: customer order-count distribution — the LEFT
    // OUTER join keeps order-less customers as c_count=0 (count of a
    // nullable column skips nulls), then a second, far smaller
    // aggregation histograms the counts.
    "q13_cust_distribution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H q18 shape: large-volume customers — the HAVING subquery is
    // a map-side-combinable per-order aggregate whose survivors (a tiny
    // set) broadcast back onto the fact tables; top-100 runs as
    // TakeOrdered, never a global sort.
    "q18_large_volume" -> ((s, dir) => {
      val qd = col("l_quantity").cast("decimal(18,2)")
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(qd).as("tot_qty"))
        .filter(col("tot_qty") > lit(300).cast("decimal(18,2)"))
        .select("big_ok")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(broadcast(big), li("l_orderkey") === col("big_ok"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(qd).cast("double").as("sum_qty"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice").cast("double").as("o_totalprice"),
          col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H q19 shape: disjunctive brand/size/quantity predicates — the
    // OR-of-ANDs stays one scan+join; per-branch part predicates can
    // only prune after the join, but the common p_partkey equi-key
    // keeps it a single broadcast hash join, no union-of-scans.
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      val branch = (brand: String, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(branch("Brand#12", 15, 1, 11) ||
          branch("Brand#23", 20, 10, 20) ||
          branch("Brand#24", 25, 20, 30))
        .agg(Rounding.pround(sum(disc).cast("double"), 2).as("revenue"))
    }),

    // TPC-H q22 shape: dormant high-balance customers — the scalar
    // "above average positive balance" threshold is carried as an exact
    // cross-multiplication (bal·cnt > total, q17's trick — no division,
    // so both engines draw the same boundary) on a one-row broadcast
    // stats frame; NOT EXISTS becomes a LEFT ANTI join against the
    // recent-orders keys.
    "q22_dormant_balances" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val bal = col("c_acctbal").cast("decimal(18,2)")
      val stats = c.filter(col("c_acctbal") > 0.0)
        .agg(sum(bal).as("tot_bal"), count(lit(1)).as("cnt_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
      c.crossJoin(broadcast(stats))
        .filter(bal * col("cnt_bal") > col("tot_bal"))
        .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(bal).cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // TPC-H q2 shape: minimum-cost supplier per part — the correlated
    // MIN subquery becomes a per-part aggregate over the (part-filtered)
    // regional supply joined back on (partkey, cost == min). Filtering
    // to the interesting parts BEFORE the min-agg bounds both the agg
    // and its broadcast to the filtered-part cardinality, not the whole
    // supply relation. `supply` is the derived partsupp stand-in
    // ([[supplyView]]) — identical in both engines by construction.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val p = t(s, dir, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
      val rs = supplyView(s, dir)
        .join(broadcast(p), col("ps_partkey") === p("p_partkey"))
        .join(sup, col("ps_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("ps_partkey"), col("ps_supplycost"), col("s_acctbal"),
          col("s_name"), col("n_name"), col("p_name"))
      val minCost = rs.groupBy(col("ps_partkey").as("mk"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      rs.join(broadcast(minCost), col("ps_partkey") === col("mk") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("ps_partkey").as("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H q9 shape: product-type profit — lineitem enriched with the
    // derived per-(part,supplier) supply cost on a two-key equi-join,
    // every dimension broadcast, profit as exact decimal arithmetic
    // (ext·(1−disc) − cost·qty) so the grouped sums are
    // accumulation-order independent.
    "q9_product_profit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = supplyView(s, dir)
      val p = t(s, dir, "part").filter(col("p_name").contains("red"))
      val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      val amount = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")) -
        col("ps_supplycost") * col("l_quantity").cast("decimal(18,2)")
      li.join(sup, li("l_partkey") === col("ps_partkey") &&
          li("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(Rounding.pround(sum(amount).cast("double"), 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H q11 shape: important stock — per-part value share against a
    // one-row global total carried as an exact cross-multiplication
    // (value·1000 > total), the q17/q22 no-division trick; the total
    // rides a one-row broadcast.
    "q11_important_stock" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
      val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val n = t(s, dir, "nation")
        .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      val filtered = supplyView(s, dir)
        .join(su, col("ps_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .withColumn("val",
          (col("ps_supplycost") * col("ps_availqty")).cast("decimal(28,4)"))
      val total = filtered.agg(sum(col("val")).as("tot"))
      filtered.groupBy("ps_partkey")
        .agg(sum(col("val")).cast("decimal(28,4)").as("value"))
        .crossJoin(broadcast(total))
        .filter(col("value") * 1000 > col("tot"))
        .select(col("ps_partkey"),
          Rounding.pround(col("value").cast("double"), 2).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // TPC-H q12 shape (fixture-adapted: no l_shipmode/l_commitdate —
    // return-flag classes stand in for ship modes, ship-lag > 60 days
    // for the late-receipt predicate): one fact-fact join with two
    // conditional BIGINT counts grouped by a fact attribute.
    "q12_shipclass_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "N") &&
          col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag").as("ship_class"))
        .agg(count(when(high, 1)).as("high_line_count"),
          count(when(!high, 1)).as("low_line_count"))
        .orderBy("ship_class")
    }),

    // TPC-H q15 shape: top supplier — the view + scalar-MAX subquery
    // becomes one revenue aggregate, a one-row MAX broadcast, and an
    // exact-decimal equality (revenue sums are DECIMAL(18,2)-exact, so
    // "equals the max" draws the same boundary in both engines).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
      val winners = rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("max_rev"))
      t(s, dir, "supplier")
        .join(broadcast(winners), col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          Rounding.pround(col("total_revenue").cast("double"), 2)
            .as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H q16 shape: parts/supplier relationship — NOT IN over a
    // never-null key is a broadcast LEFT ANTI join (negative-balance
    // suppliers stand in for the comment-flagged complainers), then a
    // COUNT DISTINCT per (brand, type, size) over the derived supply.
    "q16_supplier_relationship" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 25))
      val complainers = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      supplyView(s, dir)
        .join(broadcast(complainers), col("ps_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(p), col("ps_partkey") === p("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H q20 shape (fixture-adapted): promotable-part suppliers —
    // the nested INs become a semi-join chain; the correlated
    // "availqty > half of that year's shipped quantity" threshold is an
    // exact cross-multiplication (2·availqty > qty) on the two-key join
    // of derived supply vs the year's per-(part,supplier) quantities.
    "q20_promotable_parts" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_name").startsWith("small"))
        .select("p_partkey")
      val yq = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_partkey").as("yq_partkey"),
          col("l_suppkey").as("yq_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val qualified = supplyView(s, dir)
        .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .join(yq, col("ps_partkey") === col("yq_partkey") &&
          col("ps_suppkey") === col("yq_suppkey"))
        .filter(col("ps_availqty") * 2 > col("qty"))
        .select(col("ps_suppkey")).distinct()
      val n = t(s, dir, "nation").filter(col("n_name") === "NATION_3")
      t(s, dir, "supplier")
        .join(qualified, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    }),

    // TPC-H q21 shape (fixture-adapted: ship-lag > 90 days stands in
    // for receipt-after-commit): suppliers who kept orders waiting —
    // the EXISTS/NOT-EXISTS pair collapses into one per-order aggregate
    // (distinct suppliers, distinct LATE suppliers); a late line
    // qualifies iff the order has other suppliers (n_supp > 1) and the
    // only late supplier is this one (n_late_supp = 1). Both sides of
    // the per-order join shuffle on l_orderkey — no correlated re-scan
    // of lineitem.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val li = t(s, dir, "lineitem")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val perOrder = joined.groupBy(col("l_orderkey").as("po_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .select("po_orderkey")
      val su = t(s, dir, "supplier")
      joined.filter(col("late"))
        .join(perOrder, col("l_orderkey") === col("po_orderkey"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }))

  /** Derived partsupp stand-in (the fixture has no partsupp table):
    * per-(part, supplier) supply cost = MIN line price, available
    * quantity = total shipped quantity — exact DECIMAL(18,2) aggregates
    * over lineitem, so both engines derive the identical relation and
    * the q2/q9/q11/q16/q20 join shapes are preserved.
    */
  private def supplyView(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("ps_supplycost"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("ps_availqty"))

  /** The DuckDB spelling of [[supplyView]], shared by the q2/q9/q11/
    * q16/q20 oracles.
    */
  private val SupplySql =
    """supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "s2_scan_projection" ->
      "SELECT event_id, event_type, user_id FROM events ORDER BY event_id",
    "p1_projection_reorder" ->
      "SELECT o_orderdate, o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey",
    "p2_lineage_literal" ->
      "SELECT event_id, ts, user_id, 'superset' AS source FROM events ORDER BY event_id",
    "f1_watermark_strict" ->
      "SELECT event_id, ts, event_type FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id",
    "f2_watermark_inclusive" ->
      "SELECT event_id, ts, user_id FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND event_type = 'purchase' ORDER BY event_id",
    "f3_cold_start_epoch" ->
      "SELECT event_type, count(*) AS n_events FROM events WHERE ts > TIMESTAMP '2000-01-01 00:00:00' GROUP BY event_type ORDER BY event_type",
    "f4_modulo_shard" ->
      "SELECT event_id, user_id FROM events WHERE event_id % 2 = 0 ORDER BY event_id",
    "f5_equality_predicates" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F' ORDER BY l_orderkey, l_linenumber",
    "a1_max_watermark" ->
      "SELECT max(ts) AS wm FROM events",
    "a2_month_trunc_watermark" ->
      "SELECT CAST(date_trunc('month', max(ts)) AS TIMESTAMP) AS wm FROM events",
    "a3_distinct_partitions" ->
      "SELECT DISTINCT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month FROM events ORDER BY month",
    "a4_dedup_latest" ->
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "l1_batch_cap" ->
      "SELECT event_id, ts, user_id FROM events ORDER BY event_id LIMIT 1000",
    "l2_first_row" ->
      "SELECT event_id, ts, user_id FROM events ORDER BY ts, event_id LIMIT 1",
    "j1_enrich_users" ->
      """SELECT e.event_id, e.user_id,
        |       coalesce(c.c_name, 'undefined') AS user_name,
        |       coalesce(c.c_mktsegment, 'undefined') AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "j1_enrich_two_dims" ->
      """SELECT p.p_brand, s.s_name,
        |       floor((CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_qty,
        |       count(*) AS n_lines
        |FROM lineitem l
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY p.p_brand, s.s_name ORDER BY p.p_brand, s.s_name""".stripMargin,
    "j1_dict_get_sql" ->
      """SELECT e.event_id, e.user_id,
        |       coalesce(c.c_name, 'undefined') AS user_name,
        |       coalesce(c.c_mktsegment, 'undefined') AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "j2_anti_missing" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j2_semi_present" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "union_generations" ->
      """SELECT event_id, ts, user_id, 'superset_old' AS source FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        |UNION ALL
        |SELECT event_id, ts, user_id, 'superset' AS source FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "x1_date_trunc_month" ->
      "SELECT event_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS month FROM events ORDER BY event_id",
    "x3_interval_arith" ->
      "SELECT event_id, ts - INTERVAL 30 MONTH AS ts_minus_30m FROM events ORDER BY event_id",
    "x4_modulo" ->
      "SELECT event_id, event_id % 4 AS shard FROM events ORDER BY event_id",
    "x7_json_extract" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events ORDER BY event_id",
    "null_repair_defaults" ->
      """SELECT e.event_id, coalesce(c.c_name, 'undefined') AS c_name,
        |       floor((coalesce(c.c_acctbal, -1.0)) * 100 + 0.5) / 100 AS c_acctbal
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "m2_retention_filter" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate >= CAST(date_trunc('month', TIMESTAMP '1998-06-15 00:00:00' - INTERVAL 30 MONTH) AS TIMESTAMP)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "skyline_parts" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "debounce_events" ->
      """SELECT event_id, ts, user_id, event_type FROM (
        |  SELECT event_id, ts, user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id, event_type, (epoch_us(ts) // 600000000)
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "w2_topk_per_group" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rnk FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS rnk
        |  FROM lineitem) WHERE rnk <= 3
        |ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber""".stripMargin,
    "events_value_histogram" ->
      """SELECT CAST(floor(value / 25) AS BIGINT) AS bucket, count(*) AS n,
        |       floor((min(value)) * 100 + 0.5) / 100 AS lo,
        |       floor((max(value)) * 100 + 0.5) / 100 AS hi
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "range_join_next_events" ->
      """SELECT e.event_id,
        |  CAST(count(f.event_id) AS BIGINT) AS n_next
        |FROM events e LEFT JOIN events f
        |  ON f.user_id = e.user_id
        | AND epoch_us(f.ts) > epoch_us(e.ts)
        | AND epoch_us(f.ts) <= epoch_us(e.ts) + 300000000
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "scd_build_history" ->
      """WITH lagd AS (
        |  SELECT user_id, ts, event_type, event_id,
        |         lag(event_type) OVER w AS prev,
        |         row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cps AS (
        |  SELECT user_id, ts, event_type, event_id FROM lagd
        |  WHERE rn = 1 OR (prev IS DISTINCT FROM event_type))
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER w2 AS valid_to,
        |       (lead(ts) OVER w2 IS NULL) AS is_current
        |FROM cps
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_type""".stripMargin,
    "scd_point_in_time" ->
      """WITH lagd AS (
        |  SELECT user_id, ts, event_type, event_id,
        |         lag(event_type) OVER w AS prev,
        |         row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cps AS (
        |  SELECT user_id, ts, event_type, event_id FROM lagd
        |  WHERE rn = 1 OR (prev IS DISTINCT FROM event_type)),
        |hist AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |         lead(ts) OVER w2 AS valid_to,
        |         (lead(ts) OVER w2 IS NULL) AS is_current
        |  FROM cps
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type, valid_from, valid_to, is_current
        |FROM hist
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY user_id""".stripMargin,
    "scd_apply_snapshot" ->
      """WITH lagd AS (
        |  SELECT user_id, ts, event_type, event_id,
        |         lag(event_type) OVER w AS prev,
        |         row_number() OVER w AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cps AS (
        |  SELECT user_id, ts, event_type, event_id FROM lagd
        |  WHERE rn = 1 OR (prev IS DISTINCT FROM event_type)),
        |hist AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |         lead(ts) OVER w2 AS valid_to
        |  FROM cps
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |closed AS (
        |  SELECT user_id, event_type, valid_from, valid_to,
        |         FALSE AS is_current
        |  FROM hist WHERE valid_to IS NOT NULL),
        |cur AS (
        |  SELECT user_id, event_type, valid_from
        |  FROM hist WHERE valid_to IS NULL),
        |snap AS (
        |  SELECT user_id, event_type AS s_type FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |j AS (
        |  SELECT c.user_id AS cu, s.user_id AS su, c.event_type,
        |         c.valid_from, s.s_type
        |  FROM cur c FULL OUTER JOIN snap s ON s.user_id = c.user_id),
        |merged AS (
        |  SELECT cu AS user_id, event_type, valid_from,
        |         CASE WHEN su IS NOT NULL
        |                   AND (event_type IS DISTINCT FROM s_type)
        |              THEN TIMESTAMP '2024-02-01 00:00:00'
        |              ELSE CAST(NULL AS TIMESTAMP) END AS valid_to,
        |         NOT (su IS NOT NULL
        |              AND (event_type IS DISTINCT FROM s_type)) AS is_current
        |  FROM j WHERE cu IS NOT NULL
        |  UNION ALL
        |  SELECT su, s_type, TIMESTAMP '2024-02-01 00:00:00',
        |         CAST(NULL AS TIMESTAMP), TRUE
        |  FROM j WHERE su IS NOT NULL
        |    AND (cu IS NULL OR (event_type IS DISTINCT FROM s_type)))
        |SELECT user_id, event_type, valid_from, valid_to, is_current
        |FROM closed
        |UNION ALL
        |SELECT user_id, event_type, valid_from, valid_to, is_current
        |FROM merged
        |ORDER BY user_id, valid_from, event_type""".stripMargin,
    "scd_snapshot_diff" ->
      """WITH older AS (
        |  SELECT user_id, event_type AS old_event_type FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1),
        |newer AS (
        |  SELECT user_id, event_type AS new_event_type FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |       o.old_event_type, n.new_event_type,
        |       CASE WHEN o.user_id IS NULL THEN 'insert'
        |            WHEN n.user_id IS NULL THEN 'delete'
        |            WHEN o.old_event_type IS DISTINCT FROM n.new_event_type
        |              THEN 'update'
        |            ELSE 'unchanged' END AS change
        |FROM older o FULL OUTER JOIN newer n ON n.user_id = o.user_id
        |ORDER BY user_id""".stripMargin,
    "decayed_agg" ->
      """WITH w AS (
        |  SELECT user_id,
        |    floor((value * power(0.5,
        |      (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts))
        |        / 86400000000.0)) * 1000000000 + 0.5) / 1000000000 AS t,
        |    floor((power(0.5,
        |      (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts))
        |        / 86400000000.0)) * 1000000000 + 0.5) / 1000000000 AS wg
        |  FROM events)
        |SELECT user_id, count(*) AS n,
        |  floor(CAST(sum(CAST(t AS DECIMAL(38,12))) AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS decayed_sum,
        |  floor(CAST(sum(CAST(wg AS DECIMAL(38,12))) AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS decayed_count
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "decayed_running" ->
      """WITH base AS (
        |  SELECT event_id, user_id, ts, value,
        |         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0
        |  FROM events),
        |terms AS (
        |  SELECT event_id, user_id, ts,
        |    (epoch_us(ts) - t0) / 86400000000.0 AS rel,
        |    floor((value * power(0.5,
        |      -((epoch_us(ts) - t0) / 86400000000.0)))
        |      * 1000000000 + 0.5) / 1000000000 AS term
        |  FROM base),
        |cum AS (
        |  SELECT event_id, user_id, rel,
        |    sum(CAST(term AS DECIMAL(38,12))) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM terms)
        |SELECT event_id, user_id,
        |  floor((power(0.5, rel) * CAST(c AS DOUBLE))
        |    * 1000000 + 0.5) / 1000000 AS decayed_running
        |FROM cum ORDER BY event_id""".stripMargin,
    "ts_resample_hourly" ->
      """WITH obs0 AS (
        |  SELECT user_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id < 20),
        |obs AS (SELECT user_id, ts, value FROM obs0 WHERE rn = 1),
        |b AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
        |  FROM obs GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
        |              AS TIMESTAMP) AS ts
        |  FROM b),
        |u AS (
        |  SELECT user_id, ts, CAST(NULL AS DOUBLE) AS v, 1 AS isg FROM grid
        |  UNION ALL
        |  SELECT user_id, ts, value, 0 FROM obs),
        |f AS (
        |  SELECT user_id, ts, isg,
        |         last_value(v IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, isg
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS value_ffill
        |  FROM u)
        |SELECT user_id, ts AS grid_ts, value_ffill
        |FROM f WHERE isg = 1 ORDER BY user_id, grid_ts""".stripMargin,
    "asof_last_order" ->
      """WITH m AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
        |         row_number() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT e.event_id, e.user_id, m.o_orderkey AS last_order,
        |       m.o_totalprice AS last_total
        |FROM events e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON m.event_id = e.event_id
        |ORDER BY e.event_id""".stripMargin,
    "pivot_event_types" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "setop_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY custkey""".stripMargin,
    "setop_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY custkey""".stripMargin,
    "a7_cube" ->
      """SELECT event_type, user_id, count(*) AS n
        |FROM events GROUP BY CUBE (event_type, user_id)
        |HAVING user_id IS NULL OR user_id < 5
        |ORDER BY event_type ASC NULLS FIRST, user_id ASC NULLS FIRST""".stripMargin,
    "a5_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a6_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "w1_running_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty,
        |       lag(l_quantity, 1) OVER w AS prev_qty,
        |       lead(l_quantity, 1) OVER w AS next_qty,
        |       row_number() OVER w AS rn
        |FROM lineitem WHERE l_suppkey <= 3
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       floor((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_qty,
        |       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_base_price,
        |       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_disc_price,
        |       floor((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_revenue_topk" ->
      """SELECT l.l_orderkey, o.o_orderdate,
        |       floor((CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q5_region_volume" ->
      """SELECT n.n_name,
        |       floor((CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "w3_sessionize" ->
      """SELECT event_id, user_id, ts,
        |       CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS session_seq
        |FROM (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                OR epoch(ts) - epoch(prev_ts) > 1800.0
        |              THEN 1 ELSE 0 END AS ns
        |  FROM (SELECT event_id, user_id, ts,
        |               lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |ORDER BY event_id""".stripMargin,
    "w4_rolling_hour" ->
      """SELECT event_id, user_id,
        |       count(*) OVER w AS n_hour,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w5_rank_stats" ->
      """SELECT doc_id, lang, n_chars,
        |       ntile(10) OVER w AS decile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |       floor((CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS pk,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |         count(*) AS cnt_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT floor((CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN per_part pp ON l.l_partkey = pp.pk
        |WHERE p.p_brand = 'Brand#13'
        |  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pp.cnt_qty < pp.sum_qty""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name,
        |       floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
        |       c.c_acctbal, n.n_name
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """SELECT floor((100.0 * CAST(sum(CASE WHEN p.p_type = 'ECONOMY' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
        |             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS promo_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "q4_priority_check" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        |         n2.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |       floor((CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume END) AS DOUBLE)
        |              / CAST(sum(volume) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS mkt_share
        |FROM vol GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c
        |      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |        AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q18_large_volume" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
        |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_dormant_balances" ->
      """WITH stats AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot_bal, count(*) AS cnt_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c.c_nationkey, count(*) AS numcust,
        |       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c, stats
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.cnt_bal > stats.tot_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin,
    "q2_min_cost_supplier" ->
      s"""WITH $SupplySql,
        |rs AS (
        |  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name, p_name
        |  FROM supply
        |  JOIN part ON ps_partkey = p_partkey
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'LARGE')
        |SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_name
        |FROM rs
        |WHERE ps_supplycost = (SELECT min(rs2.ps_supplycost) FROM rs rs2
        |                       WHERE rs2.ps_partkey = rs.ps_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      s"""WITH $SupplySql
        |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |                      - ps_supplycost * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_profit
        |FROM lineitem
        |JOIN supply ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      s"""WITH $SupplySql,
        |filtered AS (
        |  SELECT ps_partkey,
        |         CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4)) AS val
        |  FROM supply
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT ps_partkey,
        |       floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS value
        |FROM (SELECT ps_partkey, CAST(sum(val) AS DECIMAL(28,4)) AS value
        |      FROM filtered GROUP BY 1)
        |WHERE value * 1000 > (SELECT sum(val) FROM filtered)
        |ORDER BY value DESC, ps_partkey""".stripMargin,
    "q12_shipclass_priority" ->
      """SELECT l_returnflag AS ship_class,
        |       count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('A','N')
        |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |       floor(CAST(total_revenue AS DOUBLE) * 100 + 0.5) / 100 AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_relationship" ->
      s"""WITH $SupplySql
        |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM supply JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 25)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_promotable_parts" ->
      s"""WITH $SupplySql,
        |year_qty AS (
        |  SELECT l_partkey AS yq_partkey, l_suppkey AS yq_suppkey,
        |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM supply
        |    JOIN year_qty ON ps_partkey = yq_partkey AND ps_suppkey = yq_suppkey
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND ps_availqty * 2 > qty)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
}
