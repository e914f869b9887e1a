package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history and snapshot diffing —
  * the warehouse ops that turn a change log or a daily snapshot into
  * versioned dimension rows with `[valid_from, valid_to)` intervals.
  * The reference's ClickHouse tables keep only the latest row per key
  * (ReplacingMergeTree — our A4 `dedupLatest`); SCD2 is what a
  * consumer builds when it needs the history those collapses discard,
  * and the as-of join ([[Temporal.asOfJoin]]) is its read-side twin.
  *
  * Scale shape: [[buildHistory]] is two window passes over ONE
  * `(key, ts)` sort — the change-point filter and the interval
  * assignment share the same partitioning and ordering, so Catalyst
  * plans a single exchange+sort. [[applySnapshot]] touches only the
  * OPEN rows (one per key) plus the incoming snapshot — one equi-join
  * on the key; the closed history unions through untouched, which in
  * storage terms is an append of delta rows, never a rewrite of the
  * archive.
  */
object Scd {

  private def historyCols(keyCol: String, attrCols: Seq[String]): Seq[Column] =
    (keyCol +: attrCols).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))

  /** Build a type-2 history from a change log: keep each key's rows
    * where any tracked attribute differs from the previous observation
    * (null-safely), then assign `valid_from` = the change's timestamp
    * and `valid_to` = the next change's (null + `is_current` for the
    * open row). Consecutive observations with unchanged attributes
    * collapse into the interval that first produced them.
    *
    * @param tieBreak extra ordering columns for observations sharing a
    *                 timestamp (pass the event id — determinism of the
    *                 history requires a total order per key)
    */
  def buildHistory(changes: DataFrame, keyCol: String, tsCol: String,
                   attrCols: Seq[String],
                   tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val ord = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    // null-safe any-attr-changed; the first observation is always a
    // change point (anyDiff alone would drop it when its attrs are
    // null: null <=> lag-null is true)
    val anyDiff = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val cps = changes
      .withColumn("__chg", row_number().over(w) === 1 || anyDiff)
      .filter(col("__chg"))
    cps
      .select((keyCol +: attrCols).map(col) :+
        col(tsCol).as("valid_from") :+
        lead(col(tsCol), 1).over(w).as("valid_to"): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Merge a full snapshot (one row per key, the key's CURRENT
    * attributes as of `asOf`) into an existing type-2 history:
    * keys whose attributes differ from their open row get that row
    * closed at `asOf` and a new open row inserted; unseen keys stay
    * current unchanged (a snapshot is an observation, and absence of a
    * key is no observation — deletions are a retention policy, M2);
    * brand-new keys open their first row at `asOf`. Applying the same
    * snapshot twice is a no-op (idempotent reload safety).
    *
    * The join frame emits each key's 0–2 output rows through one
    * `explode` — a single codegen'd pass, no re-scan per branch.
    */
  def applySnapshot(history: DataFrame, snapshot: DataFrame, keyCol: String,
                    attrCols: Seq[String], asOf: String): DataFrame = {
    val asOfTs = lit(asOf).cast("timestamp")
    val closed = history.filter(!col("is_current"))
      .select(historyCols(keyCol, attrCols): _*)
    val cur = history.filter(col("is_current"))
      .withColumn("__in_cur", lit(true))
    val snap = snapshot
      .select(col(keyCol) +: attrCols.map(a => col(a).as(s"__s_$a")): _*)
      .withColumn("__in_snap", lit(true))
    val j = cur.join(snap, Seq(keyCol), "full")
    val inCur = col("__in_cur").isNotNull
    val inSnap = col("__in_snap").isNotNull
    val anyDiff = attrCols
      .map(a => !(col(a) <=> col(s"__s_$a")))
      .reduce(_ || _)
    // both interval bounds cast to timestamp: a history keyed on a
    // date/string tsCol otherwise type-mismatches against the
    // timestamp-typed asOf branch inside array() below
    def rowStruct(attrs: Seq[Column], from: Column, to: Column,
                  current: Column): Column =
      struct(attrs ++ Seq(from.cast("timestamp").as("valid_from"),
        to.cast("timestamp").as("valid_to"),
        current.as("is_current")): _*)
    val oldAttrs = attrCols.map(col)
    val newAttrs = attrCols.map(a => col(s"__s_$a").as(a))
    val emitted = array(
      // the pre-existing open row: closed at asOf when the snapshot
      // disagrees, passed through verbatim otherwise
      when(inCur && inSnap && anyDiff,
        rowStruct(oldAttrs, col("valid_from"), asOfTs, lit(false)))
        .when(inCur,
          rowStruct(oldAttrs, col("valid_from"), lit(null), lit(true))),
      // the new open row: for changed keys and for keys new to the
      // history
      when(inSnap && (!inCur || anyDiff),
        rowStruct(newAttrs, asOfTs, lit(null), lit(true))))
    val merged = j
      .select(col(keyCol),
        explode(filter(emitted, r => r.isNotNull)).as("__r"))
      .select(col(keyCol) +:
        (attrCols ++ Seq("valid_from", "valid_to", "is_current"))
          .map(c => col(s"__r.$c")): _*)
    closed.unionByName(merged)
  }

  /** Classify every key across two snapshots of the same relation:
    * `insert` (key only in `newer`), `delete` (key only in `older`),
    * `update` (present in both, any compared column null-safely
    * differs), `unchanged`. The CDC derivation for sources that can
    * only be observed as full states — its output feeds
    * [[applySnapshot]]-style merges, incremental re-index decisions
    * (which documents to re-embed), and reconciliation reports.
    *
    * One full outer equi-join on the key — both sides shuffle once on
    * the same key, nothing else moves. Output carries the compared
    * columns from both sides as `old_` / `new_` prefixes.
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = older.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old"): _*)
    val n = newer.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new"): _*)
    val anyDiff = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full")
      .withColumn("change",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(anyDiff, lit("update"))
          .otherwise(lit("unchanged")))
      .drop("__in_old", "__in_new")
  }

  /** Point-in-time lookup over a type-2 history: each key's row whose
    * interval covers `at` (intervals are [valid_from, valid_to), the
    * [[buildHistory]]/[[applySnapshot]] convention) — "what did the
    * dimension look like on date X" without reconstructing a snapshot.
    * By construction a key's intervals partition its timeline, so the
    * result has exactly one row per key observed on or before `at`.
    *
    * A pure filter, not a join: both predicates push into the history
    * scan, and over a month-partitioned history lake table partition
    * pruning bounds the read to segments overlapping `at`.
    */
  def asOf(history: DataFrame, at: String): DataFrame = {
    val t = lit(at).cast("timestamp")
    history.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))
  }
}
