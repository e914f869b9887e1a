package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The C4/Gopher-style corpus cleaning pass: every per-document quality
  * signal computed in ONE projection over one corpus scan, then a single
  * ordered verdict — the composition a production pipeline actually
  * runs, rather than one filter job per signal.
  *
  * Scale shape: all signals are codegen'd expressions
  * (`TextFunctions.*`), so the whole pass is one WholeStageCodegen
  * map stage — no shuffle, no UDF, linear in corpus size, and the
  * verdict predicate pushes into the scan when only kept docs are read.
  */
object Quality {

  /** Reject thresholds; verdict precedence is the declaration order
    * below (a doc failing several checks reports the first).
    * `blockedPhrases` arms the C4-style bad-words gate: any phrase of
    * the list contained in the text rejects the document — matched by
    * ONE Aho–Corasick pass ([[graft.functions.PhraseHits]]), so the
    * gate's cost is O(|text|) however long the list is. Empty list
    * (the default) = gate off, signals and schema unchanged.
    */
  final case class Thresholds(
      minTokens: Long = 15,
      maxTokens: Long = 1 << 20,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr"),
      minQuality: Double = 0.0,
      maxDupWordRatio: Double = 1.0,
      blockedPhrases: Seq[String] = Seq.empty)

  /** Per-document signals + verdict: `too_short` | `too_long` |
    * `bad_lang` | `blocked` | `low_quality` | `repetitive` | `keep`.
    * With the blocklist armed the output carries one extra signal
    * column `n_blocked` (distinct blocklist phrases present) and the
    * `blocked` arm sits after `bad_lang` — C4 drops bad-words pages
    * outright, before any quality scoring.
    */
  def verdict(docs: DataFrame, idCol: String, textCol: String,
              t: Thresholds): DataFrame = {
    val c = col(textCol)
    val blockedSig =
      if (t.blockedPhrases.isEmpty) Nil
      else Seq(size(graft.functions.PhraseHits.column(
        docs.sparkSession, c, t.blockedPhrases)).as("n_blocked"))
    val sig = docs.select(Seq(col(idCol),
      TextFunctions.tokenCount(c).as("n_tokens"),
      TextFunctions.langId(c).as("lang_id"),
      TextFunctions.qualityScore(c).as("quality"),
      TextFunctions.dupWordRatio(c).as("dup_word_ratio")) ++ blockedSig: _*)
    val base =
      when(col("n_tokens").isNull, "null_text")
        // a null document must not fall through every threshold `when`
        // (null comparisons are null, not false) into "keep"
        .when(col("n_tokens") < t.minTokens, "too_short")
        .when(col("n_tokens") > t.maxTokens, "too_long")
        .when(!col("lang_id").isin(t.allowedLangs.map(x => x: Any): _*),
          "bad_lang")
    val withBlock =
      if (t.blockedPhrases.isEmpty) base
      else base.when(col("n_blocked") > 0, "blocked")
    sig.withColumn("verdict",
      withBlock
        .when(col("quality") < t.minQuality, "low_quality")
        .when(col("dup_word_ratio") > t.maxDupWordRatio, "repetitive")
        .otherwise("keep"))
  }

  /** The filtered corpus itself: original rows that pass every check —
    * the same signals as a pure filter predicate, still one map-only
    * scan (no join against the verdict frame needed).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            t: Thresholds): DataFrame = {
    val c = col(textCol)
    val blockOk =
      if (t.blockedPhrases.isEmpty) lit(true)
      else size(graft.functions.PhraseHits.column(
        docs.sparkSession, c, t.blockedPhrases)) === 0
    docs.filter(
      c.isNotNull &&
        TextFunctions.tokenCount(c).between(t.minTokens, t.maxTokens) &&
        TextFunctions.langId(c)
          .isin(t.allowedLangs.map(x => x: Any): _*) &&
        blockOk &&
        TextFunctions.qualityScore(c) >= t.minQuality &&
        TextFunctions.dupWordRatio(c) <= t.maxDupWordRatio)
  }

  /** Bad-record quarantine for a JSON payload column: rows whose
    * payload yields the required field parse to `ok` with the value
    * extracted; everything else (malformed JSON, wrong shape, missing
    * field) routes to `quarantine` with the raw payload preserved for
    * replay — the standard ingest pattern that keeps one poison pill
    * from failing a 100 TB batch while losing nothing.
    *
    * `get_json_object` is codegen'd and returns NULL on any parse
    * failure, so the whole routing is one map-only projection — no
    * UDF, no exception handling in the hot path, and the status
    * predicate pushes down when only one route is read.
    */
  def jsonQuarantine(df: DataFrame, jsonCol: String, field: String)
      : DataFrame = {
    val extracted = get_json_object(col(jsonCol), s"$$.$field")
    // try_cast, not cast: under ANSI a non-numeric field value must
    // route to quarantine, not throw — that is the operator's whole job
    df.withColumn(field, extracted.try_cast(org.apache.spark.sql.types.LongType))
      .withColumn("status",
        when(col(field).isNotNull, "ok").otherwise("quarantine"))
  }
}
