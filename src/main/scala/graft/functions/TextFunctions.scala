package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the training-data-pipeline tier
  * (BASELINE.json north star): tokenization, language ID, quality
  * scoring, fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split/filter/transform/regexp_*) — no Scala UDFs — so the whole
  * document pipeline stays inside WholeStageCodegen and scales linearly
  * with executors. Each function has an exact DuckDB-SQL equivalent used
  * by the oracle gate (graft.queries.Extensions).
  */
object TextFunctions {

  /** Whitespace tokens. Single-space split, matching the fixture corpus. */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the shape of a byte-pair
    * vocabulary without the merges table.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast("long")

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Order = tie-break priority (English wins ties, etc.).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "es", "una", "los", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "pour"))

  private def markerHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), w => w.isin(words.map(x => x: Any): _*)))

  /** Language ID: argmax of per-language marker-stopword hits, priority
    * order breaking ties, 'unknown' when no marker matches. Deterministic
    * and expressible identically in the DuckDB oracle.
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, ws) => l -> markerHits(c, ws) }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val laterBeats = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
      (lang, laterBeats.foldLeft(lit(true))(_ && _))
    }
    val pick = cases.init.foldRight(lit(cases.last._1)) {
      case ((lang, cond), rest) => when(cond, lang).otherwise(rest)
    }
    when(anyHit, pick).otherwise(lit("unknown"))
  }

  /** Heuristic document quality score in [0,1]:
    * 0.4 * length-band + 0.3 * (1 - punctuation ratio) + 0.3 * stopword
    * presence. Intentionally simple arithmetic over counts so the DuckDB
    * oracle can reproduce it bit-for-bit (round 4).
    */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val nTok = size(tokens(c)).cast("double")
    val punct = len - length(regexp_replace(c, "[^A-Za-z0-9 ]", ""))
    val punctRatio = when(len > 0, punct / len).otherwise(lit(0.0))
    val stopHits =
      markerHits(c, LangMarkers.flatMap(_._2)).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(lit(0.0))
    val lengthBand =
      when(len >= 200 && len <= 2000, lit(1.0))
        .when(len >= 50, lit(0.5))
        .otherwise(lit(0.0))
    Rounding.pround(lit(0.4) * lengthBand + lit(0.3) * (lit(1.0) - punctRatio) +
      lit(0.3) * least(lit(1.0), stopRatio * 5), 4)
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set — catches shuffled/duplicated-content documents that exact
    * text hashing misses.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " "))

  /** Winnowing fingerprints (the rolling-hash document fingerprint of
    * Schleimer et al.'s winnowing scheme): hash every character k-gram,
    * then keep the minimum hash of each w-gram window. Guarantees any
    * shared substring of length >= k+w-1 yields a shared fingerprint —
    * the shift-resistant near-dup signal that whole-document hashing
    * misses. Returns distinct (id, pos-ordered window minima).
    */
  def winnowingFingerprints(df: org.apache.spark.sql.DataFrame,
                            idCol: String, textCol: String,
                            k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .filter(length(col(textCol)) >= k)
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
          i => md5(col(textCol).substr(i, lit(k))))).as(Seq("pos", "h")))
    val win = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams.select(col(idCol), min("h").over(win).as("fp"))
      .distinct()
  }

  /** Word n-gram shingles (guarded: short docs yield the whole text as
    * one shingle; Spark's `sequence` would otherwise count backwards).
    */
  def wordShingles(c: Column, n: Int): Column = {
    val ws = tokens(c)
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array(array_join(ws, " ")))
  }

  /** Non-overlapping n-word chunks ("lines" for a corpus without line
    * structure): chunk i covers words [i*n+1, (i+1)*n]. The unit of
    * line-level dedup over the fixture corpus.
    */
  def wordChunks(c: Column, n: Int): Column = {
    val ws = tokens(c)
    transform(sequence(lit(1), ((size(ws) + (n - 1)) / n).cast("int")),
      i => array_join(slice(ws, (i - lit(1)) * lit(n) + lit(1), lit(n)), " "))
  }

  /** Overlapping sliding-window chunks (the retrieval/RAG shape): chunk
    * i covers words [(i−1)·stride+1, (i−1)·stride+n], so consecutive
    * chunks share n−stride words of context. Chunk count is
    * ⌈(len−(n−stride))/stride⌉ (min 1), in integer arithmetic so the
    * DuckDB replica computes the identical boundary; the tail chunk is
    * short rather than padded. Pure codegen'd array work — explode the
    * result to get one row per chunk at corpus scale, no UDF.
    */
  def slidingChunks(c: Column, n: Int, stride: Int): Column = {
    require(stride >= 1 && stride <= n,
      s"stride must be in [1, n]: n=$n stride=$stride")
    val ws = tokens(c)
    val overlap = n - stride
    // int-div spelled as truncating double division, the wordChunks
    // idiom (numerator +stride−1 makes truncation equal ceil)
    val nChunks = greatest(lit(1),
      ((size(ws) - lit(overlap) + lit(stride - 1)) / lit(stride)).cast("int"))
    transform(sequence(lit(1), nChunks),
      i => array_join(slice(ws, (i - lit(1)) * lit(stride) + lit(1), lit(n)), " "))
  }

  // --- PII scrubbing ----------------------------------------------------

  /** Regexes restricted to the Java-regex ∩ RE2 common dialect so the
    * DuckDB oracle applies the identical patterns. Replacement order
    * matters (email before IP before phone) and is part of the contract.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\+\\d[\\d -]{6,}\\d"

  /** Training corpora must not memorize contact details: replace emails,
    * IPv4 addresses, and international-format phone numbers with typed
    * placeholder tags. Three codegen'd regexp_replace passes — one
    * projection, no UDF, linear scan at any scale.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  // --- repetition scoring (Gopher-style quality filters) ----------------

  /** Fraction of word occurrences that are repeats of an earlier word:
    * 1 - distinct/total. High values flag boilerplate/keyword-stuffed
    * documents that length and punctuation filters miss.
    */
  def dupWordRatio(c: Column): Column = {
    val ws = tokens(c)
    Rounding.pround(lit(1.0) -
      size(array_distinct(ws)).cast("double") / size(ws).cast("double"), 4)
  }

  /** Same signal over word n-grams (n=2..4 in the Gopher repetition
    * filter family): repeated phrases score high even when individual
    * word frequencies look normal.
    */
  def dupNgramRatio(c: Column, n: Int): Column = {
    val gs = wordShingles(c, n)
    Rounding.pround(lit(1.0) -
      size(array_distinct(gs)).cast("double") / size(gs).cast("double"), 4)
  }
}
