package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword vocabulary: learn merges from the corpus,
  * apply them as a tokenizer (Sennrich et al., ACL 2016 — the
  * subword-nmt formulation over a word-frequency table).
  *
  * Scale shape: learning does NOT iterate over the corpus. One
  * map-side-combinable word-count pass reduces 100 TB of text to a
  * frequency table; the top `maxWords` rows of that table (a bounded,
  * deterministically-ordered sample — the [[Similarity]] quantizers'
  * trainView argument applied to vocabulary) collect to the driver,
  * and the classic greedy merge loop runs there in milliseconds per
  * merge. Applying the learned merges back to the corpus is a pure map
  * (broadcast rank table, per-word greedy merge loop) — no shuffle, no
  * driver round-trips, linear in corpus size.
  *
  * Word frequencies, not running text, drive the pair statistics —
  * exactly subword-nmt's trick: pair counts weighted by word frequency
  * are identical to counting over the flattened corpus restricted to
  * within-word pairs, at vocabulary (not corpus) cost per iteration.
  */
object Bpe {

  /** End-of-word sentinel: distinguishes "est</w>" (suffix) from "est"
    * (interior) — the standard BPE word-boundary marker.
    */
  val Eow = "</w>"

  final case class Merge(left: String, right: String, rank: Int)

  /** One distributed word-count pass → bounded driver-side frequency
    * table: the top `maxWords` words by (count desc, word) — a
    * deterministic total order, so the learned vocabulary is
    * reproducible regardless of partitioning.
    */
  def wordFrequencies(docs: DataFrame, textCol: String,
                      maxWords: Int): Seq[(String, Long)] = {
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
  }

  /** Greedy merge learning over the frequency table (driver-side —
    * the table is bounded by construction). Each round counts all
    * adjacent symbol pairs weighted by word frequency, merges the most
    * frequent pair (ties: lexicographic, so learning is deterministic),
    * and rewrites the table. Stops early when no pair repeats.
    */
  def learnMerges(freqs: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] = freqs.map { case (w, n) =>
      (w.map(_.toString).toVector :+ Eow, n)
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), n, (a, b) => a + b)
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      val best = counts.asScala.filter(_._2 > 1).toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case None => done = true
        case Some(((l, r), _)) =>
          merges += Merge(l, r, rank)
          words = words.map { case (syms, n) => (mergePair(syms, l, r), n) }
          rank += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Vector[String], l: String,
                        r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn from the corpus: word-count pass + driver-side loop. */
  def learn(docs: DataFrame, textCol: String, nMerges: Int,
            maxWords: Int = 50000): Seq[Merge] =
    learnMerges(wordFrequencies(docs, textCol, maxWords), nMerges)

  /** Tokenize one word with the learned ranks: start from characters,
    * repeatedly merge the best-ranked adjacent pair present. Greedy by
    * rank — the canonical BPE apply.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = syms.length > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms
  }

  final case class TokenizedDoc(doc_id: Long, tokens: Seq[String],
                                n_tokens: Int)

  /** Distributed apply: broadcast the rank table, map every document to
    * its BPE token sequence — no shuffle, cost linear in text volume.
    * (A typed map, not a SQL UDF: the per-word merge loop is genuinely
    * imperative, the documented escape hatch.)
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): Dataset[TokenizedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => ((m.left, m.right), m.rank)).toMap)
    docs.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split("\\s+").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, ranks.value)).toSeq
        TokenizedDoc(id, toks, toks.length)
      }
  }
}
