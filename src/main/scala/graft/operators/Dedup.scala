package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Rounding, TextFunctions}

/** Document deduplication operators for the training-data tier:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every variant is a bounded-fan-out shuffle, never an
  * all-pairs cross join. Exact dedup is one hash-groupBy. Jaccard and
  * MinHash build an inverted index (explode → self-equi-join on the
  * token/bucket) so candidate generation touches only documents that
  * actually share a shingle/bucket — the standard way these survive a
  * 1000-executor, 100 TB corpus. SimHash bands 64 bits into 4×16-bit
  * keys so candidate pairs co-locate by band value.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text, keeping the
    * smallest id (deterministic), with the copy count. One map-side-
    * combinable groupBy — the cheapest possible dedup at any scale.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Sketch-based corpus cardinality: exact distinct content hashes next
    * to the HLL++ estimate (`approx_count_distinct`). At 100 TB the
    * exact count is a full shuffle of all hashes; the sketch is a
    * constant-size (~few KB) mergeable state per partition — the right
    * first pass for "how duplicated is this crawl" before paying for
    * exact dedup.
    */
  def dupStats(docs: DataFrame, textCol: String,
               rsd: Double = 0.01): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol))).as("n_distinct_exact"),
      approx_count_distinct(md5(col(textCol)), rsd).as("n_distinct_approx"))

  /** Distinct word-n-gram shingles per document — the shared first stage
    * of the Jaccard and MinHash paths.
    */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol),
      explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs via inverted index:
    * explode distinct shingles, self-join on the shingle (only docs
    * sharing a shingle meet), count the intersection per pair, join the
    * per-doc set sizes, filter by threshold. No cross join anywhere; the
    * fan-out is bounded by shingle frequency (rare for word 5-grams).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, minJaccard: Double): DataFrame =
    // the shingle set feeds three consumers (both join sides + sizes);
    // persist so the explode+hash stage runs once, not three times
    jaccardFromShingles(shingled(docs, idCol, textCol, n).persist(),
      idCol, minJaccard)

  private def jaccardFromShingles(sh: DataFrame, idCol: String,
                                  minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_shingles").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_shingles").as("n_b")), "id_b")
      .withColumn("jaccard",
        Rounding.pround(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** Text top-k similarity join: for each query document, the k most
    * Jaccard-similar other documents. Candidates come from the inverted
    * shingle index (only docs sharing a shingle are scored — docs with
    * zero overlap have similarity 0 and can never enter a top-k that
    * requires n_common >= 1), so cost scales with index fan-out, not
    * |queries| × |corpus|. Deterministic ranking: (jaccard desc, id).
    */
  def jaccardTopK(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, k: Int,
                  queryPredicate: Column): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n).persist()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val q = sh.filter(queryPredicate)
      .select(col(idCol).as("query_id"), col("shingle"))
    val c = sh.select(col(idCol).as("cand_id"), col("shingle"))
    val inter = q.join(c, Seq("shingle"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id").agg(count(lit(1)).as("n_common"))
    val scored = inter
      .join(sizes.select(col(idCol).as("query_id"), col("n_shingles").as("n_q")), "query_id")
      .join(sizes.select(col(idCol).as("cand_id"), col("n_shingles").as("n_c")), "cand_id")
      .withColumn("jaccard",
        Rounding.pround(col("n_common").cast("double") /
          (col("n_q") + col("n_c") - col("n_common")), 4))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("jaccard").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "jaccard", "rank")
  }

  /** MinHash signatures: numHashes independent min-hashes per document.
    * Hash h_j(shingle) = an 8-hex-char (32-bit) slice of
    * md5(j/4 || '|' || shingle): one md5 yields four independent
    * hashes, so a 12-hash signature costs 3 digests per shingle instead
    * of 12. The md5 columns are projected once per shingle row before
    * the aggregation, leaving the 12 min-aggregates as cheap substrings.
    * Deterministic and reproducible in any engine — the oracle SQL is
    * generated from the same layout. For a pure-throughput variant swap
    * md5 for xxhash64; the LSH algebra is unchanged.
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame =
    signaturesFromShingles(shingled(docs, idCol, textCol, shingleN),
      idCol, numHashes)

  private def signaturesFromShingles(sh: DataFrame, idCol: String,
                                     numHashes: Int): DataFrame = {
    val numMd5 = (numHashes + 3) / 4
    val withDigests = sh.select(col(idCol) +: (0 until numMd5).map(p =>
      md5(concat(lit(s"$p|"), col("shingle"))).as(s"m$p")): _*)
    val mins = (0 until numHashes).map { j =>
      min(substring(col(s"m${j / 4}"), (j % 4) * 8 + 1, 8)).as(s"h$j")
    }
    withDigests.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash LSH candidate pairs: split the signature into `bands` bands
    * of `rowsPerBand` hashes; documents agreeing on any full band are
    * candidates. Each band is a groupBy key — candidates co-locate in
    * one shuffle, never compared all-pairs.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, bands: Int, rowsPerBand: Int): DataFrame =
    lshPairsFromSignatures(
      minHashSignatures(docs, idCol, textCol, shingleN, bands * rowsPerBand)
        .persist(), // reused by both sides of the self-join
      idCol, bands, rowsPerBand)

  private def lshPairsFromSignatures(sig: DataFrame, idCol: String,
                                     bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = bandRowsOf(sig, idCol, bands, rowsPerBand)
    val x = bandRows.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val y = bandRows.select(col(idCol).as("id_b"), col("band"), col("sig"))
    x.join(y, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The standard candidate→verify composition: MinHash-LSH proposes
    * pairs (cheap, recall-oriented), exact n-gram Jaccard confirms them
    * (precision). At 100 TB the verify stage touches only the candidate
    * pairs — a semi-join back to the shingle index — so its cost is
    * |candidates| × shingles-per-doc, independent of corpus size.
    */
  def minHashVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                           shingleN: Int, bands: Int, rowsPerBand: Int,
                           minJaccard: Double): DataFrame = {
    // one shingle explode feeds both the LSH and the verify stages
    val sh = shingled(docs, idCol, textCol, shingleN).persist()
    val candidates = lshPairsFromSignatures(
      signaturesFromShingles(sh, idCol, bands * rowsPerBand).persist(),
      idCol, bands, rowsPerBand)
    val exact = jaccardFromShingles(sh, idCol, minJaccard)
    exact.join(candidates, Seq("id_a", "id_b"), "left_semi")
  }

  /** Banded (band, sig) rows from a signature table — shared by the
    * batch and incremental LSH paths.
    */
  private def bandRowsOf(sig: DataFrame, idCol: String, bands: Int,
                         rowsPerBand: Int): DataFrame =
    (0 until bands).map { b =>
      val sigCols = (0 until rowsPerBand)
        .map(r => col(s"h${b * rowsPerBand + r}"))
      sig.select(col(idCol), lit(b).as("band"), concat(sigCols: _*).as("sig"))
    }.reduce(_.unionByName(_))

  /** Incremental LSH: candidate pairs that involve at least one NEW
    * document — new×new and new×existing, never existing×existing
    * (those were found in earlier runs). This is how minhash dedup runs
    * at 100 TB: signatures are computed once per document at ingest and
    * stored; each batch joins its band rows against the corpus index
    * instead of re-banding the world. Cost per batch scales with
    * |new| × bucket-occupancy, not with |corpus|².
    */
  def minHashLshPairsIncremental(existingSigs: DataFrame, newSigs: DataFrame,
                                 idCol: String, bands: Int,
                                 rowsPerBand: Int): DataFrame = {
    val allBands = bandRowsOf(existingSigs.unionByName(newSigs), idCol,
      bands, rowsPerBand)
    val newBands = bandRowsOf(newSigs, idCol, bands, rowsPerBand)
    val x = allBands.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val y = newBands.select(col(idCol).as("id_b"), col("band"), col("sig"))
    x.join(y, Seq("band", "sig"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** 64-bit SimHash per document: tokens vote on each bit of their
    * xxhash64; a bit is set when strictly more than half the tokens have
    * it set. Instead of 64 separate sums, the per-bit ones-counts are
    * packed 4-per-long into 16 lane-packed sum aggregates (16-bit lanes,
    * safe for documents up to 65 535 tokens): 4× smaller aggregation
    * state on the shuffle and far less generated code, with no branches
    * in the per-row path. bit j = (2·ones_j > n_tokens) ≡ the ±1-vote
    * sign.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    // packed_k lane l (16 bits) accumulates ones-count of bit j = 4k+l
    val packedSums = (0 until 16).map { k =>
      val lanes = (0 until 4).map { l =>
        val j = 4 * k + l
        shiftleft(shiftrightunsigned(col("h"), j).bitwiseAND(1), 16 * l)
      }
      sum(lanes.reduce(_.bitwiseOR(_))).as(s"p$k")
    }
    val summed = toks.groupBy(col(idCol))
      .agg(packedSums.head, (packedSums.tail :+ count(lit(1)).as("n")): _*)
    val hash = (0 until 64).map { j =>
      val ones = shiftrightunsigned(col(s"p${j / 4}"), 16 * (j % 4))
        .bitwiseAND(0xFFFFL)
      when(ones * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    summed.select(col(idCol), hash.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * keys (pigeonhole: any pair within Hamming distance 3 agrees on at
    * least one band), join per band, verify with bit_count(xor).
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sh = simHash(docs, idCol, textCol).persist()
    val banded = (0 until 4).map(b =>
      sh.select(col(idCol), lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * 16)
          .bitwiseAND(0xFFFFL).as("key"),
        col("simhash"))).reduce(_.unionByName(_))
    val x = banded.select(col(idCol).as("id_a"), col("band"), col("key"),
      col("simhash").as("sh_a"))
    val y = banded.select(col(idCol).as("id_b"), col("band"), col("key"),
      col("simhash").as("sh_b"))
    x.join(y, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
