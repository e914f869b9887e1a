package graft

import graft.operators.Bpe

/** BPE learner/tokenizer: the Sennrich et al. reference example,
  * determinism, apply/learn consistency, and the corpus-scale arc
  * (bounded word-count pass → driver learn → distributed apply).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic subword-nmt demo vocabulary
  private val freqs = Seq[(String, Long)](
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))

  test("learnMerges reproduces the canonical greedy merge order on the " +
      "reference vocabulary") {
    val merges = Bpe.learnMerges(freqs, 4)
    // pair counts round 1: (e,s)=9 (newest+widest) wins, then (es,t)=9,
    // then (est,</w>)=9, then (l,o)=7 (low+lower)
    assert(merges.map(m => (m.left, m.right)) == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow), ("l", "o")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("encodeWord applies merges greedily by rank; unseen words fall " +
      "back to characters") {
    val ranks = Bpe.learnMerges(freqs, 10)
      .map(m => ((m.left, m.right), m.rank)).toMap
    // the most frequent vocabulary word merges all the way to one token
    assert(Bpe.encodeWord("newest", ranks) == Vector("newest" + Bpe.Eow))
    // "lowest": "low" learned as a unit + "est</w>" learned as a unit
    val lowest = Bpe.encodeWord("lowest", ranks)
    assert(lowest.contains("est" + Bpe.Eow), lowest.toString)
    // a word sharing no learned pairs stays at character granularity
    assert(Bpe.encodeWord("zq", Map.empty) ==
      Vector("z", "q", Bpe.Eow))
  }

  test("learning stops early when no pair repeats (merge list is " +
      "shorter than requested, never padded)") {
    val merges = Bpe.learnMerges(Seq(("ab", 1L)), 100)
    // "a b </w>" pairs each occur once → nothing to merge
    assert(merges.isEmpty)
  }

  test("end-to-end on the fixture corpus: bounded word-count learn + " +
      "distributed tokenize roundtrip") {
    val docs = Tables.load(spark, sf, "documents")
    val merges = Bpe.learn(docs, "text", nMerges = 50, maxWords = 2000)
    assert(merges.nonEmpty && merges.length <= 50)
    // determinism: learning twice yields identical merges
    assert(Bpe.learn(docs, "text", 50, 2000) == merges)
    val sample = docs.limit(20)
    val texts = sample.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val toks = Bpe.tokenize(sample, "doc_id", "text", merges).collect()
    assert(toks.length == 20)
    toks.foreach { d =>
      assert(d.n_tokens == d.tokens.length && d.n_tokens > 0)
      // detokenizing — strip </w>, concatenate — reproduces the words
      val rebuilt = d.tokens.mkString("")
        .split(java.util.regex.Pattern.quote(Bpe.Eow)).filter(_.nonEmpty)
      val expected = texts(d.doc_id).toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(rebuilt.sameElements(expected),
        s"detokenization mismatch for doc ${d.doc_id}")
    }
  }

  test("merge application weighted by frequency: higher-frequency pairs " +
      "learned first (deterministic tie-break)") {
    // "aa" appears 10×, "bb" 3× — merge 0 must come from the frequent
    // word's pairs ((a,</w>) wins its 10-count tie with (a,a)
    // lexicographically; both beat every "b" pair)
    val merges = Bpe.learnMerges(Seq(("aa", 10L), ("bb", 3L)), 2)
    assert(merges.head.left.startsWith("a"))
  }
}
