package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Contamination, LanguageModel, Packing, Profile, Quality, Sampling}

/** Training-data pipeline extras: contamination detection, PII scrub,
  * repetition features, sequence packing, mixture planning.
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("contamination flags a train doc containing an eval doc's shingles") {
    val docs = Seq(
      // eval doc (id % 20 == 0): a 7-word question
      (20L, "what is the capital city of france"),
      // train doc fully containing it inside a longer page
      (1L, "trivia page says what is the capital city of france and much more text follows here"),
      // unrelated train doc
      (2L, "completely different content about cooking pasta at home")).toDF("doc_id", "text")
    val out = Contamination.overlap(docs, "doc_id", "text", n = 5,
      col("doc_id") % 20 === 0, minContainment = 0.5)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((20L, 1L)))
    // eval doc has 3 distinct 5-gram shingles, all contained -> 1.0
    assert(out.head.getAs[Double]("containment") == 1.0)
  }

  test("bloom prefilter: identical pairs to the exact path, and clean " +
    "docs are dropped before the join") {
    val d = Tables.load(spark, sf, "documents")
    val exactPairs = Contamination.overlap(d, "doc_id", "text", 5,
      col("doc_id") % 20 === 0, 0.2)
      .select("eval_id", "train_id", "n_common", "containment")
      .as[(Long, Long, Long, Double)].collect().toSet
    val prefiltered = Contamination.overlapPrefiltered(d, "doc_id", "text", 5,
      col("doc_id") % 20 === 0, 0.2)
      .select("eval_id", "train_id", "n_common", "containment")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(prefiltered == exactPairs,
      "bloom has no false negatives — results must be identical")
    // the prefilter must actually prune: far fewer docs reach the join
    // than the full corpus (fpp=1% on a disjoint-shingle majority)
    val survivors = Contamination.bloomSurvivors(d, "doc_id", "text", 5,
      col("doc_id") % 20 === 0).count()
    val total = d.count()
    assert(survivors < total / 2,
      s"prefilter kept $survivors of $total docs — not pruning")
    // every flagged train doc and every eval doc must survive
    val mustKeep = exactPairs.map(_._2) ++
      d.filter(col("doc_id") % 20 === 0).select("doc_id").as[Long].collect()
    val kept = Contamination.bloomSurvivors(d, "doc_id", "text", 5,
      col("doc_id") % 20 === 0).select("doc_id").as[Long].collect().toSet
    assert(mustKeep.subsetOf(kept))
  }

  test("contamination uses containment, not jaccard: short eval inside " +
    "long train still flags") {
    val evalText = "alpha beta gamma delta epsilon"
    val filler = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (40L, evalText),
      (3L, s"$filler $evalText $filler")).toDF("doc_id", "text")
    val out = Contamination.overlap(docs, "doc_id", "text", n = 5,
      col("doc_id") % 20 === 0, minContainment = 0.9).collect()
    assert(out.length == 1 && out.head.getAs[Double]("containment") == 1.0)
  }

  test("scrubPii replaces emails, IPv4s, and phone numbers, leaves prose") {
    val df = Seq(
      "mail me at jane.doe+spam@corp.example.org thanks",
      "server 192.168.001.1 responded",
      "call +49 30 901820 now",
      "no pii here, just 12 plain words and a 3.14 constant")
      .toDF("t")
    val out = df.select(TextFunctions.scrubPii($"t").as("c")).as[String].collect()
    assert(out(0) == "mail me at [EMAIL] thanks")
    assert(out(1) == "server [IP] responded")
    assert(out(2) == "call [PHONE] now")
    assert(out(3) == "no pii here, just 12 plain words and a 3.14 constant")
  }

  test("repetition ratios: distinct text scores 0, repeated text scores high") {
    val df = Seq(
      ("clean", "one two three four five six"),
      ("loop", "spam spam spam spam spam spam")).toDF("k", "t")
    val out = df.select($"k",
      TextFunctions.dupWordRatio($"t").as("w"),
      TextFunctions.dupNgramRatio($"t", 2).as("b"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("clean") == ((0.0, 0.0)))
    // 6 words, 1 distinct -> 1 - 1/6 = 0.8333; 5 bigrams, 1 distinct -> 0.8
    assert(out("loop") == ((0.8333, 0.8)))
  }

  test("packBins assigns contiguous bins per group under the budget") {
    val docs = Seq(
      (1L, "g1", 1000L), (2L, "g1", 1000L), (3L, "g1", 1000L),
      (4L, "g1", 1000L), (5L, "g2", 5000L), (6L, "g2", 100L))
      .toDF("doc_id", "grp", "n")
    val out = Packing.packBins(docs, "doc_id", "grp", col("n"), budget = 2048)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // g1 offsets 0,1000,2000,3000 -> bins 0,0,0,1
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((1000L, 0L)))
    assert(out(3L) == ((2000L, 0L)) && out(4L) == ((3000L, 1L)))
    // g2 independent stream: offsets 0, 5000 -> bins 0, 2
    assert(out(5L) == ((0L, 0L)) && out(6L) == ((5000L, 2L)))
  }

  test("splitLabel is disjoint, exhaustive, and membership-stable") {
    val ids = (1L to 2000L).toDF("id")
    val out = ids.select($"id",
      Sampling.splitLabel($"id", 16, 32).as("split"))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row gets exactly one of the three labels
    assert(counts.values.sum == 2000L && counts.keySet == Set("train", "val", "test"))
    // ≈ 6.25% val, 12.5% test (md5 is uniform; generous tolerance)
    assert(counts("val") > 60 && counts("val") < 200)
    assert(counts("test") > 150 && counts("test") < 350)
    // growing the corpus never reassigns an existing key
    val before = out.filter($"id" <= 1000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = (1L to 1000L).toDF("id").select($"id",
      Sampling.splitLabel($"id", 16, 32).as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after)
  }

  test("leakageSafeSplit: near-duplicates always share a split; " +
      "singletons match the plain doc-id split") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1L to 40L).map(i => (i, s"unique document number $i " +
      s"with its own words ${"w" + i} ${"x" + i} ${"y" + i}")) ++
      Seq((101L, dup), (102L, dup), (103L, dup + " tail")))
      .toDF("doc_id", "text")
    val pairs = Seq((101L, 102L), (102L, 103L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 16, 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // the whole dup cluster keys on min id 101 and shares one split
    assert(Set(101L, 102L, 103L).map(out(_)._1) == Set(101L))
    assert(Set(101L, 102L, 103L).map(out(_)._2).size == 1)
    // singletons: cluster key = own id, so label ≡ plain splitLabel
    val plain = docs.filter($"doc_id" <= 40)
      .select($"doc_id", Sampling.splitLabel($"doc_id", 16, 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 1L to 40L) assert(out(i)._2 == plain(i), s"doc $i")
  }

  test("quality verdict applies checks in precedence order; clean keeps " +
    "exactly the keep rows") {
    val docs = Seq(
      (1L, "too short"),                                             // too_short
      (2L, ("the a of to and in is it that " * 3).trim),             // keep (en)
      (3L, ("uno dos tres " * 10).trim),                             // bad_lang (no markers)
      (4L, ("spam " * 30).trim + " the a of to and in is it that"))  // repetitive
      .toDF("doc_id", "text")
    val t = Quality.Thresholds(minTokens = 5, maxTokens = 100,
      allowedLangs = Seq("en", "de", "es", "fr"),
      minQuality = 0.0, maxDupWordRatio = 0.7) // doc2 = 0.6667, doc4 = 0.7436
    val v = Quality.verdict(docs, "doc_id", "text", t).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(v(1L) == "too_short")
    assert(v(2L) == "keep")
    assert(v(3L) == "bad_lang")
    assert(v(4L) == "repetitive")
    val kept = Quality.clean(docs, "doc_id", "text", t)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("blocklist gate: armed thresholds add the n_blocked signal and " +
    "the blocked verdict after bad_lang; clean drops blocked docs") {
    val docs = Seq(
      (1L, "the a of to and in is it that bad stuff here ok then"), // blocked
      (2L, "the a of to and in is it that all fine here ok then"),  // keep
      (3L, ("uno dos tres bad stuff " * 4).trim))    // bad_lang wins precedence
      .toDF("doc_id", "text")
    val base = Quality.Thresholds(minTokens = 5, maxTokens = 100,
      minQuality = 0.0, maxDupWordRatio = 1.0)
    val armed = base.copy(blockedPhrases = Seq("bad stuff", "zz"))
    val v = Quality.verdict(docs, "doc_id", "text", armed)
    // armed schema: the extra signal column, then the verdict
    assert(v.columns.toSeq == Seq("doc_id", "n_tokens", "lang_id",
      "quality", "dup_word_ratio", "n_blocked", "verdict"))
    val got = v.collect()
      .map(r => r.getLong(0) -> (r.getInt(5), r.getString(6))).toMap
    assert(got(1L) == (1, "blocked"))
    assert(got(2L) == (0, "keep"))
    assert(got(3L)._2 == "bad_lang") // precedence: lang gate first
    val kept = Quality.clean(docs, "doc_id", "text", armed)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
    // unarmed (default) thresholds: schema and verdicts unchanged
    val plain = Quality.verdict(docs, "doc_id", "text", base)
    assert(!plain.columns.contains("n_blocked"))
    assert(plain.collect().map(r => r.getString(5)).count(_ == "keep") == 2)
  }

  test("shuffled packing reorders within the group but conserves totals") {
    val docs = (1L to 20L).map(i => (i, "g", 100L)).toDF("doc_id", "grp", "n")
    val plain = Packing.packBins(docs, "doc_id", "grp", col("n"), 512)
    val shuffled = Packing.packBins(docs, "doc_id", "grp", col("n"), 512,
      Seq(Sampling.shuffleKey(col("doc_id"), "s1"), col("doc_id")))
    val po = plain.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val so = shuffled.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // same offset SET (a permutation of the same token stream)…
    assert(po.values.toSeq.sorted == so.values.toSeq.sorted)
    // …but a genuinely different order, and deterministic across runs
    assert(po != so)
    val so2 = Packing.packBins(docs, "doc_id", "grp", col("n"), 512,
      Seq(Sampling.shuffleKey(col("doc_id"), "s1"), col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(so == so2)
  }

  test("temperature rates: tau=1 keeps the natural mix, tau=0 targets " +
    "uniform, tau=0.5 sits between and the most-boosted group keeps all") {
    val mix = Seq(("big", 900L), ("small", 100L)).toDF("g", "n")
    def rates(tau: Double) = Profile.temperatureRates(mix, "g", "n", tau)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    val t1 = rates(1.0)
    assert(t1("big") == ((0.9, 1.0)) && t1("small") == ((0.1, 1.0)))
    val t0 = rates(0.0)
    assert(t0("big")._1 == 0.5 && t0("small")._1 == 0.5)
    // uniform target: big keeps 1/9 of what small keeps
    assert(math.abs(t0("big")._2 - 1.0 / 9) < 1e-6 && t0("small")._2 == 1.0)
    val th = rates(0.5)
    assert(th("big")._1 > 0.5 && th("big")._1 < 0.9)
    assert(th("small")._2 == 1.0 && th("big")._2 < 1.0)
  }

  test("temperature rates drop zero-token groups instead of poisoning " +
    "every keep_rate with NaN") {
    val mix = Seq(("full", 900L), ("empty", 0L)).toDF("g", "n")
    val out = Profile.temperatureRates(mix, "g", "n", 0.5).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(!out.contains("empty"))
    assert(out("full") == ((1.0, 1.0)))
  }

  test("line dedup strips cross-doc boilerplate lines, keeps doc order, " +
    "and survives a fully-boilerplate doc") {
    import graft.operators.LineDedup
    val boiler = "subscribe to our newsletter now"
    val docs = Seq(
      (1L, Array("unique alpha text", boiler, "unique beta text")),
      (2L, Array(boiler, "other content here")),
      (3L, Array("third doc body", boiler)),
      (4L, Array(boiler))) // nothing survives
      .toDF("doc_id", "lines")
    val out = LineDedup.dedupLines(docs, "doc_id", col("lines"), maxDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("unique alpha text unique beta text", 2L, 1L)))
    assert(out(2L) == (("other content here", 1L, 1L)))
    assert(out(3L) == (("third doc body", 1L, 1L)))
    assert(out(4L) == (("", 0L, 1L)))
  }

  test("wordChunks covers every word exactly once in n-word chunks") {
    val df = Seq("a b c d e f g h i j k").toDF("t") // 11 words
    val out = df.select(TextFunctions.wordChunks($"t", 5).as("c"))
      .as[Seq[String]].head()
    assert(out == Seq("a b c d e", "f g h i j", "k"))
  }

  test("mixSummary shares sum to 1 and uniform weights invert the skew") {
    val docs = Seq.fill(8)(("en", "a b c d")) ++ Seq.fill(2)(("de", "a b c d"))
    val df = docs.toDF("lang", "text")
    val out = Profile.mixSummary(df, "lang",
      TextFunctions.tokenCount(col("text"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out("en") == ((8L, 32L, 0.8, 0.625)))   // 20/32 tokens target
    assert(out("de") == ((2L, 8L, 0.2, 2.5)))      // upsample 2.5x
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-9)
  }

  test("klDrift: an identically-distributed group scores 0, a divergent " +
      "group scores higher the further it drifts, and KL is never negative") {
    // en and de share one distribution; fr is token-disjoint
    val docs = Seq(("en", "a a b c"), ("de", "a a b c"),
      ("fr", "x y z z")).toDF("lang", "text")
    val kl = Profile.klDrift(docs, "lang", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(kl.keySet == Set("en", "de", "fr"))
    assert(kl("en")._1 == 4 && kl("en")._2 == kl("de")._2)
    assert(kl.values.forall(_._2 >= 0.0), s"KL must be non-negative: $kl")
    assert(kl("fr")._2 > kl("en")._2 + 0.5,
      s"disjoint group must drift hardest: $kl")
    // hand value: every fr occurrence scores ln((c·12)/(4·c)) = ln 3
    assert(math.abs(kl("fr")._2 - math.log(3.0)) < 1e-5, kl("fr").toString)
  }

  test("ngramNovelty: corpus-unique shingles score 1, a doc duplicated " +
      "verbatim scores 0, and a half-shared doc sits between") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),          // exact dup of 1
      (3L, "totally fresh words never repeated anywhere else"),
      (4L, "alpha beta gamma unique tail closes here")) // shares a prefix
      .toDF("doc_id", "text")
    val nov = Dedup.ngramNovelty(docs, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nov(1L) == 0.0 && nov(2L) == 0.0, s"dups have no unique grams: $nov")
    assert(nov(3L) == 1.0, s"fresh doc is fully novel: $nov")
    assert(nov(4L) > 0.0 && nov(4L) < 1.0, s"partial overlap: $nov")
  }

  test("LM cross-entropy matches the hand-computed smoothed unigram " +
      "value; OOV and rare tokens score higher; filter gates on xent") {
    import graft.operators.LanguageModel
    val ref = Seq((1L, "a a b"), (2L, "a a a")).toDF("doc_id", "text")
    val lm = LanguageModel.unigramLm(ref, "text") // a→5, b→1; T=6, V=2

    // p(a)=5.5/7.5, p(b)=1.5/7.5, p(OOV)=0.5/7.5  (α=0.5, denom=T+α(V+1))
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (la, lb, loov) = (r9(math.log(5.5 / 7.5) / math.log(2)),
      r9(math.log(1.5 / 7.5) / math.log(2)),
      r9(math.log(0.5 / 7.5) / math.log(2)))

    val cand = Seq((10L, "a a a"), (11L, "a a b"), (12L, "q a"))
      .toDF("doc_id", "text")
    val got = LanguageModel.crossEntropy(cand, "doc_id", "text", lm)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    assert(got(10L) == r6(-la))
    assert(got(11L) == r6(-(2 * la + lb) / 3))
    assert(got(12L) == r6(-(loov + la) / 2))
    // fluency ordering: all-common < mixed < OOV-bearing
    assert(got(10L) < got(11L) && got(11L) < got(12L))

    // the filter keeps docs at or under the threshold, drops the rest
    val mid = (got(11L) + got(12L)) / 2
    val kept = LanguageModel.perplexityFilter(cand, "doc_id", "text", lm,
      maxXent = mid).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L))

    // an empty-ish doc (one token) still scores; a doc is never split
    // across output rows
    val out = LanguageModel.crossEntropy(cand, "doc_id", "text", lm)
    assert(out.count() == out.select("doc_id").distinct().count())
  }

  test("interpolated bigram LM: λ=0 is bit-identical to the unigram " +
      "scorer; sequence structure lowers xent when λ>0") {
    import graft.operators.LanguageModel
    val ref = Seq((1L, "a b a b a b a b"), (2L, "a b a b")).toDF("doc_id", "text")
    val uni = LanguageModel.unigramLm(ref, "text")
    val big = LanguageModel.bigramLm(ref, "text")
    val cand = Seq((10L, "a b a b a b"), (11L, "b a b a")).toDF("doc_id", "text")

    // λ=0: the mixture collapses to the unigram floor exactly (0·x+1·p)
    val viaBigram = LanguageModel.crossEntropyBigram(cand, "doc_id", "text",
      uni, big, lambda = 0.0)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    val viaUnigram = LanguageModel.crossEntropy(cand, "doc_id", "text", uni)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    assert(viaBigram == viaUnigram)

    // λ>0 on text whose bigrams the LM has seen: the conditional is
    // sharper than the marginal, so xent strictly drops
    val mixed = LanguageModel.crossEntropyBigram(cand, "doc_id", "text",
      uni, big, lambda = 0.7)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    assert(mixed(10L) < viaUnigram(10L),
      s"bigram structure not captured: ${mixed(10L)} vs ${viaUnigram(10L)}")

    // document boundaries: no bigram spans two reference docs — the
    // count of (b,a) comes only from within-doc adjacency
    val cnt = big.filter($"prev" === "b" && $"token" === "a")
      .select("cnt2").as[Long].collect()
    assert(cnt.headOption.getOrElse(0L) == 4L,
      "expected 3 within-doc (b,a) pairs in doc 1 + 1 in doc 2")
  }

  test("interpolated trigram LM: λ₃=0 is bit-identical to the bigram " +
      "scorer; trigram structure sharpens further when λ₃>0") {
    import graft.operators.LanguageModel
    val ref = Seq((1L, "a b c a b c a b c"), (2L, "a b c a b c"))
      .toDF("doc_id", "text")
    val uni = LanguageModel.unigramLm(ref, "text")
    val big = LanguageModel.bigramLm(ref, "text")
    val tri = LanguageModel.trigramLm(ref, "text")
    val cand = Seq((10L, "a b c a b c"), (11L, "c b a c b a"))
      .toDF("doc_id", "text")

    // λ₃=0: 0·p₃ + x = x and 1.0−0.0−λ₂ ≡ 1.0−λ₂ in IEEE → the
    // trigram scorer collapses to the bigram scorer exactly
    val viaTri = LanguageModel.crossEntropyTrigram(cand, "doc_id", "text",
      uni, big, tri, lambda3 = 0.0, lambda2 = 0.7)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    val viaBig = LanguageModel.crossEntropyBigram(cand, "doc_id", "text",
      uni, big, lambda = 0.7)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    assert(viaTri == viaBig)

    // second-order structure: where the bigram is AMBIGUOUS
    // (p(c|b) = 0.5 — b is followed by c or y depending on what came
    // before) but the trigram is deterministic (p(c|a,b) = 1), a
    // floor-matched mix (λ₃+λ₂ = 0.7 vs bigram λ = 0.7, same 0.3
    // unigram weight) must score strictly sharper
    val ref2 = Seq((1L, "a b c a b c a b c"), (2L, "x b y x b y x b y"))
      .toDF("doc_id", "text")
    val (uni2, big2, tri2) = (LanguageModel.unigramLm(ref2, "text"),
      LanguageModel.bigramLm(ref2, "text"),
      LanguageModel.trigramLm(ref2, "text"))
    val cand2 = Seq((20L, "a b c a b c")).toDF("doc_id", "text")
    val triSharp = LanguageModel.crossEntropyTrigram(cand2, "doc_id",
      "text", uni2, big2, tri2, lambda3 = 0.35, lambda2 = 0.35)
      .select($"xent").as[Double].head()
    val bigAmbig = LanguageModel.crossEntropyBigram(cand2, "doc_id",
      "text", uni2, big2, lambda = 0.7)
      .select($"xent").as[Double].head()
    assert(triSharp < bigAmbig,
      s"trigram structure not captured: $triSharp vs $bigAmbig")

    // boundaries: no trigram spans reference docs — (a,b,c) appears
    // 3+2 times, all within-doc
    val c3 = tri.filter($"prev2" === "a" && $"prev" === "b" &&
      $"token" === "c").select("cnt3").as[Long].collect()
    assert(c3.headOption.getOrElse(0L) == 5L)
  }

  test("stupid backoff: hand-computed in-corpus score, position-aware " +
      "ladder, penalty direction, β-hop count") {
    import graft.operators.LanguageModel
    def lms(ref: org.apache.spark.sql.DataFrame) =
      (LanguageModel.unigramLm(ref, "text"),
        LanguageModel.bigramLm(ref, "text"),
        LanguageModel.trigramLm(ref, "text"),
        LanguageModel.fourgramLm(ref, "text"))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

    // the training doc scored under itself: every n-gram conditional
    // is 1 (log 0); only position 1 pays, and it pays the PLAIN add-α
    // unigram — avail=1 there, so no β hop (document-initial tokens
    // had no context to back off FROM)
    val ref = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val (uni, big, tri, four) = lms(ref)
    val got = LanguageModel.stupidBackoff4(ref, "doc_id", "text",
      uni, big, tri, four).select($"sb_bits").as[Double].head()
    val pA = 1.5 / 8.0 // (1+0.5)/(5+0.5·6)
    val l9 = math.floor(math.log(pA) / math.log(2.0) * 1e9 + 0.5) / 1e9
    assert(got == r6(-l9 / 5))

    // single-token docs: the whole ladder is position-capped at the
    // unigram with NO penalty — bit-identical to the unigram scorer
    val cand1 = Seq((10L, "a"), (11L, "zz")).toDF("doc_id", "text")
    val sb1 = LanguageModel.stupidBackoff4(cand1, "doc_id", "text",
      uni, big, tri, four)
      .select($"doc_id", $"sb_bits").as[(Long, Double)].collect().toMap
    val xe1 = LanguageModel.crossEntropy(cand1, "doc_id", "text", uni)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    assert(sb1 == xe1)

    // penalty direction: same tokens, scrambled order — the 4-grams
    // are unseen, every late position backs off, bits strictly rise
    val scrambled = Seq((20L, "b d a e c")).toDF("doc_id", "text")
    val sbScr = LanguageModel.stupidBackoff4(scrambled, "doc_id", "text",
      uni, big, tri, four).select($"sb_bits").as[Double].head()
    assert(sbScr > got, s"backoff penalty missing: $sbScr vs $got")

    // β-hop count is avail−used, not a flat penalty: "c d e" starts
    // mid-sentence — pos 3 has avail=3 and a SEEN trigram (c,d,e)… via
    // training doc, so it scores cnt3/ctx3 = 1 with zero hops, while
    // pos 1 (c) and pos 2 (d|c, seen bigram) also pay no hop. Total =
    // unigram cost of c only.
    val tail = Seq((30L, "c d e")).toDF("doc_id", "text")
    val sbTail = LanguageModel.stupidBackoff4(tail, "doc_id", "text",
      uni, big, tri, four).select($"sb_bits").as[Double].head()
    val pC = 1.5 / 8.0
    val lC = math.floor(math.log(pC) / math.log(2.0) * 1e9 + 0.5) / 1e9
    assert(sbTail == r6(-lC / 3))

    // deterministic under repartitioning (the distributed-sum claim)
    val d = Tables.load(spark, sf, "documents")
    val (u2, b2, t2, f2) = lms(d)
    val once = LanguageModel.stupidBackoff4(d, "doc_id", "text",
      u2, b2, t2, f2).orderBy("doc_id").collect().toSeq
    val again = LanguageModel.stupidBackoff4(d.repartition(7), "doc_id",
      "text", u2, b2, t2, f2).orderBy("doc_id").collect().toSeq
    assert(once == again)
  }

  test("per-source quota cap: deterministic, bounded per group, " +
      "identity when the cap does not bind") {
    import graft.operators.Sampling
    val docs = (1 to 100).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val capped = Sampling.capPerGroup(docs, "doc_id", "source", 10, "s42")
    // bound holds per group, total = groups × cap when every group is over
    val per = capped.groupBy("source").count()
      .select("count").as[Long].collect()
    assert(per.length == 4 && per.forall(_ == 10L))
    // deterministic: same seed replays the identical survivor set
    val again = Sampling.capPerGroup(docs, "doc_id", "source", 10, "s42")
      .select("doc_id").as[Long].collect().toSet
    assert(again == capped.select("doc_id").as[Long].collect().toSet)
    // a different seed draws a different set (overwhelmingly likely)
    val other = Sampling.capPerGroup(docs, "doc_id", "source", 10, "zz")
      .select("doc_id").as[Long].collect().toSet
    assert(other != again)
    // sub-cap: identity (row set unchanged)
    assert(Sampling.capPerGroup(docs, "doc_id", "source", 25, "s42")
      .count() == 100)
  }

  test("DSIR: importance weights separate target-like from raw-like " +
      "documents; Gumbel resample is deterministic and weight-biased") {
    import graft.operators.Dsir
    // two disjoint vocabularies: "science" docs are the target domain,
    // "spam" docs the raw-crawl noise; mixed docs sit between
    val sci = (1L to 20L).map(i =>
      (i, s"the experiment measured quantum decay rates sample $i", "sci"))
    val spam = (21L to 40L).map(i =>
      (i, s"click here buy cheap pills winner prize $i", "spam"))
    val docs = (sci ++ spam).toDF("doc_id", "text", "kind")
    val target = docs.filter($"kind" === "sci")

    val w = Dsir.importanceWeights(docs, "doc_id", "text", target, 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 40)
    val sciMin = (1L to 20L).map(w).min
    val spamMax = (21L to 40L).map(w).max
    // every target-vocabulary doc outscores every spam doc: the two
    // vocabularies are disjoint, so the log-ratio separates them fully
    assert(sciMin > spamMax,
      s"weights failed to separate: sci min $sciMin <= spam max $spamMax")

    // resample: deterministic for a seed, different across seeds, and
    // the weight bias pulls the draw toward target-like docs
    val a = Dsir.resample(docs, "doc_id", "text", target, 256, 10, "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Dsir.resample(docs, "doc_id", "text", target, 256, 10, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same seed must replay the identical draw")
    val c = Dsir.resample(docs, "doc_id", "text", target, 256, 10, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c, "a new seed should draw a different sample")
    assert(a.count(_ <= 20L) > 5,
      s"draw should lean target-like, got ${a.count(_ <= 20L)}/10 sci")

    // token-free doc: still scored (one empty-string unigram), finite
    val empty = Seq((99L, "", "spam")).toDF("doc_id", "text", "kind")
    val we = Dsir.importanceWeights(docs.union(empty), "doc_id", "text",
      target, 256).filter($"doc_id" === 99L).collect()
    assert(we.length == 1 && !we(0).getDouble(2).isNaN)
  }

  test("scoreBinnedMix: edge boundaries are [lo, hi), empty bins are " +
      "absent, shares sum to 1, and unsorted edges are rejected") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.{col, lit}
    // scores 0.1 (bin 0), 0.5 twice (bin 1: boundary 0.5 is >= edge
    // 0.5? no — bin covers [prev, edge): 0.5 < 0.7 and >= 0.5 -> bin 1),
    // 0.7 (bin 2, at edges.last), 0.9 (bin 2); nothing in no bin
    val rows = Seq((1L, 0.1, 10L), (2L, 0.5, 20L), (3L, 0.5, 30L),
      (4L, 0.7, 40L), (5L, 0.9, 100L))
      .toDF("doc_id", "score", "ntok")
    val mix = Profile.scoreBinnedMix(rows, col("score"), Seq(0.5, 0.7),
      col("ntok")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(mix.keySet == Set(0, 1, 2), s"got $mix")
    assert(mix(0) == ((1L, 10L, 0.05)))
    assert(mix(1) == ((2L, 50L, 0.25)))
    assert(mix(2) == ((2L, 140L, 0.7)))
    assert(math.abs(mix.values.map(_._3).sum - 1.0) < 1e-9)
    val e = intercept[IllegalArgumentException] {
      Profile.scoreBinnedMix(rows, col("score"), Seq(0.7, 0.5), col("ntok"))
    }
    assert(e.getMessage.contains("increasing"))
  }

  test("semantic contamination flags embedding-near train rows and the " +
      "decontaminated corpus drops exactly those") {
    // eval vector along +x; train 101 is a near-paraphrase of it
    // (same direction, different magnitude, tiny y jitter), train 102
    // is orthogonal (clean), train 103 is OPPOSITE — same |cosine| but
    // a different orthant, documenting the sign-bucket recall trade
    // (and cosine -1 < threshold anyway)
    val eval = Seq((1L, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (101L, Array(3f, 0.1f, 0f, 0f)),
      (102L, Array(0f, 1f, 0f, 0f)),
      (103L, Array(-1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val flagged = Contamination.semanticOverlap(train, eval, "vec_id",
      "embedding", bits = 4, minCosine = 0.9)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(flagged == Set((101L, 1L)))
    val kept = Contamination.semanticDecontaminated(train, eval, "vec_id",
      "embedding", bits = 4, minCosine = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(102L, 103L))
  }

  test("semantic contamination: multiple eval hits yield one pair row " +
      "each but a single drop") {
    val eval = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(1f, 0.05f))).toDF("vec_id", "embedding")
    val train = Seq((10L, Array(2f, 0.01f))).toDF("vec_id", "embedding")
    val pairs = Contamination.semanticOverlap(train, eval, "vec_id",
      "embedding", bits = 2, minCosine = 0.9)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L), (10L, 2L)))
    val kept = Contamination.semanticDecontaminated(train, eval, "vec_id",
      "embedding", bits = 2, minCosine = 0.9).count()
    assert(kept == 0L)
  }

  test("kneser-ney bigram: hand-computed score, discount ledger balance, " +
      "continuation-vs-frequency ordering, partition independence") {
    import graft.operators.LanguageModel
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def l9(p: Double): Double =
      math.floor(math.log(p) / math.log(2.0) * 1e9 + 0.5) / 1e9

    // ref "a b a c a b": bigrams (a,b):2 (b,a):1 (a,c):1 (c,a):1;
    // ctx2(a)=3 n1a(a)=2; n1b: a←2, b←1, c←1; T=4 types, Vc=3
    val ref = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val big = LanguageModel.bigramLm(ref, "text")
    def pCont(n1b: Long): Double =
      (n1b.toDouble + 0.5) / (4.0 + 0.5 * (3.0 + 1.0))
    // doc "a b": pos1 scores the continuation base (no context, no
    // discount paid); pos2 the full discounted+interpolated bigram —
    // expression order mirrors the operator exactly
    val pB = (2.0 - 0.75) / 3.0 + ((0.75 * 2.0) / 3.0) * pCont(1L)
    val expected = r6(-(l9(pCont(2L)) + l9(pB)) / 2.0)
    val got = LanguageModel.kneserNeyBigram(
      Seq((10L, "a b")).toDF("doc_id", "text"), "doc_id", "text", big)
      .select($"xent").as[Double].head()
    assert(got == expected, s"hand-computed KN mismatch: $got vs $expected")

    // discount ledger: Σ_w p(w|a) over the continuation vocab must
    // equal 1 − λ(a)·(1 − Σ_w p_cont(w)) — the D·N1+(a,·) of discounted
    // mass is redistributed through p_cont with nothing lost. Recover
    // each p(w|a) from scored two-token docs (xent is rounded at 6, so
    // the recovered sum carries ~1e-5 of quantization).
    val docs = Seq((20L, "a a"), (21L, "a b"), (22L, "a c"))
      .toDF("doc_id", "text")
    val xents = LanguageModel.kneserNeyBigram(docs, "doc_id", "text", big)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    val recovered = xents.values.map { xe =>
      math.pow(2.0, -(2.0 * xe) - l9(pCont(2L)))
    }.sum
    val lamA = (0.75 * 2.0) / 3.0
    val sumCont = pCont(2L) + pCont(1L) + pCont(1L)
    val ledger = 1.0 - lamA * (1.0 - sumCont)
    assert(math.abs(recovered - ledger) < 1e-4,
      s"KN ledger broken: $recovered vs $ledger")

    // the KN point: equal raw frequency, different context diversity.
    // "francisco" (3×, always after "san") must score BELOW "common"
    // (3×, after three distinct contexts) when neither has a usable
    // context — continuation counts, not frequency, set backoff mass.
    val burst = Seq(
      (1L, "san francisco san francisco san francisco x common y common z common"))
      .toDF("doc_id", "text")
    val bigB = LanguageModel.bigramLm(burst, "text")
    val probes = Seq((30L, "q francisco"), (31L, "q common"))
      .toDF("doc_id", "text")
    val xb = LanguageModel.kneserNeyBigram(probes, "doc_id", "text", bigB)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    assert(xb(30L) > xb(31L),
      s"burst token not demoted: francisco ${xb(30L)} vs common ${xb(31L)}")

    // exact-decimal sums: partitioning cannot move the result
    val many = (0L until 40L).map(i => (i, "a b a c " * (i % 5 + 1).toInt))
      .toDF("doc_id", "text")
    val once = LanguageModel.kneserNeyBigram(many, "doc_id", "text", big)
      .orderBy("doc_id").collect()
    val again = LanguageModel.kneserNeyBigram(many.repartition(7),
      "doc_id", "text", big).orderBy("doc_id").collect()
    assert(once.sameElements(again))
  }

  test("kneser-ney trigram: hand-computed recursion through the " +
      "continuation-type middle level; position cascade") {
    import graft.operators.LanguageModel
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def l9(p: Double): Double =
      math.floor(math.log(p) / math.log(2.0) * 1e9 + 0.5) / 1e9

    // ref "a b c a b d a b c": trigram types (a,b,c):2 (b,c,a) (c,a,b)
    // (a,b,d) (b,d,a) (d,a,b); ctx3(a,b)=3, N1+(a,b,·)=2;
    // middle N1+(·,v,w): (a,b):2 (b,c):1 (c,a):1 (b,d):1 (d,a):1;
    // ctxc2(a)=2 n1ac(a)=1, ctxc2(b)=2 n1ac(b)=2;
    // bigram types: b←1, c←1, a←2, d←1 ⇒ T=5, Vc=4
    val ref = Seq((1L, "a b c a b d a b c")).toDF("doc_id", "text")
    val big = LanguageModel.bigramLm(ref, "text")
    val tri = LanguageModel.trigramLm(ref, "text")
    def pCont(n1b: Long): Double =
      (n1b.toDouble + 0.5) / (5.0 + 0.5 * (4.0 + 1.0))
    // scoring doc "a b c": pos1 = continuation base of a; pos2 = the
    // TYPE-count middle level p_c(b|a); pos3 = the full top recursion
    // p(c|a,b) with p_c(c|b) nested — orders of operations mirror the
    // operator columns exactly
    val pMidBgA = (2.0 - 0.75) / 2.0 + ((0.75 * 1.0) / 2.0) * pCont(1L)
    val pMidCgB = (1.0 - 0.75) / 2.0 + ((0.75 * 2.0) / 2.0) * pCont(1L)
    val pTop = (2.0 - 0.75) / 3.0 + ((0.75 * 2.0) / 3.0) * pMidCgB
    val expected =
      r6(-(l9(pCont(2L)) + l9(pMidBgA) + l9(pTop)) / 3.0)
    val got = LanguageModel.kneserNeyTrigram(
      Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
      big, tri).select($"xent").as[Double].head()
    assert(got == expected, s"hand-computed KN3 mismatch: $got vs $expected")

    // unseen (u,v) context cascades to the middle level, not the base:
    // "z a b" pos3 has prev2=z unseen ⇒ scores p_c(b|a); pos2 (a|z)
    // has prev=z never a middle ⇒ base; pos1 base of z (OOV ⇒ α floor)
    val casc = LanguageModel.kneserNeyTrigram(
      Seq((20L, "z a b")).toDF("doc_id", "text"), "doc_id", "text",
      big, tri).select($"xent").as[Double].head()
    val expCasc =
      r6(-(l9(pCont(0L)) + l9(pCont(2L)) + l9(pMidBgA)) / 3.0)
    assert(casc == expCasc, s"cascade mismatch: $casc vs $expCasc")

    // partition independence (exact decimal sums)
    val many = (0L until 30L).map(i => (i, "a b c a b d " * (i % 3 + 1).toInt))
      .toDF("doc_id", "text")
    val once = LanguageModel.kneserNeyTrigram(many, "doc_id", "text",
      big, tri).orderBy("doc_id").collect()
    val again = LanguageModel.kneserNeyTrigram(many.repartition(7),
      "doc_id", "text", big, tri).orderBy("doc_id").collect()
    assert(once.sameElements(again))
  }

  test("pmiCollocations: exact PMI on a closed-form corpus; hapax pairs " +
      "filtered by minCount; document boundaries respected") {
    // 10× "aa bb" + 10× "aa cc": T2=20, T1=40, c(aa)=20, c(bb)=c(cc)=10
    // pmi(aa,bb) = log2((10/20)/((20/40)(10/40))) = log2(4) = 2 exactly
    val docs = ((0 until 10).map(i => (i.toLong, "aa bb")) ++
      (10 until 20).map(i => (i.toLong, "aa cc"))).toDF("doc_id", "text")
    val out = LanguageModel.pmiCollocations(docs, "doc_id", "text",
      minCount = 5L, k = 10).collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(3) == 2.0))
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("aa", "bb"), ("aa", "cc")))
    // the bigram (bb, aa) never forms: bb ends doc i, aa starts doc i+1
    // (boundary respected); a sub-minCount pair never surfaces
    val withHapax = docs.unionByName(Seq((99L, "zz qq")).toDF("doc_id", "text"))
    val names = LanguageModel.pmiCollocations(withHapax, "doc_id", "text",
      5L, 10).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!names.contains(("zz", "qq")) && names.size == 2)
  }

  test("goodTuring: count-of-counts, r* discounts, NULL where N_{r+1}=0, " +
      "and the unseen mass p0 — all closed-form") {
    // bigram counts: (a,b)=3, (c,d)=2, (e,f)=1, (g,h)=1
    // coc: 1→2, 2→1, 3→1; N=7; p0 = 2/7; r*(1)=2·1/2=1, r*(2)=3·1/1=3
    val docs = ((0 until 3).map(i => (i.toLong, "a b")) ++
      (3 until 5).map(i => (i.toLong, "c d")) ++
      Seq((5L, "e f"), (6L, "g h"))).toDF("doc_id", "text")
    val out = LanguageModel.goodTuring(docs, "doc_id", "text", 10)
      .collect()
    assert(out.length == 3)
    val byR = out.map(r => r.getLong(0) -> r).toMap
    assert(byR(1L).getLong(1) == 2 && byR(1L).getDouble(3) == 1.0)
    assert(byR(2L).getLong(1) == 1 && byR(2L).getDouble(3) == 3.0)
    assert(byR(3L).getLong(1) == 1 && byR(3L).isNullAt(3))
    val p0 = byR(1L).getDouble(4)
    assert(p0 == math.floor(2.0 / 7.0 * 1e9 + 0.5) / 1e9, s"p0=$p0")
  }
}
