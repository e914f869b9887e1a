package graft

import org.apache.spark.sql.functions._

import graft.operators.{Contamination, Dedup, DedupCluster, Retrieval}

/** Stress tests for the two 100 TB scale-killers named in the plan
  * audits: unbounded posting-list fan-out in inverted-index joins
  * (df-cap) and quadratic hot buckets in LSH candidate generation
  * (hot-band star guard). Each test PLANTS the pathology — one key in
  * every document — and asserts the guarded operator stays bounded
  * while unguarded behavior would be quadratic.
  */
class FanoutGuardSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 60

  /** Every doc shares the 5-gram "common header words repeated
    * everywhere"; all remaining shingles are unique per doc.
    */
  private lazy val boilerplate = (1 to nDocs).map { i =>
    (i.toLong, s"common header words repeated everywhere u$i v$i w$i x$i y$i")
  }.toDF("doc_id", "text")

  test("df-cap bounds jaccard candidate generation on a planted " +
      "stop-shingle (uncapped: all-pairs)") {
    // minJaccard 0 → every co-shingled pair is a result row
    val uncapped = Dedup.ngramJaccardPairs(boilerplate, "doc_id", "text",
      5, 0.0, maxDf = 0)
    assert(uncapped.count() == nDocs.toLong * (nDocs - 1) / 2,
      "without the cap the planted shingle must pair every doc with every other")
    val capped = Dedup.ngramJaccardPairs(boilerplate, "doc_id", "text",
      5, 0.0, maxDf = 10)
    // the only shared shingle is over-cap → zero candidates survive
    assert(capped.count() == 0)
  }

  test("df-cap leaves sub-cap results byte-identical") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "entirely different content with no overlap at all here now")
    ).toDF("doc_id", "text")
    val a = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3, maxDf = 0)
      .collect().toSet
    val b = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().toSet
    assert(a == b, "default cap must not bind below DefaultMaxDf")
  }

  test("df-cap bounds jaccardTopK the same way") {
    val out = Dedup.jaccardTopK(boilerplate, "doc_id", "text", 5, 3,
      col("doc_id") <= 2, maxDf = 10)
    assert(out.count() == 0, "stop-shingle-only overlap must yield no candidates")
  }

  test("contamination train-df cap drops planted boilerplate from both " +
      "sides of the overlap join") {
    // eval docs 1-2; every train doc shares only the boilerplate shingle
    val evalPred = col("doc_id") <= 2
    val capped = Contamination.overlap(boilerplate, "doc_id", "text", 5,
      evalPred, 0.0, maxTrainDf = 10)
    assert(capped.count() == 0,
      "over-cap shingle must not generate (eval, train) candidates")
    val uncapped = Contamination.overlap(boilerplate, "doc_id", "text", 5,
      evalPred, 0.0, maxTrainDf = 0)
    assert(uncapped.count() == 2L * (nDocs - 2),
      "sanity: without the cap every (eval, train) pair shares the shingle")
  }

  test("bm25 stopTermDf excludes ubiquitous terms from candidate " +
      "generation") {
    // every doc contains "everywhere"; doc 3 shares ONLY that term with
    // the query doc 1
    val docs = Seq(
      (1L, "everywhere unique query words appear"),
      (2L, "everywhere unique query words appear too"),
      (3L, "everywhere nothing else shared")).toDF("doc_id", "text")
    val all = Retrieval.bm25TopK(docs, "doc_id", "text",
      col("doc_id") === 1, k = 5)
    assert(all.filter($"cand_id" === 3).count() == 1,
      "sanity: uncapped bm25 scores the stop-term-only candidate")
    val capped = Retrieval.bm25TopK(docs, "doc_id", "text",
      col("doc_id") === 1, k = 5, stopTermDf = 2)
    assert(capped.filter($"cand_id" === 3).count() == 0,
      "the df>2 term must stop generating candidates")
    assert(capped.filter($"cand_id" === 2).count() == 1,
      "sub-cap terms still retrieve")
  }

  test("LSH hot-band guard: planted identical docs produce a linear " +
      "spanning star, and clustering output is unchanged") {
    val n = 400
    val planted = (1 to n).map(i =>
      (i.toLong, "exactly the same duplicated text appears in every document"))
      .toDF("doc_id", "text")
    // identical docs → identical signatures → one bucket per band of
    // occupancy n: unguarded candidate count would be n·(n−1)/2 = 79800
    val pairs = Dedup.minHashLshPairs(planted, "doc_id", "text", 3, 4, 3,
      maxBucket = 50)
    assert(pairs.count() == (n - 1).toLong,
      "hot bucket must emit a spanning star (n−1 edges), not all pairs")
    assert(pairs.agg(min($"id_a")).head().getLong(0) == 1L &&
      pairs.select("id_a").distinct().count() == 1,
      "star must be rooted at the bucket's min id")
    // the canonical manifest is what a clique would have produced:
    // one cluster, canonical = min id, every doc a member
    val manifest = DedupCluster.canonicalize(planted, "doc_id", pairs)
      .as[(Long, Long)].collect().toSeq
    assert(manifest == Seq((1L, n.toLong)),
      s"expected one cluster (canonical=1, members=$n), got $manifest")
  }

  test("incremental LSH hot-band guard keeps drop decisions identical " +
      "while bounding pair counts") {
    val text = "exactly the same duplicated text appears in every document"
    val nExisting = 100
    val existing = (1 to nExisting).map(i => (i.toLong, text))
      .toDF("doc_id", "text")
    // new batch: 5 dups of the stored page + 1 genuinely new doc
    val fresh = ((101 to 105).map(i => (i.toLong, text)) :+
      (106L, "a genuinely novel document about catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val exSigs = Dedup.minHashSignatures(existing, "doc_id", "text", 3, 12)
    val nwSigs = Dedup.minHashSignatures(fresh, "doc_id", "text", 3, 12)

    val guarded = Dedup.minHashLshPairsIncremental(exSigs, nwSigs,
      "doc_id", 4, 3, maxBucket = 10)
    // unguarded: 5×100 + C(5,2) = 510 pairs; star: one edge per hot-
    // bucket member touching a new doc + nothing else
    val n = guarded.count()
    assert(n <= 110, s"hot bucket must not emit new×occupancy pairs, got $n")
    val drops = Dedup.incrementalDropIds(exSigs, nwSigs, "doc_id", 4, 3)
      .as[Long].collect().toSet
    val dropsGuarded = {
      // same decision through the guarded pair set
      val pairs = guarded
      val ex = exSigs.select($"doc_id".as("xid")).distinct()
      val vsA = pairs.join(ex, pairs("id_a") === col("xid")).select($"id_b")
      val vsB = pairs.join(ex, pairs("id_b") === col("xid")).select($"id_a")
      val nn = pairs.join(ex, pairs("id_a") === col("xid"), "left_anti")
        .join(ex, pairs("id_b") === col("xid"), "left_anti")
        .select(greatest($"id_a", $"id_b"))
      vsA.union(vsB).union(nn).distinct().as[Long].collect().toSet
        .intersect((101L to 106L).toSet)
    }
    assert(drops == (101L to 105L).toSet,
      s"default-cap drop decision wrong: $drops")
    assert(dropsGuarded == (101L to 105L).toSet,
      s"guarded drop decision diverged: $dropsGuarded")
  }

  test("image-dedup hot-bucket guard: planted solid-color images " +
      "(identical aHash) produce a linear star, unchanged clusters") {
    // blank/solid-color crawl images all hash to the same degenerate
    // aHash (here 0x0), identical in EVERY band — the image twin of the
    // planted-identical-docs LSH case. 10k rows unguarded = ~50M pairs
    // per band on one join task.
    val n = 10000
    val planted = (1 to n).map(i => (i.toLong, 0L)).toDF("doc_id", "hash")
    val pairs = graft.multimodal.Multimodal.imageDupPairs(planted,
      maxHamming = 3, maxBucket = 100)
    assert(pairs.count() == (n - 1).toLong,
      "hot hash class must emit a spanning star (n−1 edges), not all pairs")
    assert(pairs.select("id_a").distinct().count() == 1 &&
      pairs.agg(min($"id_a")).head().getLong(0) == 1L,
      "star must be rooted at the class's min doc_id")
    assert(pairs.filter($"hamming" =!= 0).count() == 0)
    // canonical manifest identical to what the all-pairs clique gives:
    // one cluster rooted at doc 1 containing every planted image
    val manifest = DedupCluster.canonicalize(
      planted.select($"doc_id"), "doc_id", pairs.select("id_a", "id_b"))
      .as[(Long, Long)].collect().toSeq
    assert(manifest == Seq((1L, n.toLong)),
      s"expected one cluster (canonical=1, members=$n), got $manifest")
  }

  test("image-dedup guard leaves sub-cap results byte-identical and " +
      "keeps true near-dups across distinct sub-cap classes") {
    // two near-dup pairs (hamming 1 and 2) + one far hash: guarded and
    // unguarded agree exactly while the cap is not binding
    val hashes = Seq(
      (1L, 0x0123456789ABCDEFL), (2L, 0x0123456789ABCDEEL), // hamming 1
      (3L, 0x7777000011112222L), (4L, 0x7777000011113222L), // hamming 2
      (5L, -1L)).toDF("doc_id", "hash")
    val guarded = graft.multimodal.Multimodal.imageDupPairs(hashes, 3)
      .collect().toSet
    val unguarded = graft.multimodal.Multimodal.imageDupPairs(hashes, 3,
      maxBucket = 0).collect().toSet
    assert(guarded == unguarded, "default cap must not bind below DefaultMaxDf")
    assert(guarded.map(r => (r.getLong(0), r.getLong(1))) ==
      Set((1L, 2L), (3L, 4L)))
  }

  test("skyline raises loudly when anti-correlated criteria make the " +
      "phase-1 survivor set exceed the single-task bound") {
    // b = a with one minimized and one maximized → EVERY row is locally
    // Pareto-optimal: the worst case for the one-task global pass
    val anti = (1 to 100).map(i => (i.toLong, i.toLong, i.toLong))
      .toDF("id", "a", "b")
    val e = intercept[IllegalStateException] {
      graft.operators.Skyline.skyline(anti, Seq("a"), Seq("b"),
        maxGlobalRows = 10).count()
    }
    assert(e.getMessage.contains("maxGlobalRows"))
    // under the bound the frontier still computes (here: all rows)
    assert(graft.operators.Skyline.skyline(anti, Seq("a"), Seq("b"))
      .count() == 100)
  }

  test("triangles degree guard: a planted hub above maxDegree raises " +
      "loudly; under the cap (and when disabled) results are intact") {
    import graft.operators.Graph
    // star: hub 0 linked to 1..50 (degree 50), plus one closed triangle
    val star = ((1 to 50).map(i => (0L, i.toLong)) ++
      Seq((1L, 2L))).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Graph.triangles(star, maxDegree = 16)
    }
    assert(e.getMessage.contains("maxDegree=16"))
    val ok = Graph.triangles(star, maxDegree = 64)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(ok(0L) == 1L && ok(1L) == 1L && ok(2L) == 1L)
    assert((3 to 50).forall(i => ok(i.toLong) == 0L))
    val disabled = Graph.triangles(star, maxDegree = 0)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(disabled == ok, "disabling the guard must not change results")
  }
}
