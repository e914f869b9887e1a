package graft

import graft.operators.Similarity

/** SemDeDup (cluster-scoped semantic dedup): keep policy, grouping
  * semantics, trained-quantizer form, and the hot-cell loud guard.
  * The fixed-centroid form is additionally hash-matched against a
  * DuckDB recursive-CTE replica (`sem_dedup_fixed`).
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight semantic groups plus two loners, in 4 dims:
  //   a1/a2/a3 mutually ≥0.95-cosine (one dup group, cell 0)
  //   b1 alone in cell 1; c1 near the 45° boundary, below threshold
  private val vecs = Seq(
    1L -> Array(1f, 0f, 0f, 0f),
    2L -> Array(0.96f, 0.28f, 0f, 0f),
    3L -> Array(0.98f, 0.199f, 0f, 0f),
    4L -> Array(0f, 1f, 0f, 0f),
    5L -> Array(0.7f, 0.714f, 0f, 0f))
  private def df = vecs.toDF("vec_id", "embedding")

  private val cents: Seq[Seq[Float]] =
    Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))

  test("fixed-centroid semDedup keeps one representative per semantic " +
      "group — the member LEAST similar to its cell centroid") {
    val kept = Similarity.semDedupWithCentroids(df, "vec_id", "embedding",
      cents, 0.95).select("vec_id").as[Long].collect().sorted
    // group {1,2,3} collapses; csim(2)≈0.96 < csim(3)≈0.98 < csim(1)=1.0
    // → the outlier (id 2) survives; 4 and 5 have no ≥0.95 edges
    assert(kept.toSeq == Seq(2L, 4L, 5L))
  }

  test("pairs below the threshold never merge: a high threshold keeps " +
      "everything") {
    val kept = Similarity.semDedupWithCentroids(df, "vec_id", "embedding",
      cents, 0.9999).select("vec_id").as[Long].collect()
    assert(kept.length == vecs.length)
  }

  test("trained-quantizer semDedup (KMeans cells) finds the same group " +
      "structure: one survivor from the dup group, loners intact") {
    val kept = Similarity.semDedup(df, "vec_id", "embedding", nlist = 2,
      minCosine = 0.95).select("vec_id").as[Long].collect().toSet
    assert(kept.size == 3)
    assert(kept.count(Set(1L, 2L, 3L)) == 1, "exactly one of the dup group")
    assert(kept(4L) && kept(5L), "sub-threshold members all survive")
  }

  test("a skew-collapsed cell fails loudly instead of fanning out " +
      "quadratically on one task") {
    val e = intercept[IllegalStateException] {
      Similarity.semDedupWithCentroids(df, "vec_id", "embedding",
        cents, 0.95, maxCellSize = 2).collect()
    }
    assert(e.getMessage.contains("nlist"), "the error must say what to raise")
  }

  test("incremental SemDeDup admits only semantically-novel batch rows — " +
      "direct kept-hits, transitive chains, and in-batch dups all drop") {
    // kept corpus: one representative per direction (unit-ish 2D layout
    // inside 4 dims); threshold 0.98 ≈ an 11.5° cone
    val kept = Seq(
      2L -> Array(0.96f, 0.28f, 0f, 0f),
      4L -> Array(0f, 1f, 0f, 0f)).toDF("vec_id", "embedding")
    val batch = Seq(
      // 11° from kept-2 → direct hit, drops
      10L -> Array(0.9957f, 0.0924f, 0f, 0f),
      // 2° from kept-4 → direct hit, drops
      11L -> Array(0.035f, 0.9994f, 0f, 0f),
      // mutual near-dups in a novel direction → exactly one survives
      12L -> Array(0.7f, -0.7f, 0f, 0f),
      13L -> Array(0.71f, -0.7f, 0f, 0f),
      // novel singleton (cell tie-breaks deterministically) → survives
      14L -> Array(0f, 0f, 1f, 0f),
      // 11° from id 10 but 22° from kept-2: no direct kept edge, drops
      // TRANSITIVELY through 10 (new→new→kept)
      15L -> Array(0.995f, -0.0993f, 0f, 0f)).toDF("vec_id", "embedding")
    val admitted = Similarity.semDedupIncrement(kept, batch, "vec_id",
      "embedding", cents, 0.98).select("vec_id").as[Long].collect().sorted
    // 12 beats 13 on the keep-outlier rule (lower centroid cosine)
    assert(admitted.toSeq == Seq(12L, 14L))
  }

  test("incremental SemDeDup fails loudly on a KEPT-side hot cell — " +
      "dedup at minCosine does not bound cell occupancy") {
    // three kept rows land in cell 0 (mutually < 0.98-cosine, so a
    // legitimately deduplicated corpus), one batch row probes that cell
    val kept = Seq(
      2L -> Array(0.96f, 0.28f, 0f, 0f),
      3L -> Array(0.8f, 0.6f, 0f, 0f),
      6L -> Array(0.9f, -0.436f, 0f, 0f)).toDF("vec_id", "embedding")
    val batch = Seq(10L -> Array(0.99f, 0.141f, 0f, 0f))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      Similarity.semDedupIncrement(kept, batch, "vec_id", "embedding",
        cents, 0.98, maxCellSize = 2).collect()
    }
    assert(e.getMessage.contains("KEPT"), e.getMessage)
    assert(e.getMessage.contains("nlist"), "the error must say what to raise")
  }

  test("a 30-hop cosine chain in one cell clusters to ONE component " +
      "(diameter-independent star contraction — the sf1.0 sweep " +
      "regression: label propagation's round budget died here)") {
    // unit vectors rotating 5° per step: adjacent cosine ≈ 0.9962 links,
    // skip-one ≈ 0.9848 does not at minCosine 0.995 → a pure 30-hop chain
    val n = 31
    val chain = (0 until n).map { i =>
      val th = math.toRadians(5.0 * i)
      (i.toLong + 1L,
        Array(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val kept = Similarity.semDedupWithCentroids(chain, "vec_id",
      "embedding", Seq(Seq(1f, 0f, 0f, 0f)), minCosine = 0.995)
      .select("vec_id").as[Long].collect()
    // one component ⇒ exactly one kept representative
    assert(kept.length == 1, s"expected 1 survivor, got ${kept.toSeq}")
  }

  test("kept rows carry ALL corpus columns (left-semi, no projection loss)") {
    val withExtra = df.withColumn("label",
      org.apache.spark.sql.functions.col("vec_id") * 10)
    val kept = Similarity.semDedupWithCentroids(withExtra, "vec_id",
      "embedding", cents, 0.95)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding", "label"))
    assert(kept.filter("label = vec_id * 10").count() == 3)
  }
}
