package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Sampling}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: rare shared term outranks common shared term") {
    val docs = Seq(
      (1L, "zephyr alpha"),            // query
      (2L, "zephyr beta gamma"),       // shares the rare term
      (3L, "alpha beta gamma"),        // shares the common term
      (4L, "alpha delta epsilon"),     // common term again (alpha df=3)
      (5L, "unrelated words entirely")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      col("doc_id") === 1, k = 3, materialize = false)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty && out.head._2 == 2L,
      s"rare-term doc must rank first, got ${out.toSeq}")
    assert(out.forall(_._2 != 1L), "no self-matches")
    assert(out.map(_._3).sorted.reverse.toSeq == out.map(_._3).toSeq,
      "scores must be non-increasing by rank")
  }

  test("bm25: k bounds results per query; only term-sharing docs appear") {
    val d = Tables.load(spark, sf, "documents")
    val out = Retrieval.bm25TopK(d, "doc_id", "text",
      col("doc_id") < 10, k = 2)
    val perQuery = out.groupBy("query_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ <= 2))
    assert(perQuery.nonEmpty)
    out.unpersist()
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val docs = Seq(
      (1L, "needle"),
      (2L, "needle a b"),
      (3L, "needle a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      col("doc_id") === 1, k = 2, materialize = false)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 3L),
      s"shorter doc must outrank longer at equal tf: ${out.toSeq}")
  }

  test("weighted sample: deterministic, size-bounded, weight-biased") {
    val d = Tables.load(spark, sf, "documents")
    val s1 = Sampling.weightedSample(d, "doc_id", "n_chars", 40, "seedA")
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Sampling.weightedSample(d.repartition(7), "doc_id", "n_chars",
      40, "seedA").select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "same seed + weights must draw the same sample " +
      "regardless of partitioning")
    assert(s1.size == 40)
    val s3 = Sampling.weightedSample(d, "doc_id", "n_chars", 40, "seedB")
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 != s3, "a different seed must reshuffle the draw")
    // weight-proportional draws overrepresent long documents
    val corpusAvg = d.agg(avg("n_chars")).as[Double].head()
    val sampleAvg = Sampling.weightedSample(d, "doc_id", "n_chars", 40, "seedA")
      .agg(avg("n_chars")).as[Double].head()
    assert(sampleAvg > corpusAvg,
      s"weighted sample avg $sampleAvg should exceed corpus avg $corpusAvg")
  }

  test("weighted sample: non-positive weights can never be drawn") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 20L))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 10, "s")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("rrf fusion: agreement beats a single #1; one-sided candidates " +
      "survive; scores are the closed-form 1/(k0+rank) sums") {
    // ranker A: c1 #1, c2 #2; ranker B: c2 #1, c3 #2.
    // c2 (ranks 2+1) must beat c1 (rank 1 only) and c3 (rank 1 only... )
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "cand_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "cand_id", "rank")
    val out = Retrieval.rrfFuse(a, b, k = 3)
      .select("cand_id", "score", "rank")
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(20L, 10L, 30L))
    // c2: 1/62 + 1/61; c1: 1/61; c3: 1/62 — exact closed forms
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    assert(out(0)._2 == r9(1.0 / 62 + 1.0 / 61))
    assert(out(1)._2 == r9(1.0 / 61))
    assert(out(2)._2 == r9(1.0 / 62))
    // k bounds the fused list; ties break on cand_id
    val tied = Retrieval.rrfFuse(a, a, k = 1)
      .select("cand_id").as[Long].collect()
    assert(tied.toSeq == Seq(10L))
  }
}
