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
}
