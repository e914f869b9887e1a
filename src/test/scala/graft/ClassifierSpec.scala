package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classifier, TextEmbedding}
import graft.operators.Classifier.LogRegModel

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("score: logit arithmetic and rounded-verdict consistency on a " +
      "hand-computed example") {
    val feats = Seq(
      (1L, Array(1.0, 0.0, -2.0)),
      (2L, Array(0.5, 0.5, 0.5)),
      (3L, Array(0.0, 0.0, 0.0))).toDF("id", "vec")
    val m = LogRegModel(Seq(0.25, -0.5, 0.125), bias = 0.0625)
    val got = Classifier.score(feats, "id", "vec", m)
      .orderBy("id").as[(Long, Double, Boolean)].collect()
    // 0.0625 + 0.25 - 0.25 = 0.0625 ; 0.0625 + 0.125 - 0.25 + 0.0625
    // = 0.0 ; bias only = 0.0625 — all dyadic, exact at scale 6
    assert(got.toSeq == Seq(
      (1L, 0.0625, true), (2L, 0.0, false), (3L, 0.0625, true)))
  }

  test("train recovers a planted linear separator: accuracy >= 0.97, " +
      "log-loss decreases, deterministic") {
    val dim = 16
    val wStar = Array.tabulate(dim)(i => ((i * 37) % 21 - 10) / 8.0)
    val rows = (1 to 600).map { id =>
      val x = Array.tabulate(dim)(d =>
        (((id * 31 + d * 17) % 19) - 9) / 9.0)
      val y = if (x.zip(wStar).map { case (a, b) => a * b }.sum > 0.3) 1
              else 0
      (id.toLong, x, y)
    }
    val df = rows.toDF("id", "vec", "label").cache()
    val m = Classifier.train(df, "id", "vec", "label", dim,
      iters = 120, step = 2.0, l2 = 1e-6)
    val acc = Classifier.score(df, "id", "vec", m)
      .join(df, "id")
      .filter(($"logit" > 0) === ($"label" === 1))
      .count().toDouble / rows.size
    assert(acc >= 0.97, s"planted-separator accuracy $acc")
    val l0 = Classifier.logLoss(df, "vec", "label",
      LogRegModel(Seq.fill(dim)(0.0), 0.0))
    val lT = Classifier.logLoss(df, "vec", "label", m)
    assert(lT < l0 * 0.5, s"log-loss $l0 -> $lT did not halve")
    val m2 = Classifier.train(df, "id", "vec", "label", dim,
      iters = 120, step = 2.0, l2 = 1e-6)
    assert(m2 == m, "training is not deterministic")
    df.unpersist()
  }

  test("fastText-style corpus filter: trained on hashed embeddings, " +
      "beats the majority baseline on a token-frequency label") {
    // The fixture's lang/source columns are independent of the text
    // (same vocabulary everywhere), so the learnable ground truth is a
    // token-statistic label: "more 'merge' than 'sort' occurrences" is
    // (up to hash collisions) a linear function of the hashed features.
    val docs = Tables.load(spark, sf, "documents")
    val nTok = (w: String) => size(split($"text", s" $w ", -1)) - 1
    val feats = TextEmbedding.hashedEmbeddings(docs, "doc_id", "text", 64)
      .join(docs.select($"doc_id",
        (nTok("merge") > nTok("sort")).cast("int").as("label")), "doc_id")
      .cache()
    val n = feats.count().toDouble
    val m = Classifier.train(feats, "doc_id", "vec", "label", 64,
      iters = 200, step = 5.0, l2 = 1e-6)
    val acc = Classifier.score(feats, "doc_id", "vec", m)
      .join(feats.select($"doc_id", $"label"), "doc_id")
      .filter(($"logit" > 0) === ($"label" === 1))
      .count().toDouble / n
    val base = math.max(feats.filter($"label" === 0).count() / n,
      feats.filter($"label" === 1).count() / n)
    assert(acc >= 0.78 && acc >= base + 0.1,
      s"corpus-filter in-sample accuracy $acc vs majority $base")
    feats.unpersist()
  }
}
