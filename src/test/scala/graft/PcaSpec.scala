package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pca, Similarity}

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEig: known 2x2 and 3x3 spectra, eigenvalue-descending, " +
      "sign-canonical") {
    val (e2, v2) = Pca.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(e2(0) - 3.0) < 1e-12 && math.abs(e2(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(v2(0)(0) - r) < 1e-12 && math.abs(v2(0)(1) - r) < 1e-12)
    // diagonal matrix: eigenvalues sort, vectors are (sign-canonical)
    // coordinate axes
    val (e3, v3) = Pca.jacobiEig(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(e3.toSeq == Seq(5.0, 3.0, 1.0))
    assert(v3(0).toSeq == Seq(0.0, 1.0, 0.0))
    assert(v3(1).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("trained loadings are orthonormal and variance-ordered on the " +
      "fixture embeddings") {
    val emb = Tables.load(spark, sf, "embeddings")
    val l = Pca.loadings(emb, "vec_id", "embedding", 8)
    assert(l.size == 8 && l.forall(_.size == 64))
    for (i <- l.indices; j <- i until l.size) {
      val d = l(i).zip(l(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-8, s"<l$i, l$j> = $d")
    }
    // component variances (lᵀ C l) decrease along the returned order:
    // project the corpus and check the per-component variance ordering
    val proj = Pca.project(emb, "vec_id", "embedding", l, scale = 9)
      .select(posexplode($"vec")).toDF("dim", "v")
      .groupBy("dim").agg(var_pop($"v").as("s2"))
      .orderBy("dim").select("s2").as[Double].collect()
    for (i <- 1 until proj.length)
      assert(proj(i) <= proj(i - 1) + 1e-9,
        s"variance not descending at $i: ${proj.toSeq}")
  }

  test("PCA rotation front-loads variance: Matryoshka prefix recall on " +
      "anisotropic vectors jumps from near-random to near-exact") {
    // planted corpus: ALL signal lives in dims 48..63; dims 0..47 are
    // 1e-3 noise — the worst case for a raw leading-dim prefilter
    val n = 200
    val planted = (1 to n).map { id =>
      val v = Array.tabulate(64) { d =>
        if (d >= 48) ((id * 7 + d * 13) % 23 - 11).toFloat
        else (((id * 31 + d * 17) % 5) - 2) * 0.001f
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = planted.filter($"vec_id" <= 5)
    val k = 10

    // ground truth: exact L2 (rotation-invariant, so it serves both)
    val exact = Similarity.truncatedRerankTopK(planted, queries, "vec_id",
      "embedding", k, dPrefix = 64, overquery = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.truncatedRerankTopK(df, df.filter($"vec_id" <= 5),
        "vec_id", "vec", k, dPrefix = 16, overquery = 2)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    // raw vectors: identity "rotation" — prefix dims are pure noise
    val eye = Seq.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val rawRecall = recallOf(
      Pca.project(planted, "vec_id", "embedding", eye, scale = 9))
    // PCA-rotated: the 16 signal directions move to the front
    val l = Pca.loadings(planted, "vec_id", "embedding", 64)
    val pcaRecall = recallOf(
      Pca.project(planted, "vec_id", "embedding", l, scale = 9))
    assert(rawRecall < 0.6, s"planted corpus not anisotropic? $rawRecall")
    assert(pcaRecall >= 0.95,
      s"PCA prefix recall $pcaRecall (raw was $rawRecall)")
  }

  test("OPQ eigenvalue allocation: a valid balanced permutation, and " +
      "PQ-ADC recall on rotated anisotropic vectors beats raw PQ") {
    val n = 300
    val planted = (1 to n).map { id =>
      val v = Array.tabulate(64) { d =>
        if (d >= 48) ((id * 7 + d * 13) % 23 - 11).toFloat
        else (((id * 31 + d * 17) % 5) - 2) * 0.001f
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val nsub = 8
    val l = Pca.opqLoadings(planted, "vec_id", "embedding", nsub)
    assert(l.size == 64 && l.forall(_.size == 64))
    // rows are a permutation of an orthonormal basis
    for (i <- l.indices; j <- i until l.size) {
      val d = l(i).zip(l(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-8)
    }
    // the 16 high-variance directions spread across ALL subspaces (2
    // each), instead of concentrating in the first two PCA-order groups
    val rotated = Pca.project(planted, "vec_id", "embedding", l, scale = 9)
    val subVar = rotated.select(posexplode($"vec")).toDF("dim", "v")
      .withColumn("sub", ($"dim" / 8).cast("int"))
      .groupBy("sub").agg(sum($"v" * $"v").as("e"))
      .orderBy("sub").select("e").as[Double].collect()
    assert(subVar.forall(_ > 1.0),
      s"some subspace got only noise: ${subVar.toSeq}")

    // the payoff: same PQ budget, strictly better recall than raw PQ
    val k = 10
    val exact = Similarity.truncatedRerankTopK(planted,
      planted.filter($"vec_id" <= 5), "vec_id", "embedding", k,
      dPrefix = 64, overquery = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def pqRecall(df: org.apache.spark.sql.DataFrame, vecCol: String)
        : Double = {
      val books = Similarity.pqTrain(df.select(col("vec_id"), col(vecCol)),
        vecCol, nsub, 16, seed = 7L)
      val enc = Similarity.pqEncode(df, "vec_id", vecCol, books)
      val got = Similarity.pqTopK(enc, df.filter($"vec_id" <= 5), "vec_id",
        vecCol, k, books)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val raw = pqRecall(planted, "embedding")
    val opq = pqRecall(rotated, "vec")
    assert(opq >= raw,
      s"OPQ rotation must not lose recall: opq=$opq raw=$raw")
    assert(opq >= 0.5, s"OPQ recall too low: $opq (raw $raw)")
  }

  test("zcaLoadings: whitened covariance ≡ identity on an anisotropic " +
      "cloud; isotropic input maps to a scaled identity (closest-to-" +
      "original property); deterministic across runs") {
    val rnd = new scala.util.Random(7)
    // anisotropic 4-d cloud: std devs 10, 3, 1, 0.3 with a rotation mix
    val rows = (0 until 600).map { i =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 3
      val c = rnd.nextGaussian() * 1
      val d = rnd.nextGaussian() * 0.3
      (i.toLong, Array((a + b).toFloat, (a - b).toFloat,
        (c + d).toFloat, (c - d).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val w = graft.operators.Pca.zcaLoadings(df, "vec_id", "embedding")
    assert(w == graft.operators.Pca.zcaLoadings(df, "vec_id", "embedding"))
    // whiten driver-side (mean-centered) and check the covariance
    val mu = Array.tabulate(4)(j => rows.map(_._2(j).toDouble).sum / rows.size)
    val white = rows.map { case (_, v) =>
      Array.tabulate(4)(i =>
        (0 until 4).map(j => w(i)(j) * (v(j) - mu(j))).sum)
    }
    val cov = Array.tabulate(4, 4) { (i, j) =>
      white.map(x => x(i) * x(j)).sum / white.size
    }
    for (i <- 0 until 4; j <- 0 until 4) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 0.05,
        s"cov($i,$j) = ${cov(i)(j)}, want $want")
    }
    // isotropic input: W ≈ (1/σ)·I — ZCA stays in the original basis
    val iso = (0 until 600).map(i =>
      (i.toLong, Array.fill(4)((rnd.nextGaussian() * 2).toFloat)))
      .toDF("vec_id", "embedding")
    val wi = graft.operators.Pca.zcaLoadings(iso, "vec_id", "embedding")
    for (i <- 0 until 4; j <- 0 until 4)
      if (i != j) assert(math.abs(wi(i)(j)) < 0.05,
        s"isotropic W off-diagonal ($i,$j) = ${wi(i)(j)}")
    assert(math.abs(wi(0)(0) - wi(1)(1)) < 0.05)
  }

  test("robustScale: per-dim median/MAD standardization — outlier dim " +
      "keeps a sane scale, constant dim is centered-only (MAD = 0)") {
    // dim 0: values 1..5 plus outlier 1000 → median 3.5, MAD 1.5
    // dim 1: constant 7 → MAD 0 → centered only
    val rows = Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 1000.0f).zipWithIndex
      .map { case (v, i) => (i.toLong, Array(v, 7.0f)) }
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.operators.Pca.robustScale(df, "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // dim 0: (x - 3.5) / 1.5
    assert(out((0L, 0L)) == ((1.0 - 3.5) / 1.5 * 1e6).round / 1e6)
    assert(out((2L, 0L)) == ((3.0 - 3.5) / 1.5 * 1e6).round / 1e6)
    // the outlier scales to ~664, not to 1 — MAD ignored it
    assert(math.abs(out((5L, 0L)) - (1000.0 - 3.5) / 1.5) < 1e-3)
    // dim 1: centered only, all zero
    rows.foreach { case (id, _) => assert(out((id, 1L)) == 0.0) }
    // resilience: a mean/stddev z-score would squash the inliers to
    // ~0.4 apart; median/MAD keeps adjacent inliers 2/3 apart
    assert(out((1L, 0L)) - out((0L, 0L)) > 0.6)
  }
}
