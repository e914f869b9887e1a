package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Quality}

/** Round-9 data-quality operators: robust MAD outliers, JSON payload
  * quarantine, embedding centroid drift, multi-epoch budget allocation.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: a planted gross outlier is flagged, inliers are not, " +
    "and the median/MAD stats survive contamination a mean/stddev gate would not") {
    // 20 inliers near 10.0 plus one 1000.0 spike. With mean/stddev the
    // spike inflates sd to ~216 and its plain z is ~4.4 — borderline;
    // with median/MAD the stats ignore it entirely and rz is huge.
    val rows = ((1 to 20).map(i => (i.toLong, "a", 10.0 + (i % 5) * 0.1)) :+
      (99L, "a", 1000.0)).toDF("id", "grp", "v")
    val out = Profile.madOutliers(rows, "grp", "v").collect()
    val flagged = out.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.map(_.getAs[Long]("id")).toSet == Set(99L))
    assert(math.abs(flagged.head.getAs[Double]("rz")) > 1000)
  }

  test("madOutliers: a constant group (MAD = 0) scores every row rz 0, not NaN") {
    val rows = (1 to 8).map(i => (i.toLong, "c", 5.0)).toDF("id", "grp", "v")
    val out = Profile.madOutliers(rows, "grp", "v").collect()
    assert(out.forall(r => r.getAs[Double]("rz") == 0.0 &&
      !r.getAs[Boolean]("is_outlier")))
  }

  test("jsonQuarantine: parseable field routes ok with the value, malformed " +
    "JSON / wrong shape / non-numeric field all quarantine with payload intact") {
    val rows = Seq(
      (1L, """{"k": 7}"""),
      (2L, "{broken"),
      (3L, """{"other": 1}"""),
      (4L, """{"k": "abc"}"""),
      (5L, null.asInstanceOf[String])).toDF("id", "props")
    val out = Quality.jsonQuarantine(rows, "props", "k")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("status")).toSeq ==
      Seq("ok", "quarantine", "quarantine", "quarantine", "quarantine"))
    assert(out.head.getAs[Long]("k") == 7L)
    // the raw payload column survives for replay
    assert(out(1).getAs[String]("props") == "{broken")
  }

  test("centroidDrift: a group aligned with the corpus scores ~1, an " +
    "opposed group scores negative, and a zero-vector group scores 0") {
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e1n = Array(-1.0f, 0.0f, 0.0f, 0.0f)
    val z = Array(0.0f, 0.0f, 0.0f, 0.0f)
    // corpus sum is dominated by group "big" (9 copies of e1 and one -e1)
    val rows = ((1 to 9).map(i => (s"big", e1)) :+ (("neg", e1n)) :+
      (("zero", z))).toDF("grp", "vec")
    val out = Profile.centroidDrift(rows, "grp", "vec")
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Double]("cos_to_corpus")).toMap
    assert(out("big") == 1.0)   // exactly collinear with the corpus sum
    assert(out("neg") == -1.0)
    assert(out("zero") == 0.0)  // zero-norm guard, not NaN
  }

  test("centroidDrift: counts are per group and quantization keeps " +
    "sub-millesimal components (drift metric is the quantized cosine)") {
    val a = Array(0.5f, 0.5f)
    val b = Array(0.5f, -0.5f)
    val rows = Seq(("a", a), ("a", a), ("b", b)).toDF("grp", "vec")
    val out = Profile.centroidDrift(rows, "grp", "vec")
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n"), r.getAs[Double]("cos_to_corpus"))).toMap
    assert(out("a")._1 == 2 && out("b")._1 == 1)
    // corpus sum = (1.5, 0.5); cos(a, corpus) > 0.8, cos(b, corpus) < 0.5
    assert(out("a")._2 > 0.8 && out("b")._2 < 0.5)
  }

  test("epochPlan: allocation = min(desired, cap), shortfall is the exact " +
    "gap, epochs never exceed maxEpochs, and τ=1 reproduces natural shares") {
    val mix = Seq(("s1", 1000L), ("s2", 9000L), ("s3", 0L))
      .toDF("source", "n_tokens")
    // τ=1: desired/cap = B/(1.5·total) is the SAME for every group (both
    // desire and cap scale with tokens), so at B=20000 > 1.5·total both
    // sources cap at exactly 1.5 epochs; s3 (empty) is dropped.
    val out = Profile.epochPlan(mix, "source", "n_tokens",
      tau = 1.0, budgetTokens = 20000L, maxEpochs = 1.5)
      .orderBy("source").collect()
    assert(out.length == 2) // the zero-token group is dropped up front
    val s1 = out(0); val s2 = out(1)
    // τ=1: p = natural share
    assert(s1.getAs[Double]("p") == 0.1 && s2.getAs[Double]("p") == 0.9)
    assert(s1.getAs[Long]("desired_tokens") == 2000L)
    assert(s1.getAs[Long]("alloc_tokens") == 1500L) // capped at 1.5 epochs
    assert(s1.getAs[Long]("shortfall_tokens") == 500L)
    assert(s1.getAs[Double]("epochs") == 1.5)
    assert(s2.getAs[Long]("alloc_tokens") == 13500L) // 1.5 × 9000, same cap
    assert(s2.getAs[Long]("shortfall_tokens") == 4500L)
    for (r <- out) {
      assert(r.getAs[Double]("epochs") <= 1.5 + 1e-9)
      assert(r.getAs[Long]("alloc_tokens") <=
        r.getAs[Long]("desired_tokens"))
    }
    // τ=0 flattens the mix to uniform — NOW the outcomes mix: the small
    // source caps (10000 desired vs 1500 cap) while the big one takes
    // its full uniform desire.
    val flat = Profile.epochPlan(mix, "source", "n_tokens",
      tau = 0.0, budgetTokens = 20000L, maxEpochs = 1.5)
      .orderBy("source").collect()
    assert(flat(0).getAs[Long]("desired_tokens") == 10000L)
    assert(flat(0).getAs[Long]("alloc_tokens") == 1500L)
    assert(flat(1).getAs[Long]("alloc_tokens") == 10000L) // uncapped
    assert(flat(1).getAs[Long]("shortfall_tokens") == 0L)
  }

  test("psi: a period matching the baseline scores ~0, a shifted period " +
    "crosses the 0.25 alarm line, and a bin empty in one period stays " +
    "finite via the eps floor") {
    // p1/p2: uniform over [0, 100) — every bin covered, so they sit
    // near the (slightly p3-polluted) baseline. p3: a small batch with
    // ALL mass in the top bin — its own psi explodes through the eps
    // floor on its four empty bins, which is exactly the alarm.
    val rows = (
      (1 to 100).map(i => ("p1", (i % 100).toDouble)) ++
      (1 to 100).map(i => ("p2", (i % 100).toDouble)) ++
      (1 to 10).map(_ => ("p3", 95.0))).toDF("p", "v")
    val out = graft.operators.Profile.psi(
      rows, col("p"), "v", edges = Seq(20.0, 40.0, 60.0, 80.0))
      .collect().map(r => r.getAs[String]("period") ->
        r.getAs[Double]("psi")).toMap
    assert(out.keySet == Set("p1", "p2", "p3"))
    assert(out("p1") == out("p2"), "identical periods must score identically")
    assert(out("p1") < 0.25, s"near-baseline period: ${out("p1")}")
    assert(out("p3") > 0.25 && !out("p3").isNaN && !out("p3").isInfinite,
      s"broken period must alarm finitely: ${out("p3")}")
  }

  test("psi: guards reject unsorted edges and non-positive eps") {
    val rows = Seq(("p1", 1.0)).toDF("p", "v")
    intercept[IllegalArgumentException] {
      graft.operators.Profile.psi(rows, col("p"), "v", Seq(2.0, 1.0))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.psi(rows, col("p"), "v", Seq(1.0), eps = 0.0)
    }
  }

  test("epochPlan: guards reject a non-positive budget or epoch cap") {
    val mix = Seq(("s1", 10L)).toDF("source", "n_tokens")
    intercept[IllegalArgumentException] {
      Profile.epochPlan(mix, "source", "n_tokens", 1.0, 0L, 1.0)
    }
    intercept[IllegalArgumentException] {
      Profile.epochPlan(mix, "source", "n_tokens", 1.0, 100L, 0.0)
    }
  }

  test("weightedQuantiles: the weighted median lands on the value " +
    "holding half the WEIGHT, non-positive weights drop, float " +
    "weights are rejected") {
    // one heavy doc (w=8) vs two light ones: unweighted median = 2,
    // token-weighted median = 10
    val df = Seq(("a", 1, 1L), ("a", 2, 1L), ("a", 10, 8L),
      ("a", 99, 0L), // zero weight: can never be selected
      ("b", 5, 2L), ("b", 7, 2L)).toDF("g", "v", "w")
    val out = Profile.weightedQuantiles(df, "g", "v", "w", Seq(0.2, 0.5))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(out("a") == ((2, 10)), s"got ${out("a")}")
    // b: totw 4; q=0.2 → thr 0.8 → first value (cumw 2); q=0.5 → thr 2
    // → still the first value (cumw 2 >= 2, lower weighted quantile)
    assert(out("b") == ((5, 5)), s"got ${out("b")}")
    intercept[IllegalArgumentException] {
      Profile.weightedQuantiles(
        Seq(("a", 1, 1.5)).toDF("g", "v", "w"), "g", "v", "w", Seq(0.5))
    }
  }

  test("weightedQuantiles column naming: whole percentages keep pNN, " +
    "fractional ones carry their decimals, collisions are rejected") {
    val df = Seq(("a", 1, 1L), ("a", 2, 1L), ("a", 10, 8L))
      .toDF("g", "v", "w")
    // 0.25 vs 0.254 used to BOTH round to p25 — now distinct names
    val out = Profile.weightedQuantiles(df, "g", "v", "w",
      Seq(0.25, 0.254, 0.5))
    assert(out.columns.toSeq == Seq("g", "p25", "p25_4", "p50"),
      out.columns.mkString(","))
    // a genuinely identical pair still fails loudly
    intercept[IllegalArgumentException] {
      Profile.weightedQuantiles(df, "g", "v", "w", Seq(0.5, 0.5))
    }
  }

  test("zipfFit: a planted Zipf-1 distribution fits slope ~ -1 with " +
    "|corr| ~ 1; a uniform distribution fits slope 0; a single-term " +
    "group reports NULL (degenerate)") {
    // term i appears floor(1200/i) times: exact Zipf with exponent -1
    val zipf = (1 to 40).flatMap(i =>
      Seq.fill(1200 / i)(("z", s"t%02d".format(i))))
    val unif = (1 to 40).flatMap(i => Seq.fill(30)(("u", s"t%02d".format(i))))
    val solo = Seq.fill(100)(("s", "only"))
    val df = (zipf ++ unif ++ solo).toDF("g", "term")
    val out = Profile.zipfFit(df, "g", $"term")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val (zn, zs, zc) = out("z")
    assert(zn == 40 && zs.exists(s => s > -1.1 && s < -0.9), s"$zs")
    assert(zc.exists(_ < -0.99), s"corr $zc")
    val (_, us, _) = out("u")
    // uniform: every frequency equal -> flat line, slope exactly 0
    assert(us.contains(0.0), s"$us")
    val (sn, ss, sc) = out("s")
    // one distinct term: rank variance is zero, fit is undefined
    assert(sn == 1 && ss.isEmpty && sc.isEmpty)
  }

  test("classTfIdf: class-distinctive terms outrank corpus-common ones; " +
      "per-class budget and rank contract hold") {
    // "the" floods every class; each class has its own marker term at
    // LOWER in-class count than "the" — raw frequency would rank "the"
    // first everywhere, c-TF-IDF must put the marker on top
    val rows =
      Seq.fill(30)(("a", "the")) ++ Seq.fill(20)(("a", "alpha")) ++
        Seq.fill(5)(("a", "misc")) ++
        Seq.fill(30)(("b", "the")) ++ Seq.fill(20)(("b", "beta")) ++
        Seq.fill(5)(("b", "misc"))
    val out = graft.operators.Profile.classTfIdf(
      rows.toDF("g", "term"), "g", $"term", 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(4)) ->
        (r.getString(1), r.getDouble(3)))
      .toMap
    assert(out(("a", 1L))._1 == "alpha" && out(("b", 1L))._1 == "beta",
      s"markers must outrank the flood term: $out")
    assert(out(("a", 2L))._1 == "the" && out(("b", 2L))._1 == "the")
    // k is a hard per-class budget
    assert(out.size == 4)
    // scores are positive (ln(1 + x) > 0 for x > 0) and rank-ordered
    assert(out.values.forall(_._2 > 0))
    assert(out(("a", 1L))._2 > out(("a", 2L))._2)
  }

  test("keyness: the strong marker tops its class, the corpus-wide " +
      "flood term is NOT enriched anywhere, rare-but-exclusive ranks " +
      "below the marker (significance, not ratio)") {
    val rows =
      Seq.fill(30)(("a", "the")) ++ Seq.fill(20)(("a", "alpha")) ++
        Seq(("a", "rare")) ++
        Seq.fill(30)(("b", "the")) ++ Seq.fill(20)(("b", "beta")) ++
        Seq(("b", "rareb")) // balanced: "the" sits EXACTLY at expectation
    val out = Profile.keyness(rows.toDF("g", "w"), "g", col("w"), 10)
      .collect()
      .map(r => (r.getString(0), r.getInt(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(("a", 1))._1 == "alpha" && out(("a", 1))._2 == 20L &&
      out(("a", 1))._3 == 20L)
    assert(out(("b", 1))._1 == "beta")
    // "the" sits AT or UNDER expectation in both classes → excluded
    assert(!out.values.exists(_._1 == "the"))
    // rare-but-exclusive: enriched, but G² far below the marker's
    val rare = out.find { case (_, v) => v._1 == "rare" }
    assert(rare.isDefined && rare.get._2._4 < out(("a", 1))._4 / 5,
      s"rare term must rank on significance: $out")
    // G² is positive for every emitted (enriched) term
    assert(out.values.forall(_._4 > 0))
  }

  test("kmvIntersect: unsaturated sketches are EXACT, saturated " +
      "estimates land near truth, disjoint pairs are absent") {
    // unsaturated: 30 values each, 10 shared, k = 64 → theta = 1
    val a = (0 until 30).map(i => ("a", s"v$i"))
    val b = (20 until 50).map(i => ("b", s"v$i"))
    val c = (100 until 120).map(i => ("c", s"w$i")) // disjoint from a, b
    val small = (a ++ b ++ c).toDF("g", "v")
    val outS = Profile.kmvIntersect(small, "g", col("v"), 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(outS(("a", "b")) == ((10L, 10L)), s"unsaturated must be exact: $outS")
    assert(!outS.contains(("a", "c")) && !outS.contains(("b", "c")))
    // saturated: 2000 values each, 1000 shared, k = 64
    val bigA = (0 until 2000).map(i => ("a", s"x$i"))
    val bigB = (1000 until 3000).map(i => ("b", s"x$i"))
    val outB = Profile.kmvIntersect((bigA ++ bigB).toDF("g", "v"),
      "g", col("v"), 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val (ex, est) = outB(("a", "b"))
    assert(ex == 1000L)
    assert(math.abs(est - 1000L) < 500,
      s"saturated estimate too far from truth: $est vs $ex")
    // determinism: bit-equal on re-run
    val again = Profile.kmvIntersect((bigA ++ bigB).toDF("g", "v"),
      "g", col("v"), 64).collect().map(_.getLong(3)).toSeq
    assert(again == Seq(est))
  }

  test("benford: exact digit shares, absent digits emitted as 0 (a " +
      "missing digit is evidence), uniform digits score a fat chi2") {
    // key u: one value per digit 1..9 → uniform 1/9 shares
    val uniform = (1 to 9).map(d => ("u", d.toLong * 100))
    // key b: digit 1 heavy, digits 5..9 absent
    val skewed = Seq.fill(30)(("b", 1000L)) ++ Seq.fill(18)(("b", 2000L)) ++
      Seq.fill(12)(("b", 3000L)) ++ Seq.fill(10)(("b", 4000L))
    val df = (uniform ++ skewed).toDF("k", "x")
    val out = Profile.benford(df, "k", col("x"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    assert(out.size == 18) // 9 digits for each of the 2 keys
    assert(out(("u", 1))._1 == 1L && math.abs(out(("u", 1))._2 - 1.0 / 9) < 1e-8)
    // skewed key: digit shares are exact, absent digits 0 with chi2 = n·e
    assert(out(("b", 1))._1 == 30L)
    assert(math.abs(out(("b", 1))._2 - 30.0 / 70) < 1e-8)
    assert(out(("b", 9))._1 == 0L && out(("b", 9))._2 == 0.0)
    val e9 = math.log10(1.0 + 1.0 / 9)
    assert(math.abs(out(("b", 9))._3 - 70.0 * e9) < 1e-6)
    // uniform digits deviate from Benford: total chi2 for u > for a
    // Benford-ish key would be — at minimum the digit-1 deficit fires
    val e1 = math.log10(2.0)
    val dev = 1.0 / 9 - e1
    assert(math.abs(out(("u", 1))._3 - 9.0 * dev * dev / e1) < 1e-6)
  }

  test("jsDivergenceMatrix: identical distributions → 0, hand-computed " +
      "partial overlap, disjoint vocabularies produce no row") {
    val docs = Seq(
      ("g1", "a a b"), ("g2", "a c"),
      ("g3", "x y"), ("g4", "x y"),
      ("g5", "zz"))
      .toDF("source", "text")
    val out = Profile.jsDivergenceMatrix(docs, "source",
      explode(split(col("text"), " ")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // identical: all mass shared, every log term 0
    assert(out(("g3", "g4")) == ((2L, 0.0)))
    // hand case g1 vs g2: shared = {a}, p = 2/3, q = 1/2
    val (p, q) = (2.0 / 3, 0.5)
    def l2(x: Double) = math.log(x) / math.log(2)
    val term = p * l2(2 * p / (p + q)) + q * l2(2 * q / (p + q))
    val want = 0.5 * ((1 - p) + (1 - q)) + 0.5 * term
    assert(math.abs(out(("g1", "g2"))._2 - want) < 1e-6,
      s"${out(("g1", "g2"))._2} vs $want")
    // g5 shares nothing with anyone → absent (sparse output)
    assert(!out.keys.exists(k => k._1 == "g5" || k._2 == "g5"))
    // ordering contract: only g1 < g2 rows
    assert(out.keys.forall { case (x, y) => x < y })
  }

  test("cusum: the prefix-min closed form equals the textbook " +
      "recurrence; sustained small drift fires where points stay " +
      "unremarkable; resets after the dip") {
    // noise ±2 around 0 for 6 points, then a sustained +3 drift —
    // each drift point is within the noise band (a z-score sleeps)
    val xs = Seq(2L, -2L, 1L, -1L, 2L, -2L, 3L, 3L, 3L, 3L, 3L)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      ("g", i.toLong, i.toLong, v)
    }
    val df = rows.toDF("k", "t", "id", "x")
    val out = Profile.cusum(df, "k", "t", "id", col("x"),
      allowance = 1L, threshold = 8L)
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getBoolean(4)))
    // textbook recurrence S_t = max(0, S_{t-1} + (x - k))
    var s = 0L
    val expect = xs.map { v => s = math.max(0L, s + (v - 1L)); s }
    assert(out.map(_._2).toSeq == expect,
      s"closed form != recurrence: ${out.map(_._2).toSeq} vs $expect")
    // the drift run accumulates 2 per step and crosses h = 8
    assert(!out(5)._3 && out.last._3)
    assert(out.map(_._1).toSeq == (0L until 11L))
  }

  test("dpNoisyCounts: exact n_true, seed-deterministic noise, seed " +
      "rotation changes it, and noise scales exactly 1/ε") {
    val df = (Seq.fill(30)(("en", "web")) ++ Seq.fill(10)(("fr", "web")) ++
      Seq.fill(5)((null.asInstanceOf[String], "book")))
      .toDF("lang", "source")
    def run(eps: Double, seed: Int) =
      Profile.dpNoisyCounts(df, Seq("lang", "source"), eps, seed = seed)
        .collect()
        .map(r => (Option(r.getString(0)), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val a = run(1.0, 42)
    assert(a((Some("en"), "web"))._1 == 30L)
    assert(a((Some("fr"), "web"))._1 == 10L)
    assert(a((None, "book"))._1 == 5L)
    // deterministic: bit-equal on re-run
    assert(run(1.0, 42) == a)
    // a different seed moves at least one group's noise
    val b = run(1.0, 43)
    assert(a.keys.exists(k => a(k)._2 != b(k)._2))
    // ε=2 noise is half of ε=1 noise (same u, b halves); the noise
    // term itself halves exactly but n_true + noise re-rounds, so the
    // recovered difference is compared at 1e-9
    val c = run(2.0, 42)
    a.keys.foreach { k =>
      val n1 = a(k)._2 - a(k)._1
      val n2 = c(k)._2 - c(k)._1
      assert(math.abs(n2 - n1 / 2.0) < 1e-9, s"$k: $n2 != ${n1 / 2.0}")
    }
    // noise is non-zero somewhere (u = 0 is unreachable by construction)
    assert(a.values.exists(v => v._2 != v._1.toDouble))
  }

  test("quantileNorm: rank transform with average tie ranks, endpoints " +
      "0 and 1, singleton group = 0.5, cross-source comparability") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("b", 5L, 1000L), ("b", 6L, 2000L), ("b", 7L, 3000L),
      ("c", 8L, 7L))
      .toDF("source", "doc_id", "score")
    val out = Profile.quantileNorm(df, "source", "score", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0 && out(4L) == 1.0)
    // the tied 20s share the average of ranks 2,3 → (2.5-1)/3 = 0.5
    assert(out(2L) == 0.5 && out(3L) == 0.5)
    // source b: wildly different scale, same quantile grid
    assert(out(5L) == 0.0 && out(6L) == 0.5 && out(7L) == 1.0)
    assert(out(8L) == 0.5)
  }

  test("distinctNgrams: hand-counted totals/distincts per n; repetitive " +
      "group collapses; a doc shorter than n contributes no n-row") {
    val df = Seq(
      ("t", "a b a b"),   // uni 4/2, bi 3/2, tri 2/2
      ("u", "x x x"),     // uni 3/1, bi 2/1, tri 1/1
      ("v", "q"))         // uni 1/1, no bi/tri rows at all
      .toDF("source", "text")
    val out = Profile.distinctNgrams(df, "source", "text", 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("t", 1)) == ((4L, 2L, 0.5)))
    assert(out(("t", 2))._1 == 3L && out(("t", 2))._2 == 2L &&
      math.abs(out(("t", 2))._3 - 0.666666667) < 1e-9)
    assert(out(("t", 3)) == ((2L, 2L, 1.0)))
    assert(out(("u", 1))._1 == 3L && out(("u", 1))._2 == 1L &&
      math.abs(out(("u", 1))._3 - 0.333333333) < 1e-9)
    assert(out(("u", 2))._1 == 2L && out(("u", 2))._2 == 1L)
    assert(out(("u", 3)) == ((1L, 1L, 1.0)))
    assert(out(("v", 1)) == ((1L, 1L, 1.0)))
    assert(!out.contains(("v", 2)) && !out.contains(("v", 3)))
    // the diversity signal itself: natural-ish beats templated
    assert(out(("t", 2))._3 > out(("u", 2))._3)
  }

  test("kAnonymity: group sizes are exact, small groups flag at_risk, " +
      "NULL is a quasi value (it still narrows the attacker's set)") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("fr", "web"),                        // singleton → at risk
      (null.asInstanceOf[String], "book"),  // NULL group
      (null.asInstanceOf[String], "book"))
      .toDF("lang", "source")
    val out = Profile.kAnonymity(df, Seq("lang", "source"), 2L)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out((Some("en"), "web")) == ((3L, false)))
    assert(out((Some("fr"), "web")) == ((1L, true)))
    assert(out((None, "book")) == ((2L, false)))
  }

  test("lDiversity: homogeneous group flags even when k-anonymous; " +
      "NULL sensitive values don't count toward l") {
    val df = Seq(
      // big but homogeneous: k = 3, l = 1 → the attack k misses
      ("a", 1L, Some(7L)), ("a", 1L, Some(7L)), ("a", 1L, Some(7L)),
      // diverse: l = 2
      ("a", 2L, Some(1L)), ("a", 2L, Some(2L)),
      // NULLs disclose nothing: l = 1, not 2
      ("b", 1L, Some(5L)), ("b", 1L, None), ("b", 1L, None))
      .toDF("seg", "cohort", "sensitive")
    val out = Profile.lDiversity(df, Seq("seg", "cohort"), "sensitive", 2L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("a", 1L)) == ((3L, 1L, true)))
    assert(out(("a", 2L)) == ((2L, 2L, false)))
    assert(out(("b", 1L)) == ((3L, 1L, true)))
  }

  test("idGaps: recovers exactly the absent islands through both the " +
      "intra-bucket and cross-bucket paths, spans empty buckets, and " +
      "tolerates duplicate ids") {
    // ids {0,1,3,5,6,10,20,21} with bucketSize 4 (buckets 0,1,2,5):
    // intra: (2,2); boundaries: (4,4), (7,9), (11,19) — the last spans
    // the fully-empty buckets 3 and 4. Id 5 is duplicated on purpose.
    val ids = Seq(0L, 1L, 3L, 5L, 5L, 6L, 10L, 20L, 21L).toDF("id")
    val out = Profile.idGaps(ids, "id", bucketSize = 4L)
      .orderBy("gap_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 2L, 1L), (4L, 4L, 1L), (7L, 9L, 3L),
      (11L, 19L, 9L)))
    // a gap-free contiguous stream reports nothing
    assert(Profile.idGaps(spark.range(0, 50).toDF("id"), "id", 8L)
      .count() == 0)
  }

  test("gopherRules: each rule flags its planted violation and only it; " +
      "a clean document passes the panel") {
    val good = (("the quick brown fox jumps over and over with that " +
      "pace of calm be have ") * 5).trim // 70 words, all rules satisfied
    val fewWords = "the and of with that have be to"
    val symbols = ("the and of with that have " +
      Seq.fill(50)("word").mkString(" ") + " " +
      Seq.fill(20)("#").mkString(" ")).trim // 76 words, 20 hashes > 10%
    val numeric = ("the and " + Seq.fill(60)("12345").mkString(" ")).trim
    val noStops = Seq.fill(60)("zebra").mkString(" ")
    // line-shaped rules (Rae '21 App. A, the wordChunks "line" unit):
    // every 10-word chunk of doc 6 starts with a bullet (frac 1.0 >
    // 0.9), every chunk of doc 7 ends with an ellipsis (1.0 > 0.3);
    // both docs satisfy every other rule, so exactly one flag flips
    val bullets = Seq.fill(6)(
      "- the and for fox pace calm jumps brown quick").mkString(" ")
    val ellipses = Seq.fill(6)(
      "the and fox jumps over pace calm brown quick done...").mkString(" ")
    val docs = Seq((1L, good), (2L, fewWords), (3L, symbols),
      (4L, numeric), (5L, noStops), (6L, bullets), (7L, ellipses))
      .toDF("doc_id", "text")
    val out = Quality.gopherRules(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"))
    assert(out(1L).getAs[Boolean]("pass_bullet_lines") &&
      out(1L).getAs[Boolean]("pass_ellipsis_lines"))
    assert(!out(2L).getAs[Boolean]("pass_words") &&
      out(2L).getAs[Boolean]("pass_stops"))
    assert(!out(3L).getAs[Boolean]("pass_symbols") &&
      out(3L).getAs[Boolean]("pass_words"))
    assert(!out(4L).getAs[Boolean]("pass_alpha"))
    assert(!out(5L).getAs[Boolean]("pass_stops") &&
      !out(5L).getAs[Boolean]("gopher_pass"))
    assert(!out(6L).getAs[Boolean]("pass_bullet_lines") &&
      out(6L).getAs[Boolean]("pass_ellipsis_lines") &&
      out(6L).getAs[Boolean]("pass_words") &&
      out(6L).getAs[Boolean]("pass_stops") &&
      !out(6L).getAs[Boolean]("gopher_pass"))
    assert(out(6L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!out(7L).getAs[Boolean]("pass_ellipsis_lines") &&
      out(7L).getAs[Boolean]("pass_bullet_lines") &&
      out(7L).getAs[Boolean]("pass_symbols") && // 6 '…' / 60 words = 0.1, the band edge
      !out(7L).getAs[Boolean]("gopher_pass"))
    assert(out(7L).getAs[Double]("ellipsis_line_frac") == 1.0)
  }

  test("c4Filters: terminal punctuation, sentence count, and the three " +
      "substring gates each flip exactly their flag") {
    val docs = Seq(
      (1L, "one. two. three. clean text ends well."),
      (2L, "no terminal punctuation. first. second. but open ending"),
      (3L, "only one sentence."),
      (4L, "braces { appear. one. two. three."),
      (5L, "Lorem Ipsum dolor. one. two. three."),
      (6L, "enable JavaScript to view. one. two. three."))
      .toDF("doc_id", "text")
    val out = Quality.c4Filters(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("c4_pass"))
    assert(!out(2L).getAs[Boolean]("pass_terminal_punct") &&
      out(2L).getAs[Boolean]("pass_min_sentences"))
    assert(!out(3L).getAs[Boolean]("pass_min_sentences"))
    assert(!out(4L).getAs[Boolean]("pass_no_brace"))
    assert(!out(5L).getAs[Boolean]("pass_no_lorem"))
    assert(!out(6L).getAs[Boolean]("pass_no_javascript"))
    assert((2L to 6L).forall(i => !out(i).getAs[Boolean]("c4_pass")))
  }

  test("prefixBoilerplate: the dominant leading-token run wins with the " +
      "right share; count ties resolve to the smaller prefix") {
    val chrome = "welcome to example site home news sports weather"
    val docs = Seq(
      (1L, "A", s"$chrome article one body text"),
      (2L, "A", s"$chrome article two body text"),
      (3L, "A", s"$chrome article three body text"),
      (4L, "A", "completely different start of a unique document here now"),
      (5L, "B", "aa bb cc dd ee ff gg hh tail one"),
      (6L, "B", "zz yy xx ww vv uu tt ss tail two"))
      .toDF("doc_id", "source", "text")
    val out = Profile.prefixBoilerplate(docs, "doc_id", "text", "source", 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getString(1) == chrome)
    assert(out("A").getLong(2) == 3 && out("A").getDouble(3) == 0.75)
    // B: both prefixes count 1 — the lexicographically smaller wins
    assert(out("B").getString(1) == "aa bb cc dd ee ff gg hh")
  }

  test("dispersion: a part-concentrated term out-ranks an evenly-spread " +
      "one, with closed-form DP values") {
    // part A: x×4 + y×4, part B: y×4 → s_A=2/3, s_B=1/3
    // DP(x) = ½(|1 − 2/3| + |0 − 1/3|) = 1/3; DP(y) = ½(2·|1/2−…|) = 1/6
    val occ = (Seq.fill(4)(("A", "x")) ++ Seq.fill(4)(("A", "y")) ++
      Seq.fill(4)(("B", "y"))).toDF("part", "term")
    val out = Profile.dispersion(occ, "part", col("term"), minCount = 2L,
      k = 10).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("x", "y"))
    val dp = out.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(dp("x") == 0.333333, s"dp(x)=${dp("x")}")
    assert(dp("y") == 0.166667, s"dp(y)=${dp("y")}")
  }
}
