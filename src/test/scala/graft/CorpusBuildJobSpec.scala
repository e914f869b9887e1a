package graft

import org.apache.spark.sql.functions._

import graft.examples.CorpusBuildJob
import graft.operators.Quality

/** The training-tier flagship: every stage of the corpus build runs end
  * to end on the fixture corpus and the artifacts are consistent.
  */
class CorpusBuildJobSpec extends SparkSpec {
  import spark.implicits._

  test("corpus build: monotone stage counts and consistent artifacts") {
    val docs = Tables.load(spark, sf, "documents")
    val out = tempDir("corpus_build")
    // deterministic link graph (each doc endorses doc_id/7) and a
    // BINDING per-source cap, so the e2e run exercises the priors →
    // quality-quota stage for real, not as a disabled no-op
    val links = docs.select(col("doc_id").as("src"),
      (col("doc_id") / 7).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val maxPerSource = 15 // 20 sources × 25 docs; ~22/source survive → binds
    val tokenBudget = 500L // ~800 surviving tokens/source → binds too
    val counts = CorpusBuildJob.run(spark, docs, out,
      evalPredicate = col("doc_id") % 20 === 0,
      thresholds = Quality.Thresholds(
        minTokens = 12, maxTokens = 1 << 20,
        allowedLangs = Seq("en", "de", "es", "fr", "unknown")),
      linkEdges = Some(links), maxPerSource = maxPerSource,
      tokenBudgetPerSource = tokenBudget)
    // every stage only removes documents
    assert(counts.raw == docs.count())
    assert(counts.afterQuality <= counts.raw - counts.eval_)
    assert(counts.afterLineDedup <= counts.afterQuality)
    assert(counts.afterDocDedup <= counts.afterLineDedup)
    assert(counts.afterSemDedup <= counts.afterDocDedup)
    assert(counts.afterDecontamination <= counts.afterSemDedup)
    assert(counts.afterQuota <= counts.afterDecontamination)
    assert(counts.afterDocDedup > 0, "pipeline must not drop everything")

    // quality priors: one row per pre-quota doc, usable as an ordering
    // signal, rank term live (the link graph is non-trivial)
    val priors = spark.read.parquet(s"$out/doc_priors")
    assert(priors.count() == counts.afterDecontamination)
    priors.collect().foreach { r =>
      val p = r.getAs[Double]("prior")
      assert(p > 0.0 && p <= 1.0, s"prior out of range: $r")
      val rn = r.getAs[Double]("rank_norm")
      assert(rn > 0.0 && rn <= 1.0, s"rank_norm out of range: $r")
    }

    val corpus = spark.read.parquet(s"$out/corpus")
    // split partitions are disjoint and exhaustive over the final set
    assert(corpus.count() == counts.afterQuota)
    val splits = corpus.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == counts.afterQuota)
    assert(counts.train == splits.getOrElse("train", 0L))

    // the quota BOUND and bound the right way: every source at most
    // maxPerSource docs, and within each source the kept docs are the
    // top-prior ones (min kept >= max dropped)
    val srcCounts = corpus.groupBy("source").count().collect()
    assert(srcCounts.forall(_.getLong(1) <= maxPerSource))
    assert(counts.afterQuota < counts.afterDecontamination,
      "cap chosen to bind — raise fixture attrition if this fails")
    val pr = priors.select("doc_id", "prior")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val keptPr = pr.join(corpus.select("doc_id"), Seq("doc_id"), "left_semi")
    val dropPr = pr.join(corpus.select("doc_id"), Seq("doc_id"), "left_anti")
    val minKept = keptPr.groupBy("source")
      .agg(org.apache.spark.sql.functions.min("prior").as("mn"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    dropPr.groupBy("source")
      .agg(org.apache.spark.sql.functions.max("prior").as("mx"))
      .collect().foreach { r =>
        assert(minKept(r.getString(0)) >= r.getDouble(1),
          s"source ${r.getString(0)} kept a worse doc than it dropped")
      }

    // the token budget bound: every source's corpus slice fits, and
    // the budget genuinely bit somewhere (at least one source is
    // below its row quota only because tokens ran out)
    val srcTokens = corpus
      .withColumn("__t",
        graft.functions.TextFunctions.tokenCount(col("text")))
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("__t").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(srcTokens.values.forall(_ <= tokenBudget),
      s"a source exceeded its token budget: $srcTokens")
    assert(srcTokens.values.max > tokenBudget / 2,
      "budget chosen far too large to bind — tighten the fixture")

    // no eval doc leaked into the corpus; eval artifact is complete
    assert(corpus.filter($"doc_id" % 20 === 0).count() == 0)
    assert(spark.read.parquet(s"$out/eval").count() == counts.eval_)

    // QA report: one row per train-split source; shares form a
    // distribution, drift is a valid KL (>= 0), doc counts reconcile
    // with the corpus train partition
    val qa = spark.read.parquet(s"$out/qa_report")
    val trainSources = corpus.filter($"split" === "train")
      .select("source").distinct().count()
    assert(qa.count() == trainSources)
    val qaRows = qa.collect()
    qaRows.foreach { r =>
      assert(r.getAs[Double]("kl") >= 0.0, s"negative KL: $r")
      assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("n_tokens") > 0)
    }
    val shareSum = qaRows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares must sum to 1: $shareSum")
    assert(qaRows.map(_.getAs[Long]("n_docs")).sum ==
      corpus.filter($"split" === "train").count())

    // pack manifest covers exactly the train split, exclusive offsets
    val manifest = spark.read.parquet(s"$out/pack_manifest")
    assert(manifest.count() == counts.train)
    val grouped = manifest.select("lang", "n_tokens", "start_offset")
      .collect().groupBy(_.getString(0))
    grouped.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      var acc = 0L
      sorted.foreach { r =>
        assert(r.getLong(2) == acc); acc += r.getLong(1)
      }
    }

    // mixture rates are usable sampling gates
    val mix = spark.read.parquet(s"$out/mixture").collect()
    assert(mix.nonEmpty)
    mix.foreach { r =>
      val keep = r.getAs[Double]("keep_rate")
      assert(keep > 0.0 && keep <= 1.0)
    }
    assert(mix.map(_.getAs[Double]("p_tau")).sum > 0.99)

    // BPE merge table: learned, ranked contiguously from 0
    val merges = spark.read.parquet(s"$out/bpe_merges").collect()
    assert(merges.nonEmpty)
    assert(merges.map(_.getAs[Int]("rank")).sorted.toSeq ==
      (0 until merges.length))

    // retrieval chunks: at least one per train doc, ids from the corpus
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.select("doc_id").distinct().count() == counts.train)
    assert(chunks.filter($"chunk_idx" === 0).count() == counts.train)
  }

  test("quality priors: the classifier separates reference-like text " +
      "from junk, link authority boosts the hub, and the per-source " +
      "quota keeps each source's best-prior docs") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    def cleanText(i: Int) =
      s"the quick brown fox jumps over the lazy dog number $i " +
        "and then files clear readable documentation about the system"
    def junkText(i: Int) = ("zq9x kj3w " * 12) + i
    val refDocs = (1000 until 1020)
      .map(i => (i.toLong, cleanText(i))).toDF("doc_id", "text")
    val docs = (
      (0 until 20).map(i => (i.toLong, cleanText(i + 50), s"src_${i % 2}")) ++
      (20 until 40).map(i => (i.toLong, junkText(i), s"src_${i % 2}")))
      .toDF("doc_id", "text", "source")
    // star link graph: every doc links to doc 0
    val edges = (1 until 40).map(i => (i.toLong, 0L)).toDF("src", "dst")

    val priors = CorpusBuildJob.qualityPriors(spark, docs, refDocs,
      Some(edges), hashDim = 64, prIters = 3)
    val p = priors.collect().map(r => r.getLong(0) -> r).toMap
    assert(p.size == 40)
    val cleanAvg = (0 until 20)
      .map(i => p(i.toLong).getAs[Double]("quality_p")).sum / 20
    val junkAvg = (20 until 40)
      .map(i => p(i.toLong).getAs[Double]("quality_p")).sum / 20
    assert(cleanAvg > junkAvg,
      s"classifier failed to separate: clean=$cleanAvg junk=$junkAvg")
    // the hub holds the max rank; spokes are strictly below
    assert(p(0L).getAs[Double]("rank_norm") == 1.0)
    assert((1 until 40).forall(
      i => p(i.toLong).getAs[Double]("rank_norm") < 1.0))
    // prior composes both terms
    p.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("prior") -
        math.floor(r.getAs[Double]("quality_p") *
          r.getAs[Double]("rank_norm") * 1e6 + 0.5) / 1e6) < 1e-12)
    }

    // no reference set -> classifier skipped, neutral p = 0.5, prior
    // driven by link authority alone (never a one-class training crash)
    val noRef = CorpusBuildJob.qualityPriors(spark, docs,
      refDocs.limit(0), Some(edges), hashDim = 64, prIters = 3)
    assert(noRef.count() == 40)
    noRef.collect().foreach { r =>
      assert(r.getAs[Double]("quality_p") == 0.5 &&
        r.getAs[Double]("logit") == 0.0)
    }

    // quality-aware quota: each capped source keeps exactly its
    // 5 best-prior docs — min(kept) >= max(dropped) within a source
    val withPrior = docs.join(priors.select("doc_id", "prior"),
      Seq("doc_id"))
    val kept = Sampling.capPerGroupTop(withPrior, "source", 5,
      Seq(col("prior").desc, col("doc_id")))
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(kept.groupBy("source").count().collect()
      .forall(_.getLong(1) == 5L))
    for (src <- Seq("src_0", "src_1")) {
      val all = withPrior.filter($"source" === src)
        .select("doc_id", "prior").as[(Long, Double)].collect()
      val (k, d) = all.partition(r => keptIds.contains(r._1))
      assert(k.map(_._2).min >= d.map(_._2).max,
        s"$src kept a worse doc than it dropped")
    }
  }

  /** Solid-color PNG (every solid color aHashes to the same degenerate
    * value — the planted near-dup class). */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 2×2-checkered PNG — a structured image whose aHash differs from
    * the solid-color class. */
  private def checkerPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if (((x / 2) + (y / 2)) % 2 == 0) 0xFFFFFF else 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** In-memory mono 16-bit PCM WAV sine. */
  private def wavBytes(freqHz: Double, ms: Int,
                       rate: Float = 8000f): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freqHz * i / rate) * 16384).toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("media build: near-dup images collapse to one canonical row; " +
      "audio windows and opaque payloads survive") {
    import graft.multimodal.Multimodal
    val media = Seq(
      // three near-dup images (solid colors share the degenerate
      // aHash) → ONE canonical row (min id 1)
      Multimodal.MediaRow(1L, pngBytes(8, 8, 0x000000), "image/png", 8, 8),
      Multimodal.MediaRow(2L, pngBytes(8, 8, 0xFFFFFF), "image/png", 8, 8),
      Multimodal.MediaRow(3L, pngBytes(8, 8, 0x808080), "image/png", 8, 8),
      // a structurally different image → its own cluster, kept
      Multimodal.MediaRow(4L, checkerPng(8, 8), "image/png", 8, 8),
      // real audio → kept (no aHash) + contributes energy windows
      Multimodal.MediaRow(5L, wavBytes(400.0, 500), "audio/wav", 0, 0),
      // opaque payload → kept, no perceptual-dup claim, no windows
      Multimodal.MediaRow(6L, "not media".getBytes("UTF-8"), "bin", 0, 0)
    ).toDS()
    val out = tempDir("media_build")
    val counts = CorpusBuildJob.runMedia(spark, media, out)
    assert(counts.rawMedia == 6 && counts.hashedImages == 4)
    // 6 payloads − 2 collapsed near-dups = 4 canonical rows
    assert(counts.canonicalRows == 4, counts.toString)
    val kept = spark.read.parquet(s"$out/media_canonical")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L),
      s"canonical set wrong: $kept")
    // windowed audio: 500 ms / 250 ms windows from doc 5 only
    val win = spark.read.parquet(s"$out/media_audio_windows")
    assert(counts.audioWindowRows == 2)
    assert(win.select("doc_id").distinct().as[Long].collect().toSeq
      == Seq(5L))
    // features cover every payload (checksum per row)
    val feats = spark.read.parquet(s"$out/media_features")
    assert(feats.count() == 6)
    assert(feats.select("checksum").distinct().count() == 6)
  }
}
