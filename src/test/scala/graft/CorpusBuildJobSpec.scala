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
    val counts = CorpusBuildJob.run(spark, docs, out,
      evalPredicate = col("doc_id") % 20 === 0,
      thresholds = Quality.Thresholds(
        minTokens = 12, maxTokens = 1 << 20,
        allowedLangs = Seq("en", "de", "es", "fr", "unknown")))
    // every stage only removes documents
    assert(counts.raw == docs.count())
    assert(counts.afterQuality <= counts.raw - counts.eval_)
    assert(counts.afterLineDedup <= counts.afterQuality)
    assert(counts.afterDocDedup <= counts.afterLineDedup)
    assert(counts.afterSemDedup <= counts.afterDocDedup)
    assert(counts.afterDecontamination <= counts.afterSemDedup)
    assert(counts.afterDocDedup > 0, "pipeline must not drop everything")

    val corpus = spark.read.parquet(s"$out/corpus")
    // split partitions are disjoint and exhaustive over the final set
    assert(corpus.count() == counts.afterDecontamination)
    val splits = corpus.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == counts.afterDecontamination)
    assert(counts.train == splits.getOrElse("train", 0L))

    // no eval doc leaked into the corpus; eval artifact is complete
    assert(corpus.filter($"doc_id" % 20 === 0).count() == 0)
    assert(spark.read.parquet(s"$out/eval").count() == counts.eval_)

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
}
