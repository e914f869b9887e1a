package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale sanity: amplifies the fixtures (20x events = 2M rows, 10x
  * embeddings = 20k vectors) into a temp dir and times the flagship
  * paths, to check the operators scale with data — results recorded in
  * PLANS.md. Not part of the driver contract.
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale").toString

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STRESS $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // 20x events with disjoint ids and shifted timestamps (6 months span)
    val ev = Tables.load(spark, base, "events")
    val big = (0 until 20).map(i => ev
      .withColumn("event_id", $"event_id" + lit(i.toLong * 10_000_000L))
      .withColumn("ts", $"ts" + expr(s"INTERVAL ${i % 6} MONTHS")))
      .reduce(_.unionByName(_))
    time("write 2M events (month-partitioned, shard-keyed)") {
      sources.IO.writeFact(big, s"$tmp/events", "ts", "event_id",
        overwritePartitions = false)
    }
    val bigEv = spark.read.parquet(s"$tmp/events").drop("month")
    println("rows=" + bigEv.count() + " months=" +
      sources.IO.listMonthPartitions(spark, s"$tmp/events").size)

    time("flagship incremental load (cold start, 2M rows)") {
      val cfg = pipeline.IncrementalLoad.Config(
        keyCol = "event_id", tsCol = "ts", versionCol = "ts",
        projection = Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
        sourceName = "superset")
      pipeline.IncrementalLoad.run(spark, bigEv, s"$tmp/target", cfg).count()
    }
    time("A4 dedup window over 2M rows") {
      operators.Relational.dedupLatest(bigEv, Seq("user_id"), "ts",
        Seq("event_id")).write.format("noop").mode("overwrite").save()
    }
    time("enrichment join + agg over 2M rows") {
      val c = Tables.load(spark, base, "customer")
      operators.Relational.enrich(bigEv, c, "user_id", "c_custkey",
        Seq("c_mktsegment"))
        .groupBy("c_mktsegment").agg(count(lit(1)), sum("value"))
        .write.format("noop").mode("overwrite").save()
    }

    // 10x embeddings
    val emb = Tables.load(spark, base, "embeddings")
    val bigEmb = (0 until 10).map(i => emb
      .withColumn("vec_id", $"vec_id" + lit(i.toLong * 1_000_000L)))
      .reduce(_.unionByName(_)).cache()
    println("vecs=" + bigEmb.count())
    time("brute-force ANN: 10 queries x 20k vectors (native expr)") {
      operators.Similarity.bruteForceTopK(bigEmb, bigEmb.filter($"vec_id" < 10),
        "vec_id", "embedding", 5,
        (a, b) => functions.CosineSimilarity.column(spark, a, b))
        .write.format("noop").mode("overwrite").save()
    }
    time("LSH-bucketed ANN: same, sign-bucket prefilter") {
      operators.Similarity.bucketedTopK(bigEmb, bigEmb.filter($"vec_id" < 10),
        "vec_id", "embedding", 5, 8)
        .write.format("noop").mode("overwrite").save()
    }

    // 10x documents (50k docs, each base doc in a 10-near-dup clique) —
    // the training-tier paths. Copies get a
    // distinct tail so they are near-dups (shared shingles) rather than
    // exact dups, exercising the realistic LSH load.
    val docs = Tables.load(spark, base, "documents")
    val bigDocs = (0 until 10).map(i => docs
      .withColumn("doc_id", $"doc_id" + lit(i.toLong * 10_000_000L))
      .withColumn("text", concat($"text", lit(s" stress tail marker $i"))))
      .reduce(_.unionByName(_)).cache()
    println("docs=" + bigDocs.count())
    time("quality verdict over 50k docs (map-only pass)") {
      operators.Quality.verdict(bigDocs, "doc_id", "text",
        operators.Quality.Thresholds())
        .write.format("noop").mode("overwrite").save()
    }
    time("line dedup over 50k docs (10-word chunks)") {
      operators.LineDedup.dedupLines(bigDocs, "doc_id",
        functions.TextFunctions.wordChunks($"text", 10), maxDocs = 12)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash LSH pairs over 50k docs, 10-cliques (lazy plan)") {
      operators.Dedup.minHashLshPairs(bigDocs, "doc_id", "text",
        5, 4, 3, materialize = false)
        .write.format("noop").mode("overwrite").save()
    }
    time("sequence packing over 50k docs (per-language windows)") {
      operators.Packing.packBins(bigDocs, "doc_id", "lang",
        functions.TextFunctions.tokenCount($"text"), 2048,
        Seq(operators.Sampling.shuffleKey($"doc_id", "stress"), $"doc_id"))
        .write.format("noop").mode("overwrite").save()
    }

    // round-4 tier at the same 10x amplification
    time("bm25 top-3 for 25 queries over 50k docs (inverted index, " +
      "persisted tf)") {
      operators.Retrieval.bm25TopK(bigDocs, "doc_id", "text",
        $"doc_id" < 25, 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("bloom-prefiltered decontamination over 50k docs") {
      operators.Contamination.overlapPrefiltered(bigDocs, "doc_id", "text",
        5, $"doc_id" % 20 === 0, 0.2)
        .write.format("noop").mode("overwrite").save()
    }
    time("misra_gries(40) heavy hitters over 50k docs' tokens") {
      bigDocs.select(explode(functions.TextFunctions.tokens($"text")).as("t"))
        .agg(functions.MisraGries.column(spark, $"t", 40))
        .write.format("noop").mode("overwrite").save()
    }
    time("weighted sample 1000 of 50k docs") {
      operators.Sampling.weightedSample(bigDocs, "doc_id", "n_chars",
        1000, "stress")
        .write.format("noop").mode("overwrite").save()
    }
    time("IVF-PQ top-5: 10 queries x 20k vectors (nlist=32, 8x16 codes)") {
      operators.Similarity.ivfPqTopK(bigEmb, bigEmb.filter($"vec_id" < 10),
        "vec_id", "embedding", 5, nlist = 32, nprobe = 4,
        nsub = 8, ksub = 16)
        .write.format("noop").mode("overwrite").save()
    }
    time("z-order write of 2M events on (user_id, value)") {
      sources.IO.writeZOrdered(bigEv
        .select("event_id", "user_id", "ts", "value"),
        s"$tmp/events_z", Seq("user_id", "value"))
    }

    // round-7 tier at the same amplification
    time("SemDeDup over 20k vectors (KMeans 64 cells, 10-cliques)") {
      operators.Similarity.semDedup(bigEmb, "vec_id", "embedding",
        nlist = 64, minCosine = 0.95)
        .write.format("noop").mode("overwrite").save()
    }
    time("BPE: learn 200 merges (one word-count pass) + tokenize 50k docs") {
      val merges = operators.Bpe.learn(bigDocs, "text", nMerges = 200,
        maxWords = 20000)
      operators.Bpe.tokenize(bigDocs, "doc_id", "text", merges)
        .write.format("noop").mode("overwrite").save()
    }
    time("t-digest p50/p95/p99 of 2M event values (delta=100)") {
      bigEv.agg(functions.TDigestQuantiles.column(spark, $"value", 100,
        Seq(0.5, 0.95, 0.99)))
        .write.format("noop").mode("overwrite").save()
    }
    time("sliding 64/48 chunking of 50k docs (explode, no shuffle)") {
      bigDocs.select($"doc_id",
        posexplode(functions.TextFunctions.slidingChunks($"text", 64, 48)))
        .write.format("noop").mode("overwrite").save()
    }
    time("interpolated bigram LM: train + score 50k docs") {
      operators.LanguageModel.crossEntropyBigram(bigDocs, "doc_id", "text",
        operators.LanguageModel.unigramLm(bigDocs, "text"),
        operators.LanguageModel.bigramLm(bigDocs, "text"))
        .write.format("noop").mode("overwrite").save()
    }
    time("hashed-embedding ANN: 10 queries over 50k docs (hash + cosine)") {
      operators.TextEmbedding.hashedTopK(bigDocs, "doc_id", "text",
        $"doc_id" < 10, 5, 64)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
