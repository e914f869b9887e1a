package graft

import org.apache.spark.sql.types._

import graft.operators.Sampling

class SamplingAndValidationSpec extends SparkSpec {
  import spark.implicits._

  test("hash-gated sample is reproducible and roughly proportional") {
    val d = Tables.load(spark, sf, "documents")
    val s1 = Sampling.deterministicSample(d, "doc_id", 64)
    val s2 = Sampling.deterministicSample(d, "doc_id", 64)
    assert(s1.select("doc_id").collect().toSeq ==
      s2.select("doc_id").collect().toSeq) // identical across runs
    val frac = s1.count().toDouble / d.count()
    assert(frac > 0.15 && frac < 0.35, s"expected ~0.25, got $frac")
  }

  test("train/eval split is disjoint and complete") {
    val d = Tables.load(spark, sf, "documents")
    val (train, eval) = Sampling.split(d, "doc_id", 64)
    assert(train.count() + eval.count() == d.count())
    assert(train.join(eval, "doc_id").count() == 0)
  }

  test("sample membership is stable under incremental growth") {
    val d = Tables.load(spark, sf, "documents")
    val early = Sampling.deterministicSample(d.filter($"doc_id" < 250), "doc_id", 64)
      .select("doc_id").as[Long].collect().toSet
    val full = Sampling.deterministicSample(d, "doc_id", 64)
      .select("doc_id").as[Long].collect().toSet
    assert(early.subsetOf(full)) // no membership churn as the corpus grows
  }

  test("schema validation accepts matching, rejects drifted frames (§1.6)") {
    val expected = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val ok = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("name", StringType, nullable = true))))
    graft.schema.Schemas.validate(ok, expected) // no throw
    val drifted = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true))))
    val e = intercept[IllegalArgumentException] {
      graft.schema.Schemas.validate(drifted, expected)
    }
    assert(e.getMessage.contains("id"))
  }

  test("UUID ingest gate passes canonical + null, raises on malformed (X5)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val good = Seq(
      Some("123e4567-e89b-12d3-a456-426614174000"),
      Some(graft.schema.Schemas.ZeroUuid),
      None).toDF("uuid")
    val gated = graft.schema.Schemas.rejectInvalidUuids(good, Seq("uuid"))
    assert(gated.count() == 3) // no throw; nulls flow to default repair
    val bad = Seq("not-a-uuid").toDF("uuid")
    val e = intercept[Exception] {
      graft.schema.Schemas.rejectInvalidUuids(bad, Seq("uuid"))
        .filter(col("uuid").isNotNull).count()
    }
    assert(e.getMessage != null)
  }

  test("boundedSample: identity under budget, ≈maxRows over budget, " +
      "membership independent of partitioning") {
    val ev = Tables.load(spark, sf, "events").select("event_id").persist()
    val n = ev.count()
    // under budget → the frame passes through unchanged
    assert(Sampling.boundedSample(ev, "event_id", n + 1, "s").count() == n)
    // over budget → concentrated near the target
    val target = 300L
    val s = Sampling.boundedSample(ev, "event_id", target, "s")
    val got = s.count()
    assert(got > 200 && got < 400, s"expected ≈$target of $n, got $got")
    // membership is a pure function of (key, seed): any partitioning,
    // same rows
    val reshaped = Sampling.boundedSample(ev.repartition(7), "event_id",
      target, "s").select("event_id").as[Long].collect().toSet
    val flat = s.select("event_id").as[Long].collect().toSet
    assert(flat == reshaped)
    // a different seed draws a different sample
    val other = Sampling.boundedSample(ev, "event_id", target, "other")
      .select("event_id").as[Long].collect().toSet
    assert(flat != other)
    ev.unpersist()
  }

  test("tokenBudgetSelect keeps the shuffled prefix within budget, is " +
      "replay-identical, and drops negative-token rows") {
    import org.apache.spark.sql.functions.col
    val rows = (1 to 50).map(i => (i.toLong, s"g${i % 2}", 10L)) :+
      ((99L, "g0", -5L)) // negative: filtered, never breaks monotonicity
    val df = rows.toDF("id", "g", "toks")
    val sel = Sampling.tokenBudgetSelect(df, "g", "id", "toks", 70L, "s1")
    val out = sel.select("g", "id", "cum_tokens")
      .as[(String, Long, Long)].collect()
    // 10-token docs into a 70 budget: exactly 7 per group, cum = 10..70
    assert(out.count(_._1 == "g0") == 7 && out.count(_._1 == "g1") == 7)
    assert(out.forall(_._3 <= 70L) && !out.exists(_._2 == 99L))
    val again = Sampling.tokenBudgetSelect(df, "g", "id", "toks", 70L, "s1")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == out.map(_._2).sorted.toSeq) // deterministic replay
    // a different seed picks a different prefix (same size here)
    val other = Sampling.tokenBudgetSelect(df, "g", "id", "toks", 70L, "s2")
      .select("id").as[Long].collect().sorted.toSeq
    assert(other != again, "independent seeds drew the same prefix")
    // an oversized doc at the cut is dropped, not truncated: budget 25
    // over 10-token docs keeps cum 10,20 — never a partial third
    val small = Sampling.tokenBudgetSelect(df.filter(col("toks") > 0),
      "g", "id", "toks", 25L, "s1")
    assert(small.groupBy("g").count().as[(String, Long)].collect()
      .forall(_._2 == 2L))
  }

  test("tokenBudgetSelect mega-group guard: a group past maxRowsPerGroup " +
      "fails loudly naming the offender; capPerGroup composition passes") {
    val rows = (1 to 200).map(i => (i.toLong, "hot", 10L)) ++
      (1 to 5).map(i => (1000L + i, "cold", 10L))
    val df = rows.toDF("id", "g", "toks")
    val ex = intercept[IllegalStateException] {
      Sampling.tokenBudgetSelect(df, "g", "id", "toks", 70L, "s1",
        maxRowsPerGroup = 100L)
    }
    assert(ex.getMessage.contains("hot") &&
      ex.getMessage.contains("capPerGroup"), ex.getMessage)
    // the documented composition: cap rows first, then budget — passes
    val capped = Sampling.capPerGroup(df, "id", "g", 100, "s1")
    val out = Sampling.tokenBudgetSelect(capped, "g", "id", "toks", 70L,
      "s1", maxRowsPerGroup = 100L)
    assert(out.count() > 0)
    // the top-order variant guards identically
    import org.apache.spark.sql.functions.col
    intercept[IllegalStateException] {
      Sampling.tokenBudgetSelectBy(df, "g", "toks", 70L,
        Seq(col("id")), maxRowsPerGroup = 100L)
    }
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val dir = tempDir("dup_events")
    val ev = Tables.load(spark, sf, "events").limit(100)
    ev.unionAll(ev).write.parquet(dir) // every event twice
    val stream = graft.streaming.EventStream.readEvents(spark, dir)
    val deduped = graft.streaming.EventStream.dedupedEvents(stream, "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 100)
    } finally q.stop()
  }
}
