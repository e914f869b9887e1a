package graft

/** Idle-box micro-bench for the graph tier: times each graph query
  * (min-of-N, noop sink) and reports per-query shuffle-write / spill /
  * peak-exec-memory from a stage listener — the evidence harness for
  * iteration-loop plan changes (e.g. does pre-partitioning the edge
  * frame actually remove the per-iteration edge shuffle?). Findings
  * land in PLANS.md; this main is the reproducible source for them.
  *
  * Run: `sbt "runMain graft.GraphProbe"` (optionally
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY, SPARK_GRAFT_PASSES).
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    val spark = Sessions.local(32, "graph-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val metrics = new ScaleSweep.MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    def drain(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(500) }

    val names = Seq("graph_pagerank", "graph_pagerank_personalized",
      "graph_hits", "graph_triangles")
      .filter(n => only.forall(_.matches(n)))
    def once(name: String): (Double, Long, Long, Long) = {
      metrics.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (sec, metrics.shuffleWrite, metrics.spill, metrics.peak)
    }
    once(names.head) // JIT/codegen warm-up off the clock
    names.foreach { n =>
      val runs = (1 to passes).map(_ => once(n))
      val best = runs.minBy(_._1)
      println(f"PROBE $n sec=${best._1}%.2f " +
        f"shuffleMB=${best._2 / 1e6}%.1f spillMB=${best._3 / 1e6}%.1f " +
        f"peakExecMB=${best._4 / 1e6}%.1f")
    }
    spark.stop()
  }
}
