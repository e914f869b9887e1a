package graft

import org.apache.spark.sql.functions._

import graft.api.Typed
import graft.pipeline.{Dag, IncrementalLoad}

class DagAndApiSpec extends SparkSpec {
  import spark.implicits._

  test("v2 DAG: parallel table loads + skippable retention (§2.12, F6)") {
    val events = Tables.load(spark, sf, "events")
    val cfg = IncrementalLoad.Config(
      keyCol = "event_id", tsCol = "ts", versionCol = "ts",
      projection = Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      sourceName = "superset")
    var retentionRan = false
    val loaded = Dag.runV2(spark,
      Seq(
        Dag.TableJob("a", events.filter($"event_id" % 2 === 0), tempDir("dag_a"), cfg),
        Dag.TableJob("b", events.filter($"event_id" % 2 === 1), tempDir("dag_b"), cfg)),
      retention = Some(() => retentionRan = true))
    assert(loaded("a") + loaded("b") == events.count())
    assert(retentionRan)
    // F6 skip: retention = None must not run anything
    val loaded2 = Dag.runV2(spark,
      Seq(Dag.TableJob("c", events.limit(10), tempDir("dag_c"), cfg)), None)
    assert(loaded2("c") == 10)
  }

  test("writeFact never touches session conf; concurrent dynamic " +
    "overwrites stay partition-scoped (M1 race fix)") {
    // pin the dangerous session default: if writeFact leaked its mode
    // into the session (the old bug), a concurrent Overwrite could run
    // in STATIC mode and delete every partition, not just the batch's
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      val events = Tables.load(spark, sf, "events") // all 2024-01
      val pathA = tempDir("conc_a")
      val pathB = tempDir("conc_b")
      // seed both targets with an older month that must SURVIVE the
      // dynamic overwrites of 2024-01 below
      val old = events.limit(50)
        .withColumn("ts", lit("2023-12-05 00:00:00").cast("timestamp"))
      graft.sources.IO.writeFact(old, pathA, "ts", "event_id",
        overwritePartitions = false)
      graft.sources.IO.writeFact(old, pathB, "ts", "event_id",
        overwritePartitions = false)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val writes = Seq(pathA, pathB).map { p =>
        Future(graft.sources.IO.writeFact(events, p, "ts", "event_id",
          overwritePartitions = true))
      }
      Await.result(Future.sequence(writes), Duration.Inf)
      // the session conf was never mutated by the overlapping writes
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        == "static")
      Seq(pathA, pathB).foreach { p =>
        val back = spark.read.parquet(p)
        assert(back.select("month").distinct().count() == 2,
          s"dynamic overwrite deleted the untouched 2023-12 partition at $p")
        assert(back.filter($"month" >= lit("2024-01-01").cast("timestamp"))
          .count() == events.count())
      }
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("two overlapping runV2 loads both land complete (shared session)") {
    val events = Tables.load(spark, sf, "events")
    val cfg = IncrementalLoad.Config(
      keyCol = "event_id", tsCol = "ts", versionCol = "ts",
      projection = Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      sourceName = "superset", monthTruncatedWatermark = true)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val targets = (1 to 4).map(i => tempDir(s"ov_$i"))
    // two whole DAG runs in flight at once, each fanning out 2 table
    // loads — 4 month-overwrite writes interleaving on one session
    val dags = Seq(
      Future(Dag.runV2(spark, Seq(
        Dag.TableJob("t1", events.filter($"event_id" % 2 === 0), targets(0), cfg),
        Dag.TableJob("t2", events.filter($"event_id" % 2 === 1), targets(1), cfg)))),
      Future(Dag.runV2(spark, Seq(
        Dag.TableJob("t3", events.filter($"event_id" % 3 === 0), targets(2), cfg),
        Dag.TableJob("t4", events.filter($"event_id" % 3 =!= 0), targets(3), cfg)))))
    val res = Await.result(Future.sequence(dags), Duration.Inf)
    assert(res(0)("t1") + res(0)("t2") == events.count())
    assert(res(1)("t3") + res(1)("t4") == events.count())
    assert(spark.read.parquet(targets(0)).count() +
      spark.read.parquet(targets(1)).count() == events.count())
    assert(spark.read.parquet(targets(2)).count() +
      spark.read.parquet(targets(3)).count() == events.count())
  }

  test("typed LogEvent dataset round-trips through the schema (§7.1 edges)") {
    val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val rows = Seq(
      Typed.LogEvent(1, Some("view"), Some(7), Some("{}"), Some(ts),
        Some(3), None, Some(120), None, "superset"),
      Typed.LogEvent(2, None, None, None, Some(ts), None, None, None, None,
        "superset_old"))
    val ds = spark.createDataset(rows)(Typed.logEventEncoder)
    assert(ds.schema.fieldNames.toSeq == graft.schema.Schemas.logs.fieldNames.toSeq)
    val repaired = graft.schema.Schemas.applyDefaults(ds.toDF(),
      graft.schema.Schemas.logsDefaults)
    val back = Typed.logEvents(repaired).collect()
    assert(back.forall(_.action.isDefined))
    assert(back.find(_.id == 2).get.user_id.contains(-1))
  }

  test("local row interchange round-trips (S8/S9)") {
    val df = Tables.load(spark, sf, "nation")
    val rows = graft.sources.IO.toLocalRows(df)
    val back = graft.sources.IO.fromLocalRows(spark, rows, df.schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("script runner handles CREATE TABLE / DROP TABLE DDL (S11/M3)") {
    val wh = tempDir("wh")
    graft.sources.IO.runScript(spark,
      s"""CREATE TABLE IF NOT EXISTS graft_ddl_t (id INT, name STRING)
         |  USING parquet LOCATION '$wh/graft_ddl_t';
         |INSERT INTO graft_ddl_t VALUES (1, 'a'), (2, 'b');
         |""".stripMargin)
    assert(spark.table("graft_ddl_t").count() == 2)
    graft.sources.IO.runScript(spark, "DROP TABLE IF EXISTS graft_ddl_t;")
    assert(!spark.catalog.tableExists("graft_ddl_t"))
  }
}
