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
