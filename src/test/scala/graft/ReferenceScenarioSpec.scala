package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.pipeline.{DictionaryRefresh, IncrementalLoad, Retention}
import graft.schema.Schemas

/** The reference's own scenario end-to-end (FIXTURES.md §A.4): two
  * Superset source generations feeding one logs table, nullable source
  * columns repaired by defaults, slowly-changing ab_user deduped to the
  * latest changed_on, dictionary enrichment, multi-month partitions,
  * 30-month retention. This is the fidelity test for SURVEY.md §3.2's
  * whole pipeline on reference-shaped data.
  */
class ReferenceScenarioSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // --- reference-shaped sources ---------------------------------------

  /** logs source rows: (id, action, user_id, dttm) with NULLs in every
    * nullable column somewhere; dttm spans 2021-06 (beyond retention),
    * 2023-11, 2023-12, 2024-01.
    */
  private def logsGen(rows: Seq[(Int, Option[String], Option[Int], String)]) =
    rows.map { case (id, action, uid, d) =>
      (id, action.orNull, uid.map(Integer.valueOf).orNull, ts(s"$d 12:00:00"))
    }.toDF("id", "action", "user_id", "dttm")

  private lazy val gen1 = logsGen(Seq(
    (1, Some("view"), Some(10), "2021-06-15"),   // older than retention
    (2, Some("view"), Some(10), "2023-11-02"),
    (3, None, Some(11), "2023-12-05"),           // null action
    (4, Some("edit"), None, "2023-12-20"),       // null user_id
    (5, Some("view"), Some(12), "2024-01-03")))

  private lazy val gen2 = logsGen(Seq(
    (5, Some("view"), Some(12), "2024-01-03"),   // replayed row (dedup)
    (6, Some("edit"), Some(10), "2024-01-10"),
    (7, None, None, "2024-01-15")))              // all nullables null

  /** ab_user: id 2 updated (SCD) — latest changed_on must win. */
  private lazy val abUsers = Seq(
    (10, "alice", ts("2023-01-01 00:00:00")),
    (11, "bob", ts("2023-01-01 00:00:00")),
    (12, "carol-old", ts("2023-01-01 00:00:00")),
    (12, "carol-new", ts("2023-06-01 00:00:00")))
    .toDF("id", "username", "changed_on")

  test("two-generation logs pipeline: defaults, dedup, partitions, enrichment, retention") {
    val path = tempDir("ref_logs")
    val cfg = IncrementalLoad.Config(
      keyCol = "id", tsCol = "dttm", versionCol = "dttm",
      projection = Seq("id", "action", "user_id", "dttm"),
      sourceName = "superset_old",
      defaults = Map("action" -> "undefined", "user_id" -> -1))

    // generation 1, cold start (epoch watermark loads everything)
    IncrementalLoad.run(spark, gen1, path, cfg)
    // generation 2 under the new lineage name; strict watermark skips
    // already-loaded rows (including the replayed id=5)
    IncrementalLoad.run(spark, gen2, path, cfg.copy(sourceName = "superset"))

    val target = IncrementalLoad.readDeduped(spark, path, "id", "dttm")

    // each id exactly once; the replayed id=5 kept its original lineage
    assert(target.count() == 7)
    assert(target.filter($"id" === 5).select("source").as[String].head()
      == "superset_old")

    // §1.4 defaults repaired NULLs
    assert(target.filter($"action".isNull || $"user_id".isNull).count() == 0)
    assert(target.filter($"id" === 7)
      .select("action", "user_id").as[(String, Int)].head() == ("undefined", -1))

    // month partition layout covers all four months
    val months = graft.sources.IO.listMonthPartitions(spark, path)
    assert(months.size == 4, s"got $months")

    // dictionary enrichment: dedup ab_user to latest, broadcast join
    val dict = new DictionaryRefresh(
      () => Relational.dedupLatest(abUsers, Seq("id"), "changed_on"),
      ttlMillis = 43200L * 1000)
    val enriched = Relational.enrich(target, dict.get(), "user_id", "id",
      Seq("username"))
      .select($"id", coalesce($"username", lit("undefined")).as("username"))
    val byId = enriched.as[(Int, String)].collect().toMap
    assert(byId(5) == "carol-new")        // SCD: latest changed_on won
    assert(byId(4) == "undefined")        // user_id = -1 → repaired label
    assert(byId(2) == "alice")

    // retention: 30 months before 2024-02-01 → horizon 2021-08-01;
    // the 2021-06 row (id=1) is pruned, everything else stays
    val kept = Retention.rewrite(spark, path, "dttm", "id", 30,
      ts("2024-02-01 00:00:00"))
    assert(kept.count() == 6)
    assert(kept.filter($"id" === 1).count() == 0)

    // idempotence: re-running generation 2 changes nothing
    IncrementalLoad.run(spark, gen2, path, cfg.copy(sourceName = "superset"))
    assert(IncrementalLoad.readDeduped(spark, path, "id", "dttm").count() == 6)
  }

  test("accepted attribution drift scenario: old/new dictionaries disagree on shared ids") {
    // v2/README:38-41 — when old+new Superset share dictionary ids, some
    // events attribute to the wrong dimension row. The engine's answer:
    // lineage-scoped enrichment (join on (source, id)) removes the drift.
    val dimOld = Seq((1, "old-dash")).toDF("id", "title")
      .withColumn("source", lit("superset_old"))
    val dimNew = Seq((1, "new-dash")).toDF("id", "title")
      .withColumn("source", lit("superset"))
    val dims = dimOld.unionByName(dimNew)
    val facts = Seq((100, 1, "superset_old"), (101, 1, "superset"))
      .toDF("event", "dashboard_id", "source")
    val attributed = facts.join(broadcast(dims),
      facts("dashboard_id") === dims("id") &&
        facts("source") === dims("source"))
      .select($"event", $"title").as[(Int, String)].collect().toMap
    assert(attributed(100) == "old-dash" && attributed(101) == "new-dash")
  }
}
