package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinned schemas + null-repair defaults for the three reference entities.
  *
  * The reference declares fixed DDL per table and repairs NULLs from the
  * nullable PostgreSQL source with sentinel defaults
  * (upload_superset_logs_to_clickhouse_v2/sql/create_tables.sql:4-13,26-39,
  * 72-88): strings -> 'undefined', FK ints -> -1, counters -> 0,
  * datetimes -> '1997-01-01', bools -> false, uuid -> all-zero UUID.
  * That default map is a semantic contract (SURVEY.md §1.4), so it lives
  * here once, next to the StructTypes, and is applied at ingest.
  */
object Schemas {

  val ZeroUuid = "00000000-0000-0000-0000-000000000000"
  val EpochDefault = "1997-01-01 00:00:00"

  /** logs fact table — create_tables.sql:2-17 (v2). */
  val logs: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("action", StringType, nullable = true),
    StructField("user_id", IntegerType, nullable = true),
    StructField("json", StringType, nullable = true),
    StructField("dttm", TimestampType, nullable = true),
    StructField("dashboard_id", IntegerType, nullable = true),
    StructField("slice_id", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true),
    StructField("referrer", StringType, nullable = true),
    // lineage literal injected at load (f_superset_logs_upload_data.sql:12)
    StructField("source", StringType, nullable = false)))

  /** ab_user dimension — create_tables.sql:24-42 (v2). */
  val abUser: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("username", StringType, nullable = false),
    StructField("password", StringType, nullable = true),
    StructField("active", BooleanType, nullable = true),
    StructField("email", StringType, nullable = false),
    StructField("last_login", TimestampType, nullable = true),
    StructField("login_count", IntegerType, nullable = true),
    StructField("fail_login_count", IntegerType, nullable = true),
    StructField("created_on", TimestampType, nullable = true),
    StructField("changed_on", TimestampType, nullable = true),
    StructField("created_by_fk", IntegerType, nullable = true),
    StructField("changed_by_fk", IntegerType, nullable = true)))

  /** dashboards dimension — create_tables.sql:70-91 (v2). */
  val dashboards: StructType = StructType(Seq(
    StructField("created_on", TimestampType, nullable = true),
    StructField("changed_on", TimestampType, nullable = true),
    StructField("id", IntegerType, nullable = false),
    StructField("dashboard_title", StringType, nullable = true),
    StructField("position_json", StringType, nullable = true),
    StructField("css", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("slug", StringType, nullable = true),
    StructField("json_metadata", StringType, nullable = true),
    StructField("published", BooleanType, nullable = true),
    StructField("created_by_fk", IntegerType, nullable = true),
    StructField("changed_by_fk", IntegerType, nullable = true),
    StructField("certified_by", StringType, nullable = true),
    StructField("certification_details", StringType, nullable = true),
    StructField("is_managed_externally", BooleanType, nullable = true),
    StructField("external_url", StringType, nullable = true),
    StructField("uuid", StringType, nullable = true)))

  /** Null-repair defaults per entity (create_tables.sql DEFAULT clauses). */
  val logsDefaults: Map[String, Any] = Map(
    "action" -> "undefined", "user_id" -> -1, "json" -> "undefined",
    "dashboard_id" -> -1, "slice_id" -> -1, "duration_ms" -> 0,
    "referrer" -> "undefined")

  val abUserDefaults: Map[String, Any] = Map(
    "password" -> "undefined", "active" -> false,
    "login_count" -> 0, "fail_login_count" -> 0,
    "created_by_fk" -> -1, "changed_by_fk" -> -1)

  val dashboardsDefaults: Map[String, Any] = Map(
    "dashboard_title" -> "undefined", "position_json" -> "undefined",
    "css" -> "undefined", "description" -> "undefined",
    "slug" -> "undefined", "json_metadata" -> "undefined",
    "published" -> false, "created_by_fk" -> -1, "changed_by_fk" -> -1,
    "certified_by" -> "undefined", "certification_details" -> "undefined",
    "is_managed_externally" -> false, "external_url" -> "undefined",
    "uuid" -> ZeroUuid)

  /** Timestamp columns default to '1997-01-01' (create_tables.sql:33,36,37,73);
    * na.fill does not take timestamps, so they are coalesced explicitly.
    */
  def fillTimestampDefaults(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(EpochDefault).cast("timestamp")))
    }

  /** UUID check expression (SURVEY.md §7.4): Spark has no UUID type, so
    * dashboards.uuid travels as a canonical 36-char string
    * (create_tables.sql:84); this predicate gates ingest.
    */
  def isValidUuid(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

  /** Ingest gate over UUID-typed string columns: a malformed non-null
    * value raises per-row (ANSI-style loud rejection) instead of landing
    * corrupt; NULLs pass through so the §1.4 default repair can fill
    * [[ZeroUuid]]. Pure codegen'd expression — no UDF, no extra scan.
    */
  def rejectInvalidUuids(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull || isValidUuid(col(c)), col(c))
          .otherwise(raise_error(concat(
            lit(s"invalid UUID in column '$c': "), col(c))).cast("string")))
    }

  /** Verify an ingested frame's schema against the pinned entity schema
    * (SURVEY.md §1.6: inferred == declared at ingest). Name order and
    * types must match; nullability may tighten (source nullable →
    * target not) but never loosen.
    */
  def validate(df: DataFrame, expected: StructType): Unit = {
    val got = df.schema
    val problems = scala.collection.mutable.Buffer[String]()
    if (got.fieldNames.toSeq != expected.fieldNames.toSeq)
      problems += s"column order/names: got ${got.fieldNames.mkString(",")}, " +
        s"expected ${expected.fieldNames.mkString(",")}"
    expected.fields.foreach { ef =>
      got.fields.find(_.name == ef.name).foreach { gf =>
        if (gf.dataType != ef.dataType)
          problems += s"${ef.name}: type ${gf.dataType.simpleString} != ${ef.dataType.simpleString}"
        if (gf.nullable && !ef.nullable)
          problems += s"${ef.name}: nullable column feeding non-nullable target"
      }
    }
    require(problems.isEmpty,
      s"schema drift vs declared entity:\n  ${problems.mkString("\n  ")}")
  }

  /** Apply an entity's default map (strings/ints/bools) — §1.4 repair. */
  def applyDefaults(df: DataFrame, defaults: Map[String, Any]): DataFrame = {
    val present = defaults.filter { case (k, _) => df.columns.contains(k) }
    val (bools, rest) = present.partition(_._2.isInstanceOf[Boolean])
    val filled = df.na.fill(rest.collect {
      case (k, v: String) => k -> (v: Any)
      case (k, v: Int)    => k -> (v: Any)
    })
    bools.foldLeft(filled) { case (d, (k, v: Boolean)) =>
      d.withColumn(k, coalesce(col(k), lit(v)))
    }
  }
}
