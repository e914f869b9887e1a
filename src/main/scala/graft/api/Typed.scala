package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed Dataset edges for the three reference entities (SURVEY.md §7.1:
  * `DataFrame`-first internally, `Dataset[T]` at API boundaries where
  * compile-time field checks help callers). Field names/nullability
  * mirror FIXTURES.md §A; `Option` encodes source-side nullability —
  * after Schemas.applyDefaults the options are always populated.
  */
object Typed {

  /** logs fact (create_tables.sql:2-17). */
  final case class LogEvent(
      id: Int, action: Option[String], user_id: Option[Int],
      json: Option[String], dttm: Option[Timestamp],
      dashboard_id: Option[Int], slice_id: Option[Int],
      duration_ms: Option[Int], referrer: Option[String], source: String)

  /** ab_user dimension (create_tables.sql:24-42). */
  final case class AbUser(
      id: Int, first_name: String, last_name: String, username: String,
      password: Option[String], active: Option[Boolean], email: String,
      last_login: Option[Timestamp], login_count: Option[Int],
      fail_login_count: Option[Int], created_on: Option[Timestamp],
      changed_on: Option[Timestamp], created_by_fk: Option[Int],
      changed_by_fk: Option[Int])

  /** dashboards dimension (create_tables.sql:70-91). */
  final case class Dashboard(
      created_on: Option[Timestamp], changed_on: Option[Timestamp],
      id: Int, dashboard_title: Option[String],
      position_json: Option[String], css: Option[String],
      description: Option[String], slug: Option[String],
      json_metadata: Option[String], published: Option[Boolean],
      created_by_fk: Option[Int], changed_by_fk: Option[Int],
      certified_by: Option[String], certification_details: Option[String],
      is_managed_externally: Option[Boolean], external_url: Option[String],
      uuid: Option[String])

  implicit val logEventEncoder: Encoder[LogEvent] = Encoders.product[LogEvent]
  implicit val abUserEncoder: Encoder[AbUser] = Encoders.product[AbUser]
  implicit val dashboardEncoder: Encoder[Dashboard] = Encoders.product[Dashboard]

  def logEvents(df: DataFrame): Dataset[LogEvent] = df.as[LogEvent]
  def abUsers(df: DataFrame): Dataset[AbUser] = df.as[AbUser]
  def dashboards(df: DataFrame): Dataset[Dashboard] = df.as[Dashboard]
}
