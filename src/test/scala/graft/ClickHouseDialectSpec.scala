package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.sources.{ClickHouseDdl, ClickHouseDialect}

/** ClickHouse connector: dialect type mapping both directions, URL
  * dispatch, and the DDL generator pinned TOKEN-FOR-TOKEN against the
  * reference's create_tables.sql for all three entities (tables,
  * Distributed companions, dictionaries). No live ClickHouse exists in
  * the harness — the statement runner is exercised against embedded
  * Derby (ClickHouse DDL itself obviously cannot run there; the Derby
  * case proves the plumbing), which the round's VERDICT explicitly
  * scoped as the testable surface.
  */
class ClickHouseDialectSpec extends SparkSpec {

  private val refSql = Paths.get(
    "/root/reference/upload_superset_logs_to_clickhouse_v2/sql/create_tables.sql")

  /** Whitespace-insensitive, punctuation-exact token stream: identifier
    * quoting, literals, commas and parens all survive as tokens. */
  private def tokens(s: String): Seq[String] =
    "[(),;]|[^\\s(),;]+".r.findAllIn(s).toSeq

  private def refTokens(fromMarker: String, toMarker: String): Seq[String] = {
    val text = new String(Files.readAllBytes(refSql), "UTF-8")
    val start = text.indexOf(fromMarker)
    val end = text.indexOf(toMarker, start)
    assert(start >= 0 && end > start, s"markers not found: $fromMarker")
    tokens(text.substring(start, end))
  }

  private val cluster = "{{ params.cluster }}"

  test("logs DDL (replicated + distributed) matches create_tables.sql " +
      "token for token") {
    assume(Files.exists(refSql), "reference checkout not present")
    val ours = tokens(
      ClickHouseDdl.createTableDdl(ClickHouseDdl.logsTable, Some(cluster))
        .mkString("\n"))
    val ref = refTokens("CREATE TABLE IF NOT EXISTS bi.f_superset_logs_replicated",
      "-- ab_user --")
    assert(ours == ref,
      s"logs DDL drifted:\nours: ${ours.mkString(" ")}\nref:  ${ref.mkString(" ")}")
  }

  test("ab_user DDL + dictionary match create_tables.sql token for token") {
    assume(Files.exists(refSql), "reference checkout not present")
    val t = ClickHouseDdl.abUserTable
    val ours = tokens(
      (ClickHouseDdl.createTableDdl(t, Some(cluster)) :+
        ClickHouseDdl.abUserDictionary(cluster)).mkString("\n"))
    val ref = refTokens("CREATE TABLE IF NOT EXISTS bi.f_superset_ab_user_replicated",
      "-- dashboards --")
    assert(ours == ref,
      s"ab_user DDL drifted:\nours: ${ours.mkString(" ")}\nref:  ${ref.mkString(" ")}")
  }

  test("dashboards DDL + dictionary match create_tables.sql token for " +
      "token (reference declaration order, uuid mid-list)") {
    assume(Files.exists(refSql), "reference checkout not present")
    val t = ClickHouseDdl.dashboardsTable
    val ours = tokens(
      (ClickHouseDdl.createTableDdl(t, Some(cluster)) :+
        ClickHouseDdl.dashboardsDictionary(cluster)).mkString("\n"))
    val text = new String(Files.readAllBytes(refSql), "UTF-8")
    val start = text.indexOf(
      "CREATE TABLE IF NOT EXISTS bi.f_superset_dashboards_replicated")
    assert(start >= 0)
    val ref = tokens(text.substring(start))
    assert(ours == ref,
      s"dashboards DDL drifted:\nours: ${ours.mkString(" ")}\nref:  ${ref.mkString(" ")}")
  }

  test("single-node mode: plain ReplacingMergeTree, no ON CLUSTER, no " +
      "Distributed companion — still Replacing (the dedup contract " +
      "lives in the engine choice)") {
    val ddl = ClickHouseDdl.createTableDdl(ClickHouseDdl.logsTable, None)
    assert(ddl.size == 1)
    assert(ddl.head.contains("ENGINE = ReplacingMergeTree"))
    assert(!ddl.head.contains("Replicated") && !ddl.head.contains("ON CLUSTER"))
    assert(ddl.head.contains("PARTITION BY date_trunc('month', dttm)"))
    assert(ddl.head.contains("ORDER BY user_id"))
  }

  test("dialect dispatch: clickhouse URLs only — Derby/Postgres stay on " +
      "their own dialects") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://ch:8123/bi"))
    assert(ClickHouseDialect.canHandle("JDBC:ClickHouse://x"))
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:graft"))
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://h/db"))
  }

  test("Spark→CH write types: native spellings, µs-preserving " +
      "timestamps, recursive arrays") {
    def ty(dt: DataType): String =
      ClickHouseDialect.getJDBCType(dt).get.databaseTypeDefinition
    assert(ty(StringType) == "String")
    assert(ty(IntegerType) == "Int32")
    assert(ty(LongType) == "Int64")
    assert(ty(BooleanType) == "Bool")
    assert(ty(DoubleType) == "Float64")
    assert(ty(TimestampType) == "DateTime64(6)") // µs, not DateTime's 1 s
    assert(ty(DateType) == "Date32")
    assert(ty(DecimalType(38, 12)) == "Decimal(38, 12)")
    assert(ty(ArrayType(FloatType)) == "Array(Float32)")
    assert(ClickHouseDialect.getJDBCType(MapType(StringType, StringType)).isEmpty)
  }

  test("CH→Catalyst read types: wrapper unwrapping, unsigned widening, " +
      "DateTime variants") {
    def cat(name: String): Option[DataType] =
      ClickHouseDialect.getCatalystType(java.sql.Types.OTHER, name, 0,
        new MetadataBuilder)
    assert(cat("String").contains(StringType))
    assert(cat("Nullable(Int32)").contains(IntegerType))
    assert(cat("LowCardinality(Nullable(String))").contains(StringType))
    assert(cat("UInt8").contains(ShortType))   // 0..255 needs > Byte
    assert(cat("UInt32").contains(LongType))   // needs > Int
    assert(cat("UInt64").contains(DecimalType(20, 0)))
    assert(cat("DateTime").contains(TimestampType))
    assert(cat("DateTime64(3)").contains(TimestampType))
    assert(cat("Date32").contains(DateType))
    assert(cat("Decimal(38, 12)").contains(DecimalType(38, 12)))
    assert(cat("FixedString(16)").contains(StringType))
    assert(cat("UUID").contains(StringType))
    assert(cat("SomeExoticType").isEmpty) // falls back to sqlType codes
  }

  test("identifier quoting and truncate semantics") {
    assert(ClickHouseDialect.quoteIdentifier("action") == "`action`")
    assert(ClickHouseDialect.quoteIdentifier("we`ird") == "`we``ird`")
    assert(ClickHouseDialect.getTruncateQuery("bi.t", Some(true)) ==
      "TRUNCATE TABLE bi.t")
    assert(ClickHouseDialect.isCascadingTruncateTable().contains(false))
  }

  test("registration is idempotent and leaves other dialects in place") {
    ClickHouseDialect.ensureRegistered()
    ClickHouseDialect.ensureRegistered() // second call: no-op
    // Derby round-trips still work after registration (JdbcSpec covers
    // the full path; this pins non-interference at the dispatch level)
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:graft"))
  }

  test("executeStatements runs multi-statement DDL scripts over plain " +
      "JDBC (Derby-backed — the hook's run() plumbing)") {
    val url = "jdbc:derby:memory:chddl;create=true"
    val props = new java.util.Properties
    ClickHouseDdl.executeStatements(url, props, Seq(
      """CREATE TABLE ch_probe (id INT NOT NULL, name VARCHAR(20));
        |INSERT INTO ch_probe VALUES (1, 'a;b');
        |INSERT INTO ch_probe VALUES (2, 'c')""".stripMargin))
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT count(*) FROM ch_probe")
      rs.next()
      assert(rs.getInt(1) == 2)
    } finally conn.close()
  }

  test("DDL guard: non-scalar Spark types are rejected with the survey " +
      "pointer") {
    val ex = intercept[IllegalArgumentException] {
      ClickHouseDdl.chType(ArrayType(IntegerType))
    }
    assert(ex.getMessage.contains("SURVEY"))
  }
}
