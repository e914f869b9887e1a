package graft.sources

import java.sql.SQLException
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Spark `JdbcDialect` for `jdbc:duckdb:` URLs — the engine's offline
  * PostgreSQL-family JDBC lane (the reference's federated source is
  * Postgres, v2/sql/create_external_tables.sql:14; DuckDB's SQL surface
  * is deliberately PG-flavored and its driver is public + in-process,
  * so it exercises the quoting/type/error conventions Derby cannot).
  *
  * Found by the round-14 dual-dialect test, not speculatively: Spark 4's
  * `JdbcUtils.tableExists` RETHROWS the probe's SQLException unless the
  * dialect's [[isObjectNotFoundException]] recognizes it — the generic
  * dialect matches on SQLState, which DuckDB's driver does not populate,
  * so every first `writeJdbc` to a fresh table aborted on its own
  * existence probe. Message-text matching on DuckDB's stable
  * `Catalog Error: … does not exist` shape is the fix the driver's
  * surface allows.
  *
  * Everything else stays on Spark's generic-SQL defaults on purpose:
  * DuckDB accepts the generic writer's type spellings (TEXT, DOUBLE
  * PRECISION, TIMESTAMP), and PG-style double-quote identifier quoting
  * is the generic default too.
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:duckdb")

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  /** DuckDB's JDBC driver leaves SQLState null; the message is the only
    * signal. Catalog-miss shapes: `Catalog Error: Table with name X does
    * not exist!` (also schemas/views). */
  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Catalog Error") &&
      (m.contains("does not exist") || m.contains("not found"))
  }

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  @volatile private var registered = false

  /** Idempotent registration with Spark's dialect registry (the
    * [[ClickHouseDialect.ensureRegistered]] pattern);
    * [[IO.readJdbc]]/[[IO.writeJdbc]] call it on matching URLs. */
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
