package graft

import java.sql.DriverManager
import java.util.Properties

/** S1: federated JDBC scan, demonstrated against embedded Derby (the
  * only RDBMS on the offline classpath). The partitioned read is the
  * engine's replacement for the reference's manual id%2 two-connection
  * fan-out (v1/dag:116-125).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      "CREATE TABLE logs (id INT NOT NULL, action VARCHAR(32), user_id INT)")
    (0 until 100).foreach { i =>
      st.executeUpdate(
        s"INSERT INTO logs VALUES ($i, 'act_${i % 5}', ${i % 10})")
    }
    st.close(); conn.close()
  }

  test("partitioned JDBC read covers all rows across stripes (S1/F4)") {
    seeded
    val df = graft.sources.IO.readJdbc(spark, url, "logs",
      partitionColumn = "id", lowerBound = 0, upperBound = 100,
      numPartitions = 2, props = new Properties())
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head()
      == (0 until 100).sum)
  }

  test("filters push into the remote query (predicate pushdown)") {
    seeded
    val df = graft.sources.IO.readJdbc(spark, url, "logs",
      "id", 0, 100, 2, new Properties())
      .filter($"user_id" === 3)
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("USER_ID"),
      s"expected pushed filter in:\n$plan")
  }
}
