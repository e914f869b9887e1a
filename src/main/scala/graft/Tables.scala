package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table access (TESTDATA.md). Every `SparkEntry.queries` entry
  * receives a scale-factor directory and reads one parquet per table, the
  * same files the DuckDB oracle sees.
  *
  * At 100 TB these would be month-partitioned parquet/lake tables; the
  * single-file layout is the test harness's, not the engine's. All engine
  * operators take plain DataFrames so the source layout is orthogonal.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. They are read as nanos-since-epoch longs
    * (legacy conf) and converted to microsecond timestamps — the fixture
    * values are µs-precision, and DuckDB (the oracle) also truncates
    * nanos to its µs timestamps, so parity is exact.
    */
  private val nanosCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        // `div` = integer division: raw nanos exceed double precision (2^53)
        d.withColumn(c, expr(s"timestamp_micros(CAST($c div 1000 AS BIGINT))"))
      else d
    }
  }
}
