package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling: one pass over the table producing per-column
  * completeness and cardinality stats in long format (column, n_rows,
  * n_nulls, n_distinct, min/max as strings). The ingest-time health
  * check the reference performs implicitly via NOT NULL + DEFAULT DDL;
  * here it is an explicit, queryable operator.
  *
  * Single aggregation job: all per-column expressions evaluate in one
  * scan (no per-column passes), then the wide row is unpivoted with
  * `stack` — at 100 TB this is exactly one read of the table.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.filter(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
        f.dataType.typeName == "timestamp")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1).otherwise(0)).as(s"${f.name}__nulls"),
        countDistinct(col(f.name)).as(s"${f.name}__distinct"),
        min(col(f.name)).cast("string").as(s"${f.name}__min"),
        max(col(f.name)).cast("string").as(s"${f.name}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(f =>
      s"'${f.name}', `${f.name}__nulls`, `${f.name}__distinct`, " +
        s"`${f.name}__min`, `${f.name}__max`").mkString(", ")
    wide.selectExpr("__n AS n_rows",
      s"stack(${cols.length}, $stackExpr) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
      .select("column_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value")
  }
}
