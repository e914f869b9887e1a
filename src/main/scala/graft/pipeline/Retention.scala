package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.IO

/** M2: source retention (reference v2/dag:132-141 —
  * `DELETE FROM public.logs WHERE dttm < DATE_TRUNC('MONTH', NOW() -
  * INTERVAL '30 MONTH')`), in two forms.
  */
object Retention {

  /** Lake-table form: filtered rewrite of only the months that fall
    * behind the horizon — partition pruning keeps the untouched months
    * unread; dynamic overwrite would rewrite only affected partitions.
    * Here the whole retained set is rewritten because retention by
    * definition touches the oldest partitions wholesale.
    */
  def rewrite(spark: SparkSession, path: String, tsCol: String,
              keyCol: String, months: Int,
              anchor: java.sql.Timestamp): DataFrame = {
    val df = spark.read.parquet(path).drop("month")
    val kept = Relational.applyRetention(df, tsCol,
      lit(anchor.toString).cast("timestamp"), months)
    val tmp = path + "__retained"
    IO.writeFact(kept, tmp, tsCol, keyCol, overwritePartitions = false)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    spark.read.parquet(path)
  }

  /** JDBC form: the reference's literal behavior — a driver-side DELETE
    * against the source database. Deliberately outside the DataFrame API
    * (SURVEY.md §7.4): an imperative utility isolated here so the
    * relational core stays pure. Uses plain java.sql so any JDBC source
    * works; the SQL text matches the reference's shape.
    */
  def jdbcDelete(url: String, props: java.util.Properties, table: String,
                 tsCol: String, months: Int): Int = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val stmt = conn.createStatement()
      try stmt.executeUpdate(
        s"DELETE FROM $table WHERE $tsCol < DATE_TRUNC('MONTH', NOW() - INTERVAL '$months MONTH')")
      finally stmt.close()
    } finally conn.close()
  }
}
