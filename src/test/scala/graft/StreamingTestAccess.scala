package graft.streaming

import org.apache.spark.sql.SparkSession

/** Test-only bridge to the `private[streaming]` commit-marker writer,
  * so crash-window specs can place the marker exactly where the sink
  * would — between "rows landed" and "batch done" — without widening
  * the production API.
  */
object StreamingTestAccess {
  def markCommitted(spark: SparkSession, targetPath: String,
                    batchId: Long): Unit =
    EventStream.markCommitted(spark, targetPath, batchId)
}
