package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import org.apache.spark.sql.Row

/** Streaming tier (SURVEY.md §2.10): the reference's daily watermark
  * batch is Structured Streaming's native model, so the incremental-load
  * pattern gets a streaming twin:
  *
  *   readStream(events) → withWatermark → windowed aggregation, and a
  *   foreachBatch sink that reuses the exact batch write path
  *   (IO.writeFact) — one code path for batch and streaming, the
  *   kappa-architecture shape.
  *
  * At scale the parquet directory source becomes Kafka/queue; everything
  * downstream of readStream is unchanged.
  */
object EventStream {

  /** Fixture `events` schema; ts declared µs-timestamp (the streaming
    * reader is pointed at re-written parquet, not the TIMESTAMP(NANOS)
    * originals — see graft.Tables.load).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Watermarked tumbling-window aggregate: events per (window, type)
    * with value sum — the streaming form of the monthly partition
    * aggregation. Late data beyond `lateness` is dropped by the
    * watermark, which also bounds state size (the 100 TB knob).
    */
  def windowedCounts(events: DataFrame, window_ : String,
                     lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))

  /** Streaming sink reusing the batch fact-write (foreachBatch = the
    * INSERT-SELECT of the reference, per micro-batch).
    *
    * foreachBatch is at-least-once: after a failure the engine re-executes
    * the last micro-batch with the SAME batchId. The sink uses that id as
    * an idempotence key — a commit marker (`_graft_commits/<batchId>`,
    * underscore-prefixed so Spark's file index ignores it) is written
    * after the data lands, and a replayed batch whose marker exists is
    * skipped, so re-execution appends nothing. The one remaining window —
    * a crash BETWEEN the data write and the marker — leaves that single
    * batch duplicated, as with any non-transactional append sink; readers
    * that must tolerate a crash inside that window dedup on event_id at
    * read (Relational.dedupLatest, the A4 path).
    *
    * SCOPE: markers are keyed by batchId within the target directory, so
    * a target must be paired with ONE streaming checkpoint for its
    * lifetime. Restarting with a NEW/lost checkpoint restarts batchIds
    * at 0 and the old markers would silently skip the new batches —
    * call [[resetCommits]] whenever the checkpoint is recreated (and
    * never point two different queries at one target).
    */
  def factSink(events: DataFrame, targetPath: String): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty && !isCommitted(batch.sparkSession, targetPath, batchId)) {
          graft.sources.IO.writeFact(batch, targetPath, "ts", "event_id",
            overwritePartitions = false)
          markCommitted(batch.sparkSession, targetPath, batchId)
        }
      }

  private def commitMarker(targetPath: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$targetPath/_graft_commits/$batchId")

  private def hadoopFs(spark: SparkSession, targetPath: String) =
    new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True if `batchId` already landed in `targetPath` (replay detection). */
  def isCommitted(spark: SparkSession, targetPath: String, batchId: Long): Boolean =
    hadoopFs(spark, targetPath).exists(commitMarker(targetPath, batchId))

  /** Clear all replay markers of `targetPath`. MUST be called when the
    * paired streaming checkpoint is deleted/recreated: the new query
    * restarts batchIds at 0 and stale markers would skip real batches.
    */
  def resetCommits(spark: SparkSession, targetPath: String): Unit =
    hadoopFs(spark, targetPath)
      .delete(new org.apache.hadoop.fs.Path(s"$targetPath/_graft_commits"), true)

  private[streaming] def markCommitted(spark: SparkSession, targetPath: String,
                                       batchId: Long): Unit = {
    val fs = hadoopFs(spark, targetPath)
    val out = fs.create(commitMarker(targetPath, batchId), true)
    try out.write(Array.emptyByteArray) finally out.close()
  }

  /** Run a memory-sink query to completion (local smoke path). */
  def runToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }

  /** Stream-static dictionary enrichment: the streaming twin of J1 —
    * each micro-batch joins against the broadcast dimension snapshot;
    * swapping the dimension DataFrame (DictionaryRefresh) between
    * restarts is the LIFETIME reload.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, factKey: String,
                   dimKey: String, dimCols: Seq[String]): DataFrame =
    graft.operators.Relational.enrich(events, dim, factKey, dimKey, dimCols)

  /** Streaming dedup by key within the watermark horizon: the streaming
    * twin of the A4 ReplacingMergeTree emulation. State holds one key
    * per event inside the watermark; older duplicates are dropped, state
    * beyond the horizon is evicted — the bounded-memory upsert at
    * 100 TB/day event rates.
    */
  def dedupedEvents(events: DataFrame, lateness: String): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicates("event_id")

  /** Stream-stream interval self-join: the streaming twin of
    * `Temporal.rangeJoin` — for each event, the same user's events in
    * the following `windowSec` seconds, as they arrive. Spark's native
    * stream-stream join; the watermark on BOTH sides plus the time-range
    * condition lets the engine evict join state older than
    * `lateness + windowSec`, so state stays bounded at any event rate —
    * the streaming analogue of the batch bin index.
    */
  def nextEventsWithin(events: DataFrame, lateness: String,
                       windowSec: Long): DataFrame = {
    val l = events.withWatermark("ts", lateness).alias("e")
    val r = events.withWatermark("ts", lateness).alias("f")
    l.join(r, expr(
      s"""e.user_id = f.user_id AND
         |f.ts > e.ts AND
         |f.ts <= e.ts + INTERVAL $windowSec SECONDS""".stripMargin))
      .select(col("e.event_id").as("event_id"),
        col("f.event_id").as("next_event_id"))
  }

  // --- custom state: user sessionization -------------------------------

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long,
                                sumValue: Double)

  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp,
                               n_events: Long, sum_value: Double)

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): per user, events within `gap` of the
    * previous one extend the session; a larger gap closes it and emits a
    * UserSession row. State size is one record per active user — the
    * bounded-state custom operator the reference's batch model cannot
    * express.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[Event],
                 gap: java.time.Duration):
      org.apache.spark.sql.Dataset[UserSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = gap.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var closed = List.empty[UserSession]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastSeen <= gapMs =>
                cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
                  sumValue = s.sumValue + e.value))
              case Some(s) =>
                closed ::= UserSession(userId,
                  new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.lastSeen), s.nEvents, s.sumValue)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }
}
