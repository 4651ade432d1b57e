package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the [[graft.ops.Events]] operators: the
  * same event schema consumed from a landing directory (file source =
  * exactly-once replayable, the streaming analogue of the reference's
  * checkpoint-ledger idempotency — /root/reference/src/extract_load_stocks.py:53-69),
  * with watermarked windowed aggregation and stateful sessionization.
  *
  * The reference's late-data policy is a 4-day reprocessing lookback
  * (/root/reference/dbt/stock_analytics/models/intermediate/int_russell3000__daily.sql:19-26);
  * [[DefaultWatermark]] encodes the same tolerance as an event-time
  * watermark, which is how Spark bounds state instead of re-merging.
  */
object EventStream {

  val DefaultWatermark = "4 days"
  val SessionGap = "30 minutes"

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

  case class SessionState(start: Long, end: Long, nEvents: Long, sumValue: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, sum_value: Double)

  /** File-source stream over a landing dir of JSON events (append-only;
    * Spark's file tracking gives exactly-once).
    */
  def readEvents(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(landingDir)

  /** Watermarked tumbling-window counts per event type — streaming twin of
    * [[graft.ops.Events.hourly]]; append-mode emits a window once the
    * watermark passes its end.
    */
  def hourlyCounts(events: DataFrame,
      watermark: String = DefaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked streaming deduplication: at-least-once transports (replayed
    * files, retried producers) become exactly-once by keying on event_id;
    * the watermark bounds the dedup state — an id older than the watermark
    * can be dropped from state because a duplicate that late would be
    * discarded anyway. Unbounded-state `dropDuplicates` without the
    * watermark is the classic streaming OOM.
    */
  def dedupEvents(events: DataFrame,
      watermark: String = DefaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful gap sessionization via flatMapGroupsWithState: state is one
    * open session per user, closed (emitted) when the event-time timeout
    * fires or a later-than-gap event arrives. Streaming twin of
    * [[graft.ops.Events.sessionize]].
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      watermark: String = DefaultWatermark): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = 30L * 60L * 1000L
    events.withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start),
              new Timestamp(s.end), s.nEvents, s.sumValue))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(s.copy(end = math.max(s.end, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.nEvents, s.sumValue)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
