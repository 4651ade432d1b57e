package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming twins vs their batch forms, via MemoryStream. */
class EventStreamSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  private def ev(id: Long, user: Long, offsetMin: Long, tpe: String = "view",
      value: Double = 1.0): Event =
    Event(id, new Timestamp(t0 + offsetMin * 60000L), user, tpe, value, "{}")

  test("streaming sessionization closes sessions on watermark and matches batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val sessions = EventStream.sessionize(spark, input.toDF(), watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").start()
    try {
      // user 1: two sessions (gap 45 min > 30); user 2: one session
      input.addData(
        ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 55), ev(4, 1, 60),
        ev(5, 2, 5))
      q.processAllAvailable()
      // far-future event pushes the watermark past every timeout
      input.addData(ev(99, 9, 60 * 24))
      q.processAllAvailable()
      input.addData(ev(100, 9, 60 * 24 + 1))
      q.processAllAvailable()

      val out = spark.table("stream_sessions")
        .filter(col("user_id") =!= 9).cache()
      val batch = Events.sessionize(
        Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 55), ev(4, 1, 60), ev(5, 2, 5))
          .toDF())
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
      assert(out.count() == 3)
      val diff = out.select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .exceptAll(batch).count()
      assert(diff == 0, "streaming sessions differ from batch sessionization")
    } finally q.stop()
  }

  test("watermarked hourly counts emit closed windows matching batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val counts = EventStream.hourlyCounts(input.toDF(), watermark = "1 minute")
    val q = counts.writeStream.format("memory").queryName("stream_hourly")
      .outputMode("append").start()
    try {
      val batch1 = Seq(ev(1, 1, 0, "view"), ev(2, 1, 10, "view"), ev(3, 2, 20, "click"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(ev(9, 9, 60 * 5)) // push watermark past the 10:00 window
      q.processAllAvailable()
      input.addData(ev(10, 9, 60 * 5 + 1))
      q.processAllAvailable()

      val out = spark.table("stream_hourly").filter(col("hour_start") < "2024-01-01 11:00:00")
      val batch = Events.hourly(batch1.toDF())
        .select(col("hour_start"), col("event_type"), col("n_events"), col("sum_value"))
      assert(out.select("hour_start", "event_type", "n_events", "sum_value")
        .exceptAll(batch).count() == 0)
      assert(out.count() == 2) // view + click windows at 10:00
    } finally q.stop()
  }

  test("watermarked streaming dedup drops replayed event ids exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val deduped = EventStream.dedupEvents(input.toDF(), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1, 0), ev(2, 1, 1), ev(1, 1, 0)) // in-batch dup
      q.processAllAvailable()
      input.addData(ev(2, 1, 1), ev(3, 2, 2)) // cross-batch replay of id 2
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("event_id")
        .as[Long].collect().sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)))
    } finally q.stop()
  }
}
