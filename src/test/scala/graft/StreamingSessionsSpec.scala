package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.{Ev, Session}

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC
  private def ev(uid: Long, offsetMin: Long) = Ev(uid, new Timestamp(T0 + offsetMin * 60000))

  test("gap-closed sessions emit immediately; watermark timeout closes the tail") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingSessions.sessions(mem.toDS(), gapMs = 30 * 60000, watermarkDelay = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()

    // user 1: two events 10 min apart (one session), then a 2 h gap → new
    // session — the first closes as soon as the gap-crossing event arrives
    mem.addData(ev(1, 0), ev(1, 10), ev(1, 130), ev(2, 5))
    q.processAllAvailable()
    // far-future event pushes the watermark past every open timeout
    mem.addData(ev(99, 3000))
    q.processAllAvailable()
    mem.addData(ev(99, 6000)) // one more batch so timeouts fire
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out").as[Session].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
      .toSet
    // closed by gap: user1 [0,10] with 2 events
    assert(out.contains((1L, T0, T0 + 10 * 60000, 2L)))
    // closed by timeout: user1 [130,130], user2 [5,5]
    assert(out.contains((1L, T0 + 130 * 60000, T0 + 130 * 60000, 1L)))
    assert(out.contains((2L, T0 + 5 * 60000, T0 + 5 * 60000, 1L)))
  }

  test("incremental result matches the batch sessionizer on the same data") {
    val events = (0 until 500).map { i =>
      Ev(i % 7, new Timestamp(T0 + (i * 17 % 5000).toLong * 60000))
    }
    // batch path
    val batch = graft.operators.Sessions
      .sessionStats(events.toDF().withColumn("event_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
        gapMinutes = 30, tieBreak = "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    // streaming path (all data + a watermark-advancing tail, then timeouts)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingSessions.sessions(mem.toDS(), gapMs = 30 * 60000, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sessions_eq")
      .start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(Ev(999, new Timestamp(T0 + 100L * 86400000)))
    q.processAllAvailable()
    mem.addData(Ev(999, new Timestamp(T0 + 200L * 86400000)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessions_eq").as[Session].collect()
      .filter(_.user_id != 999)
      .groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }
}
