package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.EventStreams

class EventStreamsSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("streaming tumbling-window counts equal the batch result") {
    import spark.implicits._
    val stream = EventStreams.readStream(spark, sf)
      .filter(col("event_id").isNotNull) // touch schema early
    val agg = EventStreams.tumblingCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .select(col("window_start"), col("event_type"), col("n"))
    val batch = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
  }

  test("streaming dedup discards re-delivered events within the watermark") {
    // duplicate the stream source: every event delivered twice
    val once = EventStreams.readStream(spark, sf)
    val dup = once.union(once)
    val deduped = EventStreams.dedupStream(dup, Seq("event_id"))
      .groupBy().count()
    val q = deduped.writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("dedup_out").collect().head.getLong(0)
    val expected = Tables.load(spark, sf, "events").count()
    assert(n == expected, s"expected $expected unique events, got $n")
  }

  test("stream-stream interval join equals its batch twin") {
    val streaming = EventStreams.attributionJoin(
      EventStreams.readStream(spark, sf), windowMinutes = 30)
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attr_out")

    val batch = EventStreams.attributionJoin(
      Tables.load(spark, sf, "events"), windowMinutes = 30)
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
  }

  test("streaming sessionizer emits on gap expiry, never splits across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMinutes = 10,
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream_out").start()
    def ev(u: Long, min: Long) = EventStreams.Event(u, new Timestamp(min * 60000L), 1.0)
    // minute 0 would equal the initial watermark and be dropped by
    // Spark's (boundary-inclusive) late-input filter — start at 1
    try {
      input.addData(ev(1, 1), ev(1, 6))
      q.processAllAvailable()
      // the session is still open — nothing may be emitted yet (the old
      // behavior emitted a premature [1,16) session here)
      assert(spark.table("sess_stream_out").count() == 0)
      input.addData(ev(1, 9), ev(1, 61)) // 9 extends the open session; 61 closes it
      q.processAllAvailable()
      input.addData(ev(1, 121)) // closes the 61-session
      q.processAllAvailable()
      input.addData(ev(2, 501)) // watermark -> 501min; 121-session times out
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess_stream_out")
      .orderBy("session_start").collect()
    // user 2's session at 501 is still open -> not emitted
    assert(rows.length == 3, rows.mkString("; "))
    // one UNSPLIT session covering both micro-batches: [1, 9+gap), n=3
    assert(rows(0).getAs[Long]("n") == 3)
    assert(rows(0).getAs[Timestamp]("session_start").getTime == 1 * 60000L)
    assert(rows(0).getAs[Timestamp]("session_end").getTime == 19 * 60000L)
    assert(rows(1).getAs[Long]("n") == 1)
    assert(rows(2).getAs[Long]("n") == 1)
  }

  test("streaming sessionizer handles watermark-admitted out-of-order events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMinutes = 10,
      watermarkDelay = "2 hours")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_out").start()
    def ev(u: Long, min: Long) = EventStreams.Event(u, new Timestamp(min * 60000L), 1.0)
    try {
      input.addData(ev(1, 100), ev(1, 105))
      q.processAllAvailable()
      // late arrivals admitted by the 2h watermark: 98 is within the gap
      // of the [100,105] session and must extend it BACKWARDS; 50 is
      // more than a gap earlier and must open a separate earlier session
      // (the old fold merged it and dragged session_end back to 50+gap)
      input.addData(ev(1, 50), ev(1, 98))
      q.processAllAvailable()
      input.addData(ev(1, 300)) // watermark -> 180min: both old sessions final
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess_ooo_out").orderBy("session_start").collect()
    assert(rows.length == 2, rows.mkString("; "))
    assert(rows(0).getAs[Timestamp]("session_start").getTime == 50 * 60000L)
    assert(rows(0).getAs[Timestamp]("session_end").getTime == 60 * 60000L)
    assert(rows(0).getAs[Long]("n") == 1)
    assert(rows(1).getAs[Timestamp]("session_start").getTime == 98 * 60000L)
    assert(rows(1).getAs[Timestamp]("session_end").getTime == 115 * 60000L)
    assert(rows(1).getAs[Long]("n") == 3)
  }

  test("flatMapGroupsWithState sessionizer matches session_window (batch)") {
    import spark.implicits._
    val events = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventStreams.Event]
    val custom = EventStreams.sessionize(events, gapMinutes = 10)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n"))
    val builtin = Tables.load(spark, sf, "events")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))
    assert(custom.exceptAll(builtin).count() == 0,
      custom.exceptAll(builtin).limit(5).collect().mkString("; "))
    assert(builtin.exceptAll(custom).count() == 0)
    assert(custom.count() > 0)
  }
}
