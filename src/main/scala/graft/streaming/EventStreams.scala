package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming workload over the events table: watermarked
  * tumbling/sliding windows and a custom stateful sessionizer.
  *
  * The transforms are stream/batch agnostic (pure Dataset functions) —
  * the same code runs under readStream with a checkpoint or as a batch
  * job, which is how the batch twins in ExtQueries (w01..w03) stay
  * verifiable against the DuckDB oracle while this module carries the
  * streaming semantics (watermarks, state, output modes).
  */
/** GroupState buffer for [[EventStreams.sessionize]]: one not-yet-final
  * session interval with its running aggregates. Top-level (not nested
  * private) because Spark's state-encoder codegen emits Java that calls
  * the accessors directly — Janino can't compile references to a
  * private nested class.
  */
case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)

object EventStreams {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n: Long, sum_value: Double)

  /** Streaming read of the events table (sfDir/events.parquet),
    * normalizing the TIMESTAMP(NANOS) column exactly like
    * graft.core.Tables.load.
    */
  def readStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    // file source wants a directory; glob-filter to the events table
    spark.readStream.schema(batch.schema).format("parquet")
      .option("pathGlobFilter", "events.parquet").load(sfDir)
      .withColumn("ts", graft.core.Tables.normalizedTs(batch))
  }

  /** Watermarked tumbling-window counts (w01's streaming form). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming exact dedup (the K2/K3 primary-key semantics at stream
    * level): watermarked dropDuplicatesWithinWatermark on the key, so
    * re-delivered events inside the lateness window are discarded with
    * bounded state — the scalable replacement for a database unique
    * constraint at ingest time.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: purchases matched to clicks of the
    * same user within the preceding attribution window. Both sides are
    * watermarked so the join state is bounded — Spark drops click state
    * older than the watermark + interval. The same transform runs in
    * batch for oracle-style verification.
    */
  def attributionJoin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "0 seconds")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
      col("click_ts") <= col("purchase_ts") &&
      col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Custom sessionization via flatMapGroupsWithState: the operator
    * session_window can't express (per-event custom state, emit on gap).
    *
    * Batch input: every group sees all its events once; all sessions
    * are merged and emitted directly.
    *
    * Streaming input: the state is the LIST of sessions whose gap
    * expiry the watermark has not yet passed. Each micro-batch merges
    * the new events into that list as intervals — a late event that
    * falls within the gap of an existing session extends it (possibly
    * backwards, start = min), a late event more than a gap before a
    * session's start opens a separate earlier session, and a bridging
    * event fuses two sessions. A session is emitted only once the
    * watermark passes its end + gap (so no admissible event can still
    * extend or fuse it); groups receiving no events finalize through an
    * event-time timeout. Emitting eagerly per micro-batch would produce
    * premature/split duplicate sessions in Append mode.
    *
    * @param watermarkDelay lateness bound for the streaming path (also
    *        controls when gap timeouts fire); ignored in batch.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    // java.sql.Timestamp.getTime is millisecond-truncated; the events
    // table is microsecond-precision, so convert through Instant.
    def toUs(t: Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def fromUs(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

    def finishSession(userId: Long, s: SessionState): Session =
      Session(userId, fromUs(s.startUs), fromUs(s.lastUs + gapUs), s.n, s.sum)

    // Interval-merge new events into the carried session list. Sorting
    // by start and sweeping reproduces the batch gap rule (new session
    // iff ts - prev >= gap) and handles out-of-order arrivals: an event
    // merges into a session iff it lies within gap of the session's
    // interval, else it seeds its own session.
    def mergeSessions(carried: List[SessionState], evs: Iterator[Event])
        : List[SessionState] = {
      val singles = evs.map(e => SessionState(toUs(e.ts), toUs(e.ts), 1L, e.value))
      (carried ++ singles).sortBy(s => (s.startUs, s.lastUs))
        .foldLeft(List.empty[SessionState]) {
          case (cur :: done, s) if s.startUs - cur.lastUs < gapUs =>
            SessionState(cur.startUs, math.max(cur.lastUs, s.lastUs),
              cur.n + s.n, cur.sum + s.sum) :: done
          case (acc, s) => s :: acc
        }.reverse
    }

    if (!events.isStreaming) {
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[List[SessionState], Session](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (userId: Long, evs: Iterator[Event], state: GroupState[List[SessionState]]) =>
            mergeSessions(Nil, evs).map(finishSession(userId, _)).iterator
        }
    } else {
      events.withWatermark("ts", watermarkDelay)
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[List[SessionState], Session](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (userId: Long, evs: Iterator[Event], state: GroupState[List[SessionState]]) =>
            val carried = state.getOption.getOrElse(Nil)
            val merged =
              if (state.hasTimedOut) carried else mergeSessions(carried, evs)
            // A session is final once the watermark passes its gap
            // expiry: any event that could still extend/fuse it would
            // be older than the watermark and thus dropped.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (closed, open) = merged.partition(s => s.lastUs + gapUs <= wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              // fire when the earliest remaining gap elapses in event
              // time (ceil to ms so the session is final at fire time;
              // clamped above the current watermark, as the API requires)
              val nextFireMs = Math.floorDiv(
                open.map(s => s.lastUs + gapUs).min + 999L, 1000L)
              state.setTimeoutTimestamp(
                math.max(nextFireMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.map(finishSession(userId, _)).iterator
        }
    }
  }
}
