package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming transforms over the `events` stream shape
  * (`event_id, ts, user_id, event_type, value` — TESTDATA.md): watermarked
  * windowed aggregation and custom sessionization state. These are the
  * stream-native counterparts of the batch operators — the same DataFrame
  * code runs on a `readStream` source, which is the point of building on
  * Structured Streaming rather than hand-rolled micro-batching.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped and its state evicted); sessionization
  * state is per-user and evicted on timeout — both shuffle once on the
  * grouping key and then update state in place, the streaming analog of a
  * partial-agg shuffle.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Internal session accumulator (public: encoder-generated code must be
    * able to reach the accessors). */
  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Tumbling-window counts per event type with a watermark: late rows
    * beyond `watermarkDelay` are dropped, and window state older than the
    * watermark is evicted (bounded state — the thing that makes this run
    * forever on an unbounded stream). */
  def windowedCounts(events: DataFrame, windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Stream-stream interval join (click→conversion attribution): inner
    * join of two event-time streams on user with `r_ts` in
    * `[l_ts, l_ts + joinWindow]`. Both sides carry watermarks, and Spark
    * derives the state watermark from the interval condition, so each
    * side's buffer evicts a row as soon as no future partner could match
    * it — bounded state on unbounded streams. Inner-join emission is
    * match-time (no timeout flushing involved), so the result set is
    * complete regardless of watermark: eviction only ever drops rows
    * whose match window has provably passed. */
  def intervalJoin(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase", joinWindow: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermarkDelay)
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", watermarkDelay)
    // leftOuter/fullOuter add the deferred-null semantic: an unmatched
    // row emits with a null partner only once the watermark proves no
    // partner can still arrive — the state-eviction moment doubles as
    // the emission trigger. The user column coalesces across sides so
    // right-only rows (fullOuter) still carry their user.
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $joinWindow"),
      joinType)
      .select(col("l_id"), col("r_id"),
        coalesce(col("user_id"), col("r_user")).as("user_id"),
        unix_micros(col("l_ts")).as("l_ts_us"),
        unix_micros(col("r_ts")).as("r_ts_us"))
  }

  /** Full-microsecond epoch value of a Timestamp: `getTime` alone
    * truncates to ms, silently shifting session bounds on µs-resolution
    * sources (parquet event time is µs). */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  /** Timestamp from epoch µs, sub-ms preserved (the `new Timestamp(ms)`
    * constructor cannot carry it; `setNanos` replaces the full sub-second
    * field, so seed the constructor with whole seconds only). */
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp((us / 1000000L) * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when `gapMs` of event time passes with no event for that user —
    * either detected inline by the next event, or flushed by an event-time
    * timeout once the watermark passes session_end + gap. (Event-time, not
    * processing-time, timeouts: processing-time timeouts make the engine
    * schedule batches forever even with no data.) Emits a row per closed
    * session. State timestamps are epoch µs end to end — the session
    * bounds must round-trip a µs-resolution source bit-exactly (pinned by
    * the `stream_sessions_oracled` replay). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, microsTs(s.start),
              microsTs(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, microsTs(s.start),
                    microsTs(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush once event time moves gapMs past the last event; the
              // timeout API is ms-granular, so round UP (truncating could
              // fire a hair before last + gap) and stay ahead of the
              // current watermark
              val target = (s.last + gapUs + 999L) / 1000L
              val floor = state.getCurrentWatermarkMs() + 1
              state.setTimeoutTimestamp(math.max(target, floor))
            }
            closed.reverseIterator
          }
      }
  }
}
