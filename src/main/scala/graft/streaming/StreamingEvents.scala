package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event input for the stateful sessionizer: `ts_us` is event time in
  * microseconds since epoch, `cv` the exact centi-value (see
  * Events.centiValue).
  */
case class SessionEvent(user_id: Long, ts_us: Long, cv: Long)

/** Per-user open-session state: the running session plus the id the
  * NEXT closed session will take (so streaming session ids reproduce
  * the batch q37 numbering exactly).
  */
case class UserSessionState(
    nextId: Long,
    startUs: Long,
    endUs: Long,
    n: Long,
    cvSum: Long
)

/** One closed session — schema-aligned with batch Events.sessionStats. */
case class SessionRow(
    user_id: Long,
    session_id: Long,
    n_events: Long,
    session_start_us: Long,
    session_end_us: Long,
    total_value: Double,
    duration_s: Long
)

/** Structured-streaming twins of the batch events operators
  * (SURVEY §2.F "StreamingSpec"). Same arithmetic as graft.streaming
  * .Events so a user can run the identical pipeline in either mode —
  * StreamingSpec asserts batch ≡ streaming on the test corpus.
  *
  * Scale notes: both operators are the canonical scalable streaming
  * shapes — watermarked windowed aggregation (state bounded by
  * windows-in-flight × event_types) and per-key mapGroupsWithState
  * (state bounded by one open session per active user; event-time
  * timeout evicts idle users). No stream-stream join, no unbounded
  * state.
  */
object StreamingEvents {

  /** Tumbling-window aggregation over a (possibly streaming) events
    * frame with the raw nanos-long `ts`. Watermark bounds state;
    * append mode emits a window once the watermark passes its end.
    *
    * `count_distinct` is not available in streaming aggs, so the
    * distinct-user count is approximate here (HLL) — the batch twin
    * (Events.tumblingAgg) is exact; StreamingSpec compares the exact
    * columns.
    */
  def tumblingAgg(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"
  ): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", watermarkDelay)
      .groupBy(window(col("ts_t"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(Events.centiValue(col("value"))) / lit(100.0)).as("total_value"),
        approx_count_distinct("user_id").as("n_users_approx")
      )
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"),
        col("n_events"),
        col("total_value"),
        col("n_users_approx")
      )

  /** Streaming ingest dedup — the streaming twin of q30's exact dedup
    * and the standard idempotent-ingest guard (at-least-once sources
    * redeliver). dropDuplicatesWithinWatermark bounds the dedup state
    * to the watermark horizon, so state stays finite on an unbounded
    * stream — a plain dropDuplicates would grow forever.
    */
  def dedupStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful gap sessionization via flatMapGroupsWithState with
    * event-time timeout: a user's session closes either when a new
    * event arrives past the gap, or when the watermark passes
    * session_end + gap (timeout) — so sessions are emitted without
    * waiting for the user to come back.
    *
    * Within one micro-batch a group's events arrive unordered; they
    * are sorted here (a user's per-batch burst is bounded, same
    * assumption as the batch window sort).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapUs: Long = Events.SessionGapNanos / 1000L,
      watermarkDelay: String = "2 hours"
  ): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(userId: Long, st: UserSessionState): SessionRow =
      SessionRow(
        user_id = userId,
        session_id = st.nextId,
        n_events = st.n,
        session_start_us = st.startUs,
        session_end_us = st.endUs,
        total_value = st.cvSum / 100.0,
        duration_s = (st.endUs - st.startUs) / 1000000L
      )

    def update(
        userId: Long,
        batch: Iterator[SessionEvent],
        state: GroupState[UserSessionState]
    ): Iterator[SessionRow] = {
      if (state.hasTimedOut) {
        // Watermark passed end + gap: the open session is final.
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        out
      } else {
        val sorted = batch.toSeq.sortBy(_.ts_us)
        var open = state.getOption
        val closed = Seq.newBuilder[SessionRow]
        sorted.foreach { e =>
          open match {
            case Some(st) if e.ts_us - st.endUs <= gapUs =>
              open = Some(st.copy(endUs = math.max(st.endUs, e.ts_us), n = st.n + 1, cvSum = st.cvSum + e.cv))
            case Some(st) =>
              closed += close(userId, st)
              open = Some(UserSessionState(st.nextId + 1, e.ts_us, e.ts_us, 1L, e.cv))
            case None =>
              open = Some(UserSessionState(0L, e.ts_us, e.ts_us, 1L, e.cv))
          }
        }
        open.foreach { st =>
          state.update(st)
          // Timeout once the watermark proves no in-gap event can arrive.
          state.setTimeoutTimestamp(st.endUs / 1000L + gapUs / 1000L + 1L)
        }
        closed.result().iterator
      }
    }

    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
