package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event input for the stateful sessionizer: `ts_us` is event time in
  * microseconds since epoch, `cv` the exact centi-value (see
  * Events.centiValue).
  */
case class SessionEvent(user_id: Long, ts_us: Long, cv: Long)

/** Per-user sessionizer state: the id the NEXT emitted session takes
  * (so streaming ids reproduce the batch q37 numbering even across
  * timeouts) plus the buffered not-yet-final events (parallel arrays;
  * bounded by the watermark horizon — see StreamingEvents.sessionize).
  */
case class UserSessionState(
    nextId: Long,
    tsUs: Array[Long],
    cv: Array[Long]
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
  * windows-in-flight × event_types) and per-key flatMapGroupsWithState
  * sessionization whose LIVE state is bounded by the watermark horizon
  * per active user, plus one small tombstone record per user ever seen
  * (kept deliberately so session numbering survives idle periods — the
  * tradeoff is documented on sessionize; drop the tombstone if ids may
  * restart). No stream-stream join.
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

  /** Sliding-window aggregation — the streaming twin of batch q77
    * (1-hour windows every 15 minutes). Spark's native sliding
    * `window()` assigns each event to width/slide windows inside the
    * stateful aggregation (state = windows-in-flight × event_types,
    * bounded by the watermark), where the batch twin materializes the
    * same fan-out with an explicit explode. Window starts are
    * epoch-aligned slide multiples on both paths, so the keys match
    * exactly.
    */
  def slidingAgg(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "15 minutes",
      watermarkDelay: String = "2 hours"
  ): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", watermarkDelay)
      .groupBy(window(col("ts_t"), windowLen, slide), col("event_type"))
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

  /** Stream-stream attribution join: each click joins the same user's
    * views from the preceding `horizon`. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * evict matched/unmatchable rows from state — the two requirements
    * that make a stream-stream join runnable on an unbounded stream
    * (an unbounded-condition join would buffer both streams forever).
    * At 100 TB/day the state held is one horizon's worth of views per
    * user, independent of stream length.
    */
  def attributionJoin(
      views: DataFrame,
      clicks: DataFrame,
      watermarkDelay: String = "2 hours"
  ): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), timestamp_micros(expr("ts DIV 1000")).as("view_t"))
      .withWatermark("view_t", watermarkDelay)
    val c = clicks
      .select(col("user_id").as("c_user"), timestamp_micros(expr("ts DIV 1000")).as("click_t"))
      .withWatermark("click_t", watermarkDelay)
    c.join(v, expr("c_user = v_user AND click_t >= view_t AND click_t <= view_t + interval 1 hour"))
      .select(
        col("c_user").as("user_id"),
        unix_micros(col("view_t")).as("view_us"),
        unix_micros(col("click_t")).as("click_us")
      )
  }

  /** Stateful gap sessionization via flatMapGroupsWithState with
    * event-time timeout. Events BUFFER in state until the watermark
    * proves their session final: every future event has event-time >=
    * the watermark (Spark drops later rows from stateful-op input), so
    * a session is immutable exactly when session_end + gap < watermark
    * — nothing admissible can extend, bridge, or merge-left into it.
    * Emitting only final sessions makes the output bit-equal to batch
    * q37 under ANY arrival order the watermark admits (a merge-on-
    * arrival design mislabels cross-batch out-of-order events that
    * precede the open session).
    *
    * State is bounded: per user, the buffered events span at most
    * (gap + watermark delay) of event time, and the state record keeps
    * the next session ordinal so numbering survives timeouts (an empty
    * tombstone remains after a flush; one tiny record per user ever
    * seen — the price of stable ids).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapUs: Long = Events.SessionGapNanos / 1000L,
      watermarkDelay: String = "2 hours"
  ): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._

    // split sorted (ts, cv) pairs into gap-delimited sessions
    def sessionsOf(ts: Array[Long], cv: Array[Long]): Seq[(Array[Long], Array[Long])] = {
      if (ts.isEmpty) return Nil
      val cuts = Seq.newBuilder[Int]
      cuts += 0
      var i = 1
      while (i < ts.length) { if (ts(i) - ts(i - 1) > gapUs) cuts += i; i += 1 }
      val starts = cuts.result() :+ ts.length
      starts.sliding(2).map { case Seq(a, b) => (ts.slice(a, b), cv.slice(a, b)) }.toSeq
    }

    def emit(userId: Long, id: Long, ts: Array[Long], cv: Array[Long]): SessionRow =
      SessionRow(
        user_id = userId,
        session_id = id,
        n_events = ts.length.toLong,
        session_start_us = ts.head,
        session_end_us = ts.last,
        total_value = cv.sum / 100.0,
        duration_s = (ts.last - ts.head) / 1000000L
      )

    def update(
        userId: Long,
        batch: Iterator[SessionEvent],
        state: GroupState[UserSessionState]
    ): Iterator[SessionRow] = {
      val prev = state.getOption.getOrElse(UserSessionState(0L, Array.empty, Array.empty))
      val incoming = batch.toArray
      val (allTs, allCv) =
        if (incoming.isEmpty) (prev.tsUs, prev.cv)
        else {
          val merged = (prev.tsUs.zip(prev.cv) ++ incoming.map(e => (e.ts_us, e.cv))).sortBy(_._1)
          (merged.map(_._1), merged.map(_._2))
        }
      val watermarkUs = state.getCurrentWatermarkMs() * 1000L
      val sessions = sessionsOf(allTs, allCv)
      // final = no admissible future event (ts >= watermark) can touch it
      val (closed, open) = sessions.partition { case (ts, _) => ts.last + gapUs < watermarkUs }
      val out = closed.zipWithIndex.map { case ((ts, cv), i) => emit(userId, prev.nextId + i, ts, cv) }
      val remTs = open.flatMap(_._1).toArray
      val remCv = open.flatMap(_._2).toArray
      state.update(UserSessionState(prev.nextId + closed.size, remTs, remCv))
      if (remTs.nonEmpty) {
        // fire once the watermark passes the EARLIEST open session's
        // end + gap — that session is final exactly then; waiting for
        // the last one would delay earlier sessions' emission by up to
        // the buffered span
        val earliestEnd = open.head._1.last
        state.setTimeoutTimestamp((earliestEnd + gapUs) / 1000L + 1L)
      }
      out.iterator
    }

    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
