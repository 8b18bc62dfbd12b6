package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Events

/** §2.F events operators q37-q39: sessionization, tumbling windows,
  * JSON props extraction. Batch formulations; StreamingSpec runs the
  * structured-streaming twins over the same data.
  *
  * Oracle parity notes (see Events.scala for the full rationale):
  * Spark reads events.ts as a nanos LONG, DuckDB as TIMESTAMP_NS —
  * every oracle works on epoch_ns(ts) so both engines do identical
  * 64-bit integer arithmetic. HUGEINT sums are cast back to BIGINT
  * (DuckDB sum(BIGINT) widens; pandas would coerce HUGEINT to float
  * and the driver's hash compare would miss).
  */
object EventsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q37: gap sessionization (2h), per-session rollup. lag + running
    // sum over ONE user_id shuffle; the groupBy reuses the partitioning.
    "q37_sessionize" -> { (s, dir) =>
      Events.sessionStats(Tables.events(s, dir))
    },

    // q38: 1-hour tumbling windows per event_type — the batch twin of
    // the streaming watermark query in StreamingSpec.
    "q38_window_agg" -> { (s, dir) =>
      Events.tumblingAgg(Tables.events(s, dir))
    },

    // q39: JSON property extraction (get_json_object, codegen'd) + agg.
    "q39_json_extract" -> { (s, dir) =>
      Events.jsonPropsAgg(Tables.events(s, dir))
    },

    // q58: rolling-window aggregation — each event with the average of
    // its user's last 5 values (ROWS frame). Exact centi-integer sums
    // divided once, so parallel partials can't drift; one user_id
    // shuffle like q37.
    "q58_rolling_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // order on µs-TRUNCATED time (DuckDB can't see nanos, so ns
      // ordering could split a tie the oracle sees) + event_id
      // tiebreak: a ROWS frame over tied timestamps would otherwise be
      // order-nondeterministic
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-4, 0)
      Tables
        .events(s, dir)
        .select(
          col("event_id"),
          col("user_id"),
          expr("ts DIV 1000").as("ts_us"),
          Events.centiValue(col("value")).as("cv")
        )
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("rolling_avg", round(sum(col("cv")).over(w) / col("n_win") / lit(100.0), 4))
        .drop("cv")
    }
  )

  private val gapNs = Events.SessionGapNanos
  private val hourNs = Events.NanosPerHour

  def oracle: Map[String, String] = Map(
    "q37_sessionize" ->
      s"""SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
         |       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
         |       sum(cv) / 100.0 AS total_value,
         |       (max(ts_us) - min(ts_us)) // 1000000 AS duration_s
         |FROM (
         |  SELECT user_id, ts_us, cv,
         |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us) - 1 AS session_id
         |  FROM (
         |    SELECT user_id, ts_us, cv,
         |           CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > ${gapNs / 1000L} THEN 1 ELSE 0 END AS new_session
         |    FROM (
         |      SELECT user_id, epoch_us(ts) AS ts_us,
         |             CAST(round(value * 100, 0) AS BIGINT) AS cv,
         |             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_ts
         |      FROM events)))
         |GROUP BY user_id, session_id""".stripMargin,
    "q38_window_agg" ->
      s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $hourNs AS window_start_ns,
         |       event_type,
         |       count(*) AS n_events,
         |       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value,
         |       count(DISTINCT user_id) AS n_users
         |FROM events
         |GROUP BY 1, 2""".stripMargin,
    "q39_json_extract" ->
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k,
        |       max(k) AS max_k,
        |       CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "q58_rolling_avg" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       count(*) OVER w AS n_win,
        |       round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
        |             / (count(*) OVER w) / 100.0, 4) AS rolling_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
