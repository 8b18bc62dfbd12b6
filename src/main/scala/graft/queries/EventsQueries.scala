package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
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

  // q120: spike flag fires when a bucket exceeds the median by more
  // than this many MADs (robust one-sided outlier rule; integer
  // compare — no fp boundary decides the flag).
  val SpikeMadFactor = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q37: gap sessionization (2h), per-session rollup. lag + running
    // sum over ONE user_id shuffle; the groupBy reuses the partitioning.
    "q37_sessionize" -> { (s, dir) =>
      Events.sessionStats(Tables.events(s, dir))
    },

    // q120: ingest-rate spike detection — the monitor that notices a
    // crawler gone rogue or an upstream replay: hourly event counts
    // flagged by the robust median/MAD rule (outliers cannot drag a
    // median the way they drag a mean/stddev). The ONLY corpus-sized
    // operation is the per-bucket count; every statistic after it runs
    // on a frame whose size is proportional to the monitored TIME
    // RANGE (24·days buckets), not the data — which is why the global
    // median windows below are fine at 100 TB (they sort hours, not
    // events). Median/MAD by exact discrete index selection (the
    // q45/q57 convention), spike compare all-integer.
    "q120_rate_spike" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables
        .events(s, dir)
        .select((col("ts") - col("ts") % hourNs).as("window_start_ns"))
        .groupBy(col("window_start_ns"))
        .agg(count(lit(1)).as("n_events"))
        .localCheckpoint() // bucket-sized; feeds median, MAD, and output
      def discreteMedian(df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
        val w = Window.orderBy(col(valueCol), col(tieCol))
        df.select(col(valueCol), row_number().over(w).as("rn"))
          .crossJoin(broadcast(df.agg(count(lit(1)).as("cnt"))))
          .filter(col("rn") === expr("(cnt - 1) div 2 + 1"))
          .select(col(valueCol))
      }
      // the 1-row stats frames are checkpointed so the returned plan
      // is just the bucket frame + two broadcast literals (their
      // bucket-sorting windows ran once, behind the cut)
      val med = discreteMedian(counts, "n_events", "window_start_ns")
        .withColumnRenamed("n_events", "med")
        .localCheckpoint()
      val devs = counts
        .crossJoin(broadcast(med))
        .select(abs(col("n_events") - col("med")).as("ad"), col("window_start_ns"))
      val mad = discreteMedian(devs, "ad", "window_start_ns")
        .withColumnRenamed("ad", "mad")
        .localCheckpoint()
      counts
        .crossJoin(broadcast(med))
        .crossJoin(broadcast(mad))
        .select(
          col("window_start_ns"),
          col("n_events"),
          col("med"),
          col("mad"),
          ((col("n_events") - col("med")) > lit(SpikeMadFactor) * col("mad")).as("is_spike")
        )
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
    },

    // q68: conversion funnel view → click → purchase with strict
    // temporal ordering (first click AFTER first view, first purchase
    // AFTER that click). Three user-keyed min-aggregates chained by
    // joins — each stage's frame is one row per surviving user, so
    // the chain stays user-partitioned and tiny. All comparisons in
    // µs (ts DIV 1000): DuckDB cannot see nanos, so a nanos-strict
    // `>` could count a pair the oracle misses.
    "q68_funnel" -> { (s, dir) =>
      val ev = Tables
        .events(s, dir)
        .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
      val v = ev.filter(col("event_type") === "view").groupBy(col("user_id")).agg(min(col("ts_us")).as("tv"))
      val c = ev
        .filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts_us") > col("tv"))
        .groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("tc"))
      val p = ev
        .filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts_us") > col("tc"))
        .groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("tp"))
      // one user-keyed left-join chain, then ONE global aggregate
      // counting stage survivors (non-null stage timestamps) — not
      // three separate count frames
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .agg(count(col("tv")).as("n_view"), count(col("tc")).as("n_click"), count(col("tp")).as("n_purchase"))
        .select(
          col("n_view"),
          col("n_click"),
          col("n_purchase"),
          // empty stages -> NULL rate, not DIVIDE_BY_ZERO: Spark 4
          // runs ANSI mode by default, where 0.0/0.0 THROWS (the
          // DuckDB oracle returns NULL for the same division)
          when(col("n_view") > 0, round(col("n_click").cast("double") / col("n_view"), 4))
            .as("view_to_click"),
          when(col("n_click") > 0, round(col("n_purchase").cast("double") / col("n_click"), 4))
            .as("click_to_purchase")
        )
    },

    // q69: weekly retention cohorts — users grouped by first-seen week,
    // counted at each later week offset. The (user, week) distinct
    // bounds every downstream frame by users × weeks; week ids are µs
    // integer division so both engines bucket identically.
    "q69_retention" -> { (s, dir) =>
      val wk = Tables
        .events(s, dir)
        .select(col("user_id"), expr("(ts DIV 1000) DIV 604800000000").as("week"))
        .distinct()
      val cohort = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      wk.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    },

    // q74: last-touch attribution — each purchase attributed to the
    // same user's most recent click no older than 30 minutes. The
    // batch twin of StreamingSpec's stream-stream attribution join,
    // built on AsOfJoin's union + running-last formulation: ONE
    // user_id shuffle, linear per key, no inequality join. The
    // unconstrained latest-prior click is found first; the horizon is
    // a post-filter (if the latest prior click is too old, every
    // earlier one is older still — so this is exact, not a heuristic).
    // Ties at one µs resolve to the max click_id on both engines.
    "q74_attribution" -> { (s, dir) =>
      val ev = Tables
        .events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
      AsOfJoin
        .latestPriorMatch(purchases, clicks, "user_id", "ts_us", Seq("click_id"))
        .select(
          col("purchase_id"),
          col("user_id"),
          col("ts_us"),
          when(col("ts_us") - col("asof_ts_us") <= AttributionHorizonUs, col("asof_click_id")).as("click_id"),
          when(col("ts_us") - col("asof_ts_us") <= AttributionHorizonUs, col("ts_us") - col("asof_ts_us"))
            .as("gap_us")
        )
    },

    // q77: sliding-window aggregation — 1-hour windows every 15
    // minutes. Each event belongs to exactly 4 windows, materialized
    // by an explicit explode (bounded fan-out = width/hop) and then
    // ONE aggregate: at 100 TB the fan-out factor, not the window
    // count, is what multiplies the shuffle, and it stays constant.
    "q77_sliding_windows" -> { (s, dir) =>
      val ev = Tables
        .events(s, dir)
        .select(
          col("event_type"),
          col("user_id"),
          expr("ts DIV 1000").as("ts_us"),
          Events.centiValue(col("value")).as("cv")
        )
      ev.select(
          col("event_type"),
          col("user_id"),
          col("cv"),
          col("ts_us"),
          explode(expr(s"sequence(0L, ${SlideWindowHops - 1}L)")).as("j")
        )
        .select(
          col("event_type"),
          col("user_id"),
          col("cv"),
          (expr(s"(ts_us DIV $SlideHopUs) * $SlideHopUs") - col("j") * SlideHopUs).as("window_start_us")
        )
        .groupBy(col("window_start_us"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          (sum(col("cv")) / 100.0).as("total_value")
        )
    }
  )

  /** q74: attribution horizon, 30 minutes in µs. */
  val AttributionHorizonUs: Long = 30L * 60L * 1000000L

  /** q77: window hop (15 min in µs); window width = 4 hops = 1 h. */
  val SlideHopUs: Long = 15L * 60L * 1000000L
  val SlideWindowHops: Int = 4

  private val gapNs = Events.SessionGapNanos
  private val hourNs = Events.NanosPerHour

  def oracle: Map[String, String] = Map(
    "q120_rate_spike" ->
      s"""WITH c AS (SELECT epoch_ns(ts) - epoch_ns(ts) % $hourNs AS window_start_ns,
         |                  count(*) AS n_events
         |           FROM events GROUP BY 1),
         |m AS (SELECT n_events AS med FROM (
         |        SELECT n_events,
         |               row_number() OVER (ORDER BY n_events, window_start_ns) AS rn,
         |               count(*) OVER () AS cnt
         |        FROM c) WHERE rn = (cnt - 1) // 2 + 1),
         |d AS (SELECT abs(c.n_events - m.med) AS ad, c.window_start_ns FROM c CROSS JOIN m),
         |md AS (SELECT ad AS mad FROM (
         |        SELECT ad,
         |               row_number() OVER (ORDER BY ad, window_start_ns) AS rn,
         |               count(*) OVER () AS cnt
         |        FROM d) WHERE rn = (cnt - 1) // 2 + 1)
         |SELECT c.window_start_ns, c.n_events, m.med, md.mad,
         |       (c.n_events - m.med) > $SpikeMadFactor * md.mad AS is_spike
         |FROM c CROSS JOIN m CROSS JOIN md""".stripMargin,
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
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q68_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS tv FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(ts_us) AS tc
        |      FROM ev e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > tv GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ts_us) AS tp
        |      FROM ev e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > tc GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase,
        |       round(CAST((SELECT count(*) FROM c) AS DOUBLE) / (SELECT count(*) FROM v), 4) AS view_to_click,
        |       round(CAST((SELECT count(*) FROM p) AS DOUBLE) / (SELECT count(*) FROM c), 4) AS click_to_purchase""".stripMargin,
    "q69_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
        |FROM wk JOIN cohort USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q74_attribution" ->
      s"""WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
         |      FROM events WHERE event_type = 'click'),
         |j AS (SELECT p.purchase_id, c.click_id, c.cts,
         |             row_number() OVER (PARTITION BY p.purchase_id
         |                                ORDER BY c.cts DESC, c.click_id DESC) AS rk
         |      FROM p JOIN c ON p.user_id = c.user_id AND c.cts <= p.ts_us),
         |b AS (SELECT purchase_id, click_id, cts FROM j WHERE rk = 1)
         |SELECT p.purchase_id, p.user_id, p.ts_us,
         |       CASE WHEN p.ts_us - b.cts <= $AttributionHorizonUs THEN b.click_id END AS click_id,
         |       CASE WHEN p.ts_us - b.cts <= $AttributionHorizonUs THEN p.ts_us - b.cts END AS gap_us
         |FROM p LEFT JOIN b USING (purchase_id)""".stripMargin,
    "q77_sliding_windows" ->
      s"""WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS ts_us,
         |                  CAST(round(value * 100, 0) AS BIGINT) AS cv FROM events),
         |x AS (SELECT event_type, user_id, cv,
         |             (ts_us // $SlideHopUs) * $SlideHopUs - j * $SlideHopUs AS window_start_us
         |      FROM e CROSS JOIN (SELECT unnest(range(0, $SlideWindowHops)) AS j) js)
         |SELECT window_start_us, event_type, count(*) AS n_events,
         |       count(DISTINCT user_id) AS n_users,
         |       sum(cv) / 100.0 AS total_value
         |FROM x GROUP BY 1, 2""".stripMargin
  )
}
