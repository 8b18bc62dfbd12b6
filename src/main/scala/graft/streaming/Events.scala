package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY §2.F) over the `events` table.
  *
  * The reference's pipelines are batch-orchestrated per vintage
  * (gerrydb_etl/bootstrap/pl_all.sh runs one import per dataset drop);
  * graft generalizes that to event-time processing: gap sessionization,
  * tumbling-window aggregation, and JSON property extraction — the
  * operators an events/training-data pipeline hits first.
  *
  * Time representation: the parquet column `ts` is TIMESTAMP(NANOS),
  * which Spark reads as a nanos-since-epoch LONG
  * (spark.sql.legacy.parquet.nanosAsLong=true, GraftSession.scala). All
  * window/gap arithmetic here is EXACT integer math on that long — no
  * timestamp rounding, no timezone surface, bit-identical to the DuckDB
  * oracle's epoch_ns(ts).
  *
  * Money/value sums go through exact centi-units
  * (cast(round(value*100) as long)) so parallel partial aggregation
  * cannot round differently from a sequential engine — double addition
  * is not associative; 64-bit integer addition is.
  *
  * Scale notes:
  *   - sessionize is ONE shuffle on user_id (window partition), then a
  *     map-side-combinable groupBy on (user_id, session_id) that reuses
  *     the same hash partitioning — Catalyst does not re-shuffle.
  *     At 100 TB the user_id key space is huge and well-spread; skewed
  *     power-users are handled by AQE skew-split on the agg only (the
  *     window itself needs the full user history together, which is
  *     inherent to sessionization in any engine).
  *   - tumbling windows are a plain groupBy → partial agg before
  *     shuffle; cardinality = windows × event_types, tiny vs input.
  *   - JSON extraction is a scalar projection (codegen'd
  *     get_json_object) feeding a groupBy — no shuffle beyond the agg.
  */
object Events {

  val NanosPerSecond: Long = 1000000000L
  val NanosPerHour: Long = 3600L * NanosPerSecond

  /** Default sessionization gap: 2 hours of event-time silence. */
  val SessionGapNanos: Long = 2L * NanosPerHour

  /** value (2-dp double) → exact integer centi-units. */
  def centiValue(value: Column): Column =
    round(value * lit(100.0), 0).cast("long")

  /** Tumbling-window start (nanos since epoch, floor to window size). */
  def windowStartNs(tsNanos: Column, windowNanos: Long): Column =
    tsNanos - (tsNanos % lit(windowNanos))

  /** Gap-based sessionization: assigns `session_id` (0-based per user)
    * to each event. New session when the gap to the previous event of
    * the same user exceeds `gap` (same unit as `ts`).
    *
    * lag + cumulative-sum over one user_id-partitioned sort — the
    * classic single-shuffle formulation (vs the reference's Python
    * row loops, which cannot distribute).
    */
  def sessionized(events: DataFrame, gap: Long = SessionGapNanos): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > lit(gap), 1L).otherwise(0L)
      )
      .withColumn("session_id", sum(col("new_session")).over(byUser) - lit(1L))
      .drop("prev_ts", "new_session")
  }

  /** Per-session rollup: bounds, size, exact value total.
    *
    * Session bounds are reported in MICROseconds: DuckDB truncates
    * parquet TIMESTAMP_NS to µs on read, so µs is the finest precision
    * both engines can agree on. `ts DIV 1000` (integer division — the
    * raw nanos exceed 2^53, so a double round-trip would corrupt low
    * bits) reproduces DuckDB's truncation exactly. The truncation
    * happens BEFORE the gap comparison so the session split decision
    * itself is identical in both engines.
    */
  def sessionStats(events: DataFrame, gapNanos: Long = SessionGapNanos): DataFrame =
    sessionized(events.withColumn("ts", expr("ts DIV 1000")), gapNanos / 1000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start_us"),
        max(col("ts")).as("session_end_us"),
        (sum(centiValue(col("value"))) / lit(100.0)).as("total_value")
      )
      .withColumn(
        "duration_s",
        expr("(session_end_us - session_start_us) DIV 1000000")
      )

  /** Tumbling-window aggregation (batch twin of the streaming query in
    * StreamingSpec). One shuffle, partial-agg'd.
    */
  def tumblingAgg(events: DataFrame, windowNanos: Long = NanosPerHour): DataFrame =
    events
      .groupBy(
        windowStartNs(col("ts"), windowNanos).as("window_start_ns"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        (sum(centiValue(col("value"))) / lit(100.0)).as("total_value"),
        countDistinct(col("user_id")).as("n_users")
      )

  /** JSON property extraction + per-type aggregation. `props` carries
    * `{"k": <int>}`; get_json_object is a codegen'd scalar, so the
    * parse rides the scan projection.
    */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(when(col("k") % 2 === 0, 1L).otherwise(0L)).as("n_even")
      )
}
