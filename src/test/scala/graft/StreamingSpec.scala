package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.{Events, SessionEvent, StreamingEvents}

case class RawEvent(ts: Long, user_id: Long, event_type: String, value: Double)
case class IngestEvent(event_id: Long, ts: Long)

/** SURVEY §2.F streaming twin: the SAME events corpus processed as a
  * stream (MemoryStream micro-batches + watermark) must produce the
  * SAME answers as the batch operators q37/q38.
  *
  * Sentinel events far in the future advance the watermark so all real
  * windows/sessions close; sentinels are excluded from the comparison.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val ns = Events.NanosPerSecond

  private def eventRows: Seq[RawEvent] =
    Tables
      .events(spark, sf)
      .select("ts", "user_id", "event_type", "value")
      .as[RawEvent]
      .collect()
      .toSeq

  test("streaming tumbling windows match batch q38 on exact columns") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val maxTs = rows.map(_.ts).max

    val stream = MemoryStream[RawEvent]
    val query = StreamingEvents
      .tumblingAgg(stream.toDF())
      .writeStream
      .format("memory")
      .queryName("win_stream")
      .outputMode("append")
      .start()
    try {
      stream.addData(rows)
      query.processAllAvailable()
      // advance the watermark far past every real window, twice (the
      // second batch processes evictions under the advanced watermark)
      stream.addData(RawEvent(maxTs + 10L * 86400 * ns, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      stream.addData(RawEvent(maxTs + 11L * 86400 * ns, -1L, "sentinel", 0.0))
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark
      .table("win_stream")
      .filter(col("event_type") =!= "sentinel")
      .select(col("window_start_us") * 1000, col("event_type"), col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val batch = Events
      .tumblingAgg(Tables.events(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    assert(streamed.keySet == batch.keySet, "window/event_type key sets differ")
    batch.foreach { case (k, v) => assert(streamed(k) == v, s"window $k differs") }
  }

  test("streaming sliding windows match batch q77 on exact columns") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val maxTs = rows.map(_.ts).max

    val stream = MemoryStream[RawEvent]
    val query = StreamingEvents
      .slidingAgg(stream.toDF())
      .writeStream
      .format("memory")
      .queryName("slide_stream")
      .outputMode("append")
      .start()
    try {
      stream.addData(rows)
      query.processAllAvailable()
      stream.addData(RawEvent(maxTs + 10L * 86400 * ns, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      stream.addData(RawEvent(maxTs + 11L * 86400 * ns, -1L, "sentinel", 0.0))
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark
      .table("slide_stream")
      .filter(col("event_type") =!= "sentinel")
      .select(col("window_start_us"), col("event_type"), col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val batch = SparkEntry
      .queries("q77_sliding_windows")(spark, sf)
      .select(col("window_start_us"), col("event_type"), col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    assert(streamed.keySet == batch.keySet, "sliding window/event_type key sets differ")
    batch.foreach { case (k, v) => assert(streamed(k) == v, s"sliding window $k differs") }
  }

  test("tumbling windows drop events later than the watermark (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[RawEvent]
    val query = StreamingEvents
      .tumblingAgg(stream.toDF())
      .writeStream
      .format("memory")
      .queryName("late_stream")
      .outputMode("append")
      .start()
    try {
      val base = 1000000L * ns
      stream.addData(RawEvent(base, 1L, "view", 1.0))
      query.processAllAvailable()
      // advance the watermark far past base, twice (eviction batch)
      stream.addData(RawEvent(base + 30L * 86400 * ns, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      stream.addData(RawEvent(base + 31L * 86400 * ns, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      val closed = spark.table("late_stream").filter(col("event_type") === "view").count()
      assert(closed == 1L, "the on-time window must have closed")
      // an event in a long-closed window: later than the watermark, so
      // the stateful agg must DROP it — its state is gone; accepting it
      // would mean unbounded state retention
      stream.addData(RawEvent(base + 1L, 2L, "view", 9.9))
      query.processAllAvailable()
      val after = spark.table("late_stream").filter(col("event_type") === "view").count()
      assert(after == closed, "a later-than-watermark event re-opened or re-emitted a closed window")
    } finally query.stop()
  }

  test("streaming dedup drops at-least-once redeliveries within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables
      .events(spark, sf)
      .select("event_id", "ts")
      .as[IngestEvent]
      .collect()
      .toSeq
      .take(200)
    val stream = MemoryStream[IngestEvent]
    val query = StreamingEvents
      .dedupStream(stream.toDF())
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      stream.addData(rows) // original delivery
      query.processAllAvailable()
      stream.addData(rows) // full redelivery (at-least-once source)
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("dedup_stream")
    assert(out.count() == 200L, "redelivered events not deduped")
    assert(out.select("event_id").distinct().count() == 200L)
  }

  test("stream-static dim enrichment matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows.take(300)
    val nation = Tables.nation(spark, sf) // static dim; broadcast per micro-batch
    val stream = MemoryStream[RawEvent]
    val enriched = stream
      .toDF()
      .withColumn("n_nationkey", col("user_id") % 25)
      .join(broadcast(nation), "n_nationkey")
      .select(col("ts"), col("user_id"), col("n_name"))
    val query = enriched.writeStream.format("memory").queryName("enrich_stream").outputMode("append").start()
    try {
      stream.addData(rows)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("enrich_stream")
    val batch = rows
      .toDF()
      .withColumn("n_nationkey", col("user_id") % 25)
      .join(nation, "n_nationkey")
    assert(streamed.count() == batch.count())
    val a = streamed.groupBy("n_name").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = batch.groupBy("n_name").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("stream-stream attribution join matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val maxTs = rows.map(_.ts).max
    val views = MemoryStream[RawEvent]
    val clicks = MemoryStream[RawEvent]
    val joined = StreamingEvents.attributionJoin(views.toDF(), clicks.toDF())
    val query = joined.writeStream.format("memory").queryName("attr_stream").outputMode("append").start()
    try {
      views.addData(rows.filter(_.event_type == "view"))
      clicks.addData(rows.filter(_.event_type == "click"))
      query.processAllAvailable()
      // advance BOTH watermarks past every real event, twice
      for (d <- Seq(10L, 11L)) {
        val sentinel = RawEvent(maxTs + d * 86400 * ns, -1L, "sentinel", 0.0)
        views.addData(sentinel); clicks.addData(sentinel)
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = spark
      .table("attr_stream")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val ev = Tables.events(spark, sf).select(col("user_id"), expr("ts DIV 1000").as("t"), col("event_type"))
    val batch = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("click_us"))
      .join(
        ev.filter(col("event_type") === "view").select(col("user_id"), col("t").as("view_us")),
        Seq("user_id")
      )
      .filter(col("click_us") >= col("view_us") && col("click_us") <= col("view_us") + 3600000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
      .toSet
    assert(batch.nonEmpty, "test data has no attribution pairs — spec is vacuous")
    assert(streamed == batch, s"stream/batch attribution differs: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
  }

  test("session numbering survives a timeout flush (return-after-idle user)") {
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    val gapUs = Events.SessionGapNanos / 1000L // 2h
    val base = 1700000000L * us
    val stream = MemoryStream[SessionEvent]
    val query = StreamingEvents
      .sessionize(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("sess_renum")
      .outputMode("append")
      .start()
    try {
      // burst 1: two events, one session
      stream.addData(SessionEvent(7L, base, 100L), SessionEvent(7L, base + 60L * us, 200L))
      query.processAllAvailable()
      // another user far in the future advances the watermark past
      // burst 1's end + gap -> user 7 times out and session 0 flushes
      stream.addData(SessionEvent(-1L, base + 100L * 3600L * us, 0L))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, base + 101L * 3600L * us, 0L))
      query.processAllAvailable()
      assert(
        spark.table("sess_renum").filter(col("user_id") === 7L).count() == 1L,
        "burst 1 should have flushed via timeout"
      )
      // burst 2: user 7 returns (>= watermark); must be session_id 1, not 0
      val t2 = base + 102L * 3600L * us
      stream.addData(SessionEvent(7L, t2, 300L))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, t2 + 200L * 3600L * us, 0L))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, t2 + 201L * 3600L * us, 0L))
      query.processAllAvailable()
    } finally query.stop()
    val sessions = spark
      .table("sess_renum")
      .filter(col("user_id") === 7L)
      .orderBy("session_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(sessions.toSeq == Seq((0L, 2L), (1L, 1L)), s"got ${sessions.toSeq}")
  }

  test("stateful streaming sessionize reproduces batch q37 exactly") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val maxUs = rows.map(_.ts).max / 1000L

    val stream = MemoryStream[SessionEvent]
    val query = StreamingEvents
      .sessionize(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("sess_stream")
      .outputMode("append")
      .start()
    try {
      stream.addData(rows.map(e => SessionEvent(e.user_id, e.ts / 1000L, math.round(e.value * 100))))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, maxUs + 10L * 86400 * 1000000L, 0L))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, maxUs + 11L * 86400 * 1000000L, 0L))
      query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val streamed = spark
      .table("sess_stream")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => key(r) -> r.toSeq)
      .toMap

    val batch = Events
      .sessionStats(Tables.events(spark, sf))
      .select("user_id", "session_id", "n_events", "session_start_us", "session_end_us", "total_value", "duration_s")
      .collect()
      .map(r => key(r) -> r.toSeq)
      .toMap

    assert(streamed.keySet == batch.keySet, "session key sets differ")
    batch.foreach { case (k, v) =>
      // streaming emits (user, session, n, start, end, total, duration) too
      assert(streamed(k) == v, s"session $k differs: ${streamed(k)} vs $v")
    }
  }
}
