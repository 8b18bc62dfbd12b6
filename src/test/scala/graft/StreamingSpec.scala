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

  test("sessionize is exact under watermark-edge out-of-order arrival") {
    // pathological-but-admissible delivery: events bucketed by hour,
    // ~30% of each hour held back into the NEXT hour's batch (lateness
    // < 2h watermark delay, so nothing is droppable), every batch
    // internally shuffled. The buffer-until-final design must still
    // reproduce batch q37 bit-for-bit — a merge-on-arrival sessionizer
    // mislabels exactly this shape (cross-batch stragglers that
    // precede the open session).
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    val hourUs = 3600L * us
    val rows = eventRows.map(e => SessionEvent(e.user_id, e.ts / 1000L, math.round(e.value * 100)))
    val maxUs = rows.map(_.ts_us).max
    val byHour = rows.groupBy(_.ts_us / hourUs)
    val hours = byHour.keys.toSeq.sorted
    // deterministic straggler choice: no RNG state to coordinate
    def isLate(e: SessionEvent): Boolean = (e.ts_us / us) % 10 < 3
    val batches = hours.zipWithIndex.map { case (h, i) =>
      val onTime = byHour(h).filterNot(isLate)
      val late = if (i == 0) Seq.empty else byHour(hours(i - 1)).filter(isLate)
      val lastLate = if (i == hours.size - 1) byHour(h).filter(isLate) else Seq.empty
      val rnd = new scala.util.Random(h)
      rnd.shuffle((onTime ++ late ++ lastLate).toSeq)
    }
    val stream = MemoryStream[SessionEvent]
    val query = StreamingEvents
      .sessionize(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("sess_ooo")
      .outputMode("append")
      .start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) { stream.addData(b); query.processAllAvailable() }
      }
      stream.addData(SessionEvent(-1L, maxUs + 10L * 86400 * us, 0L))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, maxUs + 11L * 86400 * us, 0L))
      query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val streamed = spark
      .table("sess_ooo")
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
    assert(streamed.keySet == batch.keySet, "session key sets differ under out-of-order arrival")
    batch.foreach { case (k, v) => assert(streamed(k) == v, s"session $k differs: ${streamed(k)} vs $v") }
  }

  test("a user with many sessions numbers them densely across batch flushes") {
    // 50 complete sessions for one user, delivered 7 sessions per
    // batch: the watermark (advanced by the user's own later events)
    // closes SEVERAL sessions per micro-batch — the closed.zipWithIndex
    // multi-flush numbering path — and timeouts close the tail. Ids
    // must come out dense 0..49 with exact per-session stats.
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    val base = 1700000000L * us
    val nSessions = 50
    val events = (0 until nSessions).flatMap { i =>
      val t0 = base + i.toLong * 5L * 3600L * us // 5h spacing >> 2h gap
      Seq(
        SessionEvent(9L, t0, 100L),
        SessionEvent(9L, t0 + 60L * us, 200L),
        SessionEvent(9L, t0 + 120L * us, 300L)
      )
    }
    val stream = MemoryStream[SessionEvent]
    val query = StreamingEvents
      .sessionize(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("sess_many")
      .outputMode("append")
      .start()
    try {
      events.grouped(21).foreach { b => stream.addData(b); query.processAllAvailable() }
      val maxUs = events.map(_.ts_us).max
      stream.addData(SessionEvent(-1L, maxUs + 10L * 86400 * us, 0L))
      query.processAllAvailable()
      stream.addData(SessionEvent(-1L, maxUs + 11L * 86400 * us, 0L))
      query.processAllAvailable()
    } finally query.stop()
    val sessions = spark
      .table("sess_many")
      .filter(col("user_id") === 9L)
      .orderBy("session_id")
      .collect()
    assert(sessions.length == nSessions, s"expected $nSessions sessions, got ${sessions.length}")
    sessions.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i.toLong, s"session ids not dense at $i: ${r.getLong(1)}")
      assert(r.getLong(2) == 3L && r.getLong(6) == 120L, s"session $i stats wrong: $r")
      assert(r.getLong(3) == base + i.toLong * 5L * 3600L * us, s"session $i start wrong")
      assert(r.getDouble(5) == 6.0, s"session $i total_value wrong: ${r.getDouble(5)}")
    }
  }

  test("streaming signature ingest matches batch signatures (the q87 index maintenance path)") {
    // the ingest job that keeps q87's bucketed index current: arriving
    // documents shingle (NO distinct — unsupported on a stream, and
    // unnecessary: MinHash is a min, duplicates cannot change it) and
    // accumulate per-doc signatures through the SAME native aggregate
    // the batch path uses, in update mode. Final signatures must equal
    // the batch ones bit-for-bit — otherwise a streamed index would
    // silently disagree with a batch-built one.
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    val docs = Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .toSeq
    val stream = MemoryStream[(Long, String)]
    val sigs = Dedup
      .minhashSignatures(
        Dedup.shingleRows(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 3),
        graft.queries.DedupSimQueries.NumPerms
      )
    val query = sigs.writeStream
      .format("memory")
      .queryName("sig_stream")
      .outputMode("update")
      .start()
    try {
      // whole documents per batch (a doc never splits across batches),
      // three batches to prove state carries across micro-batches
      docs.grouped(math.max(docs.size / 3, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = spark
      .table("sig_stream")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val batch = Dedup
      .minhashSignatures(
        Dedup.shingles(Tables.documents(spark, sf), "doc_id", "text", 3),
        graft.queries.DedupSimQueries.NumPerms
      )
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    assert(streamed.keySet == batch.keySet, "doc sets differ")
    batch.foreach { case (d, sig) => assert(streamed(d) == sig, s"signature differs for doc $d") }
  }

  test("streaming weighted-sample heaps match batch exactly (the q99 maintenance path)") {
    // a continuously-maintained weighted sample: arriving documents
    // fold into the per-source bounded heap (graft_topk), read back in
    // complete mode. The heap's content is merge-order independent, so the
    // final state must equal the batch aggregate EXACTLY — including
    // the ascending-by-key id order inside each array.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sampling
    val k = 5
    val docs = Tables
      .documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"), col("n_chars"))
      .as[(String, Long, String, Long)]
      .collect()
      .toSeq
    val stream = MemoryStream[(String, Long, String, Long)]
    val heaps = Sampling.weightedTopKHeaps(
      stream.toDF().toDF("source", "doc_id", "text", "n_chars"),
      "source",
      "doc_id",
      "text",
      "n_chars",
      k
    )
    val query = heaps.writeStream
      .format("memory")
      .queryName("wsample_stream")
      .outputMode("complete")
      .start()
    try {
      docs.grouped(math.max(docs.size / 4, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = spark
      .table("wsample_stream")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    val batch = Sampling
      .weightedTopKHeaps(Tables.documents(spark, sf), "source", "doc_id", "text", "n_chars", k)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    assert(streamed.keySet == batch.keySet, "source sets differ")
    batch.foreach { case (s0, ids) => assert(streamed(s0) == ids, s"sample differs for source $s0") }
  }

  test("streaming CMS and Bloom maintenance are bit-equal to batch (pure-sum/OR merges)") {
    // the continuously-maintained q101/q102 sketches: counters and
    // bitsets fold over a stream in complete mode; because both
    // merges are commutative integer ops, the streamed state must
    // equal the batch aggregate EXACTLY, element for element
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val docs = Tables
      .documents(spark, sf)
      .select(col("source"), col("doc_id"))
      .as[(String, Long)]
      .collect()
      .toSeq
    val stream = MemoryStream[(String, Long)]
    val agged = stream
      .toDF()
      .toDF("source", "doc_id")
      .groupBy(col("source"))
      .agg(
        GraftFunctions.cms(col("doc_id"), 4, 128).as("cms"),
        GraftFunctions.bloom(col("doc_id"), 1024, 4).as("bf")
      )
    val query = agged.writeStream
      .format("memory")
      .queryName("sketch_stream")
      .outputMode("complete")
      .start()
    try {
      docs.grouped(math.max(docs.size / 4, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = spark
      .table("sketch_stream")
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2))))
      .toMap
    val batch = Tables
      .documents(spark, sf)
      .groupBy(col("source"))
      .agg(
        GraftFunctions.cms(col("doc_id"), 4, 128).as("cms"),
        GraftFunctions.bloom(col("doc_id"), 1024, 4).as("bf")
      )
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2))))
      .toMap
    assert(streamed.keySet == batch.keySet, "source sets differ")
    batch.foreach { case (s0, (cms, bf)) =>
      assert(streamed(s0)._1 == cms, s"CMS differs for source $s0")
      assert(streamed(s0)._2 == bf, s"bloom differs for source $s0")
    }
  }

  test("streaming segment-winner ingest matches batch winners (the q89 index maintenance path)") {
    // the ingest job that keeps a segment-dedup index current: arriving
    // documents explode to segments (no distinct — stream-safe) and the
    // SAME min-struct aggregate the batch path uses maintains the
    // first-occurrence winner per segment in update mode. A MIN only
    // ever decreases, so the LAST update per key is the global winner
    // regardless of arrival order or batch boundaries — streamed
    // winners must equal the batch ones exactly.
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    import graft.queries.DedupSimQueries.SegWords
    val docs = Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .toSeq
    val stream = MemoryStream[(Long, String)]
    val winners = Dedup.segmentWinners(
      Dedup.docSegments(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", SegWords)
    )
    val query = winners.writeStream
      .format("memory")
      .queryName("segwin_stream")
      .outputMode("update")
      .start()
    try {
      // REVERSED doc order across three batches: the later-arriving
      // smaller doc_id must overtake the earlier winner in state
      docs.sortBy(-_._1).grouped(math.max(docs.size / 3, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    // update mode appends one row per key per batch it changed in; the
    // final winner per segment is the minimal (doc_id, seg_idx) update
    val streamed = spark
      .table("segwin_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._3)
      .map { case (seg, rows) => seg -> rows.minBy(t => (t._1, t._2)) }
    val batch = Dedup
      .segmentWinners(Dedup.docSegments(Tables.documents(spark, sf), "doc_id", "text", SegWords))
      .collect()
      .map(r => r.getString(2) -> ((r.getLong(0), r.getLong(1), r.getString(2))))
      .toMap
    assert(streamed.keySet == batch.keySet, "segment sets differ")
    batch.foreach { case (seg, w) => assert(streamed(seg) == w, s"winner differs for segment '$seg'") }
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

  test("streaming shard packing matches batch q71 assignments (the packing maintenance path)") {
    // the ingest job that keeps training shards current: each arriving
    // doc gets its shard the moment it lands, carrying ONE long of
    // state per source (the running token total). Assignments must
    // equal a batch re-pack of the whole corpus exactly — the
    // append ≡ rebuild invariant, applied to packing. Ingest contract:
    // ascending doc_id per source across batches (intra-batch order is
    // free — the packer sorts its group iterator).
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{PackDoc, Packing}
    val docs = Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("source"), graft.text.TextFunctions.tokenCountWs(col("text")).cast("long").as("n_toks"))
      .as[(Long, String, Long)]
      .collect()
      .toSeq
      .sortBy(_._1)
      .map { case (d, s, n) => PackDoc(d, s, n) }
    val stream = MemoryStream[PackDoc]
    val assigned = Packing.shardAssignments(stream.toDS(), graft.queries.TrainingQueries.ShardTokenBudget.toLong)
    val query = assigned.writeStream
      .format("memory")
      .queryName("pack_stream")
      .outputMode("update")
      .start()
    try {
      // shuffle WITHIN each batch (the packer must not depend on
      // intra-batch arrival order), keep doc_id ascending ACROSS them
      docs.grouped(math.max(docs.size / 3, 1)).foreach { b =>
        stream.addData(new scala.util.Random(17).shuffle(b))
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = spark
      .table("pack_stream")
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val batch = SparkEntry
      .queries("q71_token_shards")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed.keySet == batch.keySet, "doc sets differ")
    batch.foreach { case (d, v) => assert(streamed(d) == v, s"assignment differs for doc $d") }
  }

  test("streaming edge-table ingest feeds the q104 incremental rank (the graph maintenance path)") {
    // the ingest job that keeps q104's bucketed edge table current:
    // edge observations arrive as a stream, each micro-batch APPENDS
    // through the same PageRank.appendEdgeTable the batch path uses
    // (foreachBatch — the canonical bridge for bucketed-table sinks,
    // which writeStream cannot target directly). The accumulated
    // table must dedup to the batch edge set, keep its bucket layout
    // through every append, and rank identically to the in-memory
    // run.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.PageRank
    import graft.queries.GraphQueries
    val tbl = "graft_edge_stream_spec"
    val edges = GraphQueries
      .partEdges(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val chunks = edges.grouped(math.max(edges.size / 3, 1)).toSeq
    // bootstrap: the table exists before the stream starts (day-0 build)
    PageRank.writeEdgeTable(chunks.head.toDF("src", "dst"), tbl, 4)
    val stream = MemoryStream[(Long, Long)]
    val query = stream
      .toDF()
      .toDF("src", "dst")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        PageRank.appendEdgeTable(batch, tbl)
      }
      .start()
    try {
      chunks.tail.foreach { c =>
        stream.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    // contents: streamed appends dedup to exactly the batch edge set
    val stored = PageRank.edgesFromTable(spark, tbl).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == edges.toSet, "streamed edge table diverges from the batch edge set")
    // layout survived every micro-batch append
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(tbl))
    assert(meta.bucketSpec.exists(_.numBuckets == 4), "append changed the bucket layout")
    // and the maintained rank equals the in-memory run (round-7 contract)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("node"), round(col("pr"), 7).as("pr"))
        .collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
        .toMap
    val maintained = ranks(PageRank.runFromEdgeTable(spark, tbl, 0.85, 3))
    val direct = ranks(PageRank.run(edges.toDF("src", "dst"), "src", "dst", 0.85, 3))
    assert(maintained == direct, "stream-maintained rank diverged from the direct run")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streaming document ingest feeds the q117 BM25 index (the search maintenance path)") {
    // the ingest job that keeps q117's postings table current: new
    // documents arrive as a stream, each micro-batch APPENDS through
    // the same Bm25Index.appendIndex the batch path uses (foreachBatch
    // — bucketed-table sinks again). Search off the accumulated index
    // must equal the no-index searchDirect over the full corpus, and
    // the bucket layout must survive every append.
    implicit val sqlCtx = spark.sqlContext
    import graft.search.Bm25Index
    import graft.queries.TrainingQueries.{Bm25IndexBuckets, Bm25Queries, Bm25TopK}
    val tbl = "graft_bm25_stream_spec"
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    val chunks = docs.grouped(math.max(docs.size / 3, 1)).toSeq
    // bootstrap: day-0 index build
    Bm25Index.writeIndex(chunks.head.toDF("doc_id", "text"), "doc_id", "text", tbl, Bm25IndexBuckets)
    val stream = MemoryStream[(Long, String)]
    val query = stream
      .toDF()
      .toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Bm25Index.appendIndex(batch, "doc_id", "text", tbl)
      }
      .start()
    try {
      chunks.tail.foreach { c =>
        stream.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val maintained = rows(Bm25Index.search(spark, tbl, Bm25Queries, Bm25TopK))
    val direct = rows(
      Bm25Index.searchDirect(docs.toDF("doc_id", "text"), "doc_id", "text", Bm25Queries, Bm25TopK)
    )
    assert(maintained == direct, "stream-maintained index diverged from the direct search")
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(tbl))
    assert(meta.bucketSpec.exists(_.numBuckets == Bm25IndexBuckets), "append changed the bucket layout")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
  }

  test("streaming vector ingest feeds the q125 IVF+PQ index; append equals rebuild (the ANN maintenance path)") {
    // the ingest job that keeps the composed ANN index current: new
    // vectors arrive as a stream (already quantized under the frozen
    // corpus scale — the index-build-time contract), each micro-batch
    // APPENDS through appendIvfPqIndex under the same frozen
    // centroids/codebooks. Search off the accumulated index must be
    // byte-equal to a one-shot rebuild over the full corpus.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.KMeans
    import graft.sim.Similarity
    import graft.queries.DedupSimQueries.{AnnK, Dims, IvfPqCells, IvfPqNprobe, IvfPqRerank, PqCodewords, PqSubDim, PqSubspaces}
    val qAll = KMeans
      .quantizeShifted(graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding")
      .localCheckpoint()
    val rows = qAll
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
      .toSeq
    val boot = rows.takeWhile(_._1 < math.max(IvfPqCells, PqCodewords).toLong) ++
      rows.dropWhile(_._1 < math.max(IvfPqCells, PqCodewords).toLong).take(100)
    val rest = rows.drop(boot.size)
    val streamPath = "target/graft_ivfpq_stream_spec"
    val rebuildPath = "target/graft_ivfpq_rebuild_spec"
    def cleanup(): Unit = Seq(streamPath, rebuildPath).foreach { p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    }
    cleanup()
    // bootstrap: day-0 build holds the convention vectors (ids 0..15)
    Similarity.writeIvfPqIndex(
      boot.toDF("vec_id", "qa"), IvfPqCells, PqSubspaces, PqSubDim, PqCodewords, streamPath)
    val stream = MemoryStream[(Long, Seq[Long])]
    val query = stream
      .toDF()
      .toDF("vec_id", "qa")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendIvfPqIndex(qAll, batch, IvfPqCells, PqSubspaces, PqSubDim, PqCodewords, streamPath)
      }
      .start()
    try {
      rest.grouped(math.max(rest.size / 3, 1)).foreach { c =>
        stream.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    Similarity.writeIvfPqIndex(qAll, IvfPqCells, PqSubspaces, PqSubDim, PqCodewords, rebuildPath)
    val probes = qAll.filter(col("vec_id") < 5)
    def search(path: String) =
      Similarity
        .ivfPqTopKFromIndex(
          spark, path, qAll, probes,
          IvfPqCells, PqSubspaces, PqSubDim, PqCodewords, IvfPqNprobe, IvfPqRerank, AnnK, Dims)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(search(streamPath) == search(rebuildPath), "stream-maintained IVF+PQ index diverged from rebuild")
    cleanup()
  }

  test("streaming gram-count ingest matches batch counts (the q126/q130 marking maintenance path)") {
    // the ingest job that keeps the corpus-wide duplicate-window
    // table current: arriving documents explode through the SAME
    // stateless gram builder the batch path uses, counts accumulate
    // in a streaming aggregate (pure sums — merge order cannot change
    // them). The final counts — and therefore the dup-window set that
    // marks spans — must equal batch exactly, or a streamed corpus
    // would clean differently than a batch-rebuilt one.
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    import graft.queries.DedupSimQueries.SubstrGramLen
    val docs = Tables
      .documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .toSeq
    val stream = MemoryStream[(Long, String)]
    val counts = Dedup
      .substringGramRows(stream.toDF().toDF("doc_id", "text"), "doc_id", "text", SubstrGramLen)
      .groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
    val query = counts.writeStream
      .format("memory")
      .queryName("gram_stream")
      .outputMode("update")
      .start()
    try {
      docs.grouped(math.max(docs.size / 3, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    // update mode emits one row per key per batch it changed in —
    // counts are monotone, so the max per key is the final state
    val streamed = spark
      .table("gram_stream")
      .groupBy(col("h"))
      .agg(max(col("cnt")).as("cnt"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val batch = Dedup
      .substringGramRows(Tables.documents(spark, sf), "doc_id", "text", SubstrGramLen)
      .groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(streamed.keySet == batch.keySet, "gram hash sets differ")
    batch.foreach { case (h, c) => assert(streamed(h) == c, s"count differs for gram $h") }
    val dupStream = streamed.filter(_._2 > 1).keySet
    val dupBatch = batch.filter(_._2 > 1).keySet
    assert(dupStream == dupBatch, "the dup-window mark set diverged")
    assert(dupBatch.nonEmpty, "corpus must contain duplicate windows for the twin to mean anything")
  }

  test("streaming cell-index vector ingest maintains the persisted partition under frozen geometry") {
    // the maintenance path for the k-means family's ingest artifact
    // (CellIndex): vectors arriving as a stream append per micro-batch
    // through the same CellIndex.append the batch path uses
    // (foreachBatch — the bucketed-table sink bridge). Every streamed
    // vector must land exactly where the frozen-geometry assignment
    // puts it (stored centroids + stored quantization scale — no
    // Lloyd update, no one else's cluster moves), the bucket layout
    // must survive every micro-batch, and the additive corpus stamp
    // must account for the whole stream so a later ensure() validates
    // instead of rebuilding.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{CellIndex, KMeans}
    import graft.queries.DedupSimQueries.{Dims, KmeansIters, KmeansK, SemClusterTarget}
    val tbl = "graft_cell_stream_spec"
    val emb = Tables.embeddings(spark, sf)
    // day-0 build over the dense id prefix; the stream delivers the rest
    val base = emb.filter(col("vec_id") < 400)
    val tail = emb
      .filter(col("vec_id") >= 400)
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .as[(Long, Seq[Float], Int)]
      .collect()
      .toSeq
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    CellIndex.invalidateMemo(tbl)
    CellIndex.ensure(base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, tbl)
    val stream = MemoryStream[(Long, Seq[Float], Int)]
    val query = stream
      .toDF()
      .toDF("vec_id", "embedding", "label")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CellIndex.append(batch, "vec_id", "embedding", Some("label"), tbl)
      }
      .start()
    try {
      tail.grouped(math.max(tail.size / 3, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    // every streamed vector sits at its frozen-geometry assignment
    val cents = spark.table(s"${tbl}_cents").localCheckpoint()
    val scale = java.lang.Double.longBitsToDouble(
      cents.filter(col("level") === "scale").select(col("cid")).head().getLong(0)
    )
    val qTail = emb
      .filter(col("vec_id") >= 400)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(
        col("vec_id"),
        expr(s"transform(v, x -> CAST(round(127 * x / ${java.lang.Double.toString(scale)}, 0) AS BIGINT) + ${KMeans.Shift})")
          .as("qa")
      )
    val expect = KMeans
      .assignFrozen(
        qTail,
        cents.filter(col("level") === "fine").select(col("cid"), col("cell"), col("ca")),
        cents.filter(col("level") === "coarse").select(col("cid"), col("ca")),
        Dims
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val stored = CellIndex.readPrimary(spark, tbl).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored.size == 500, s"index must cover the whole corpus, has ${stored.size}")
    expect.foreach { case (id, c) =>
      assert(stored.get(id).contains(c), s"streamed vec $id: stored ${stored.get(id)}, frozen-assign $c")
    }
    // layout survived every micro-batch append
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(tbl))
    assert(meta.bucketSpec.exists(_.numBuckets == CellIndex.Buckets), "append changed the bucket layout")
    // the additive stamp accounts for the whole corpus: a fresh
    // session's ensure() over base+stream must validate, not rebuild
    // (geometry is count-stable here: k = max(8, 500/64) = max(8, 400/64))
    CellIndex.invalidateMemo(tbl)
    val revalidated =
      CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, tbl)
    assert(revalidated.filter(col("probe") === 1).count() == 500, "post-stream ensure() should validate the appended stamps")
  }

  test("streaming occupancy monitor closes the q142 loop on a LIVE index: flag -> in-place retrain -> consumers unchanged") {
    // the monitor→act loop run where it actually lives: a vector
    // stream maintains the persisted cell partition per micro-batch
    // (frozen-geometry appends — occupancy can only GROW, no Lloyd
    // update moves anyone), the q142 occupancy aggregate watches the
    // table's own buckets after every batch, and the raised flag
    // drives the ACT path (CellIndex.retrainIfOvergrown) at the
    // window close. The retrained partition must be exactly what a
    // from-scratch ingest over the full corpus builds — the act is
    // answer-invisible to every consumer — and the stamps must keep
    // serving the metadata-only read path afterwards.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CellIndex
    import graft.queries.DedupSimQueries.{Dims, KmeansIters, KmeansK, SemClusterTarget}
    val tbl = "graft_cell_monitor_spec"
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 150)
    val tail = emb
      .filter(col("vec_id") >= 150)
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .as[(Long, Seq[Float], Int)]
      .collect()
      .toSeq
      .sortBy(_._1)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    CellIndex.invalidateMemo(tbl)
    CellIndex.ensure(base, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, tbl)
    // read through CellIndex.read — a bare spark.table would serve the
    // session's CACHED pre-append file listing (the exact trap the
    // maintenance path documents) and the monitor would watch a frozen
    // snapshot instead of the live index
    def maxOcc: Long =
      CellIndex.readPrimary(spark, tbl).groupBy(col("cluster")).count().agg(max("count")).head().getLong(0)
    // a threshold the growing corpus must cross: the day-0 max
    // occupancy — the corpus more than triples under frozen
    // assignment, so some cluster grows past it (deterministic here:
    // fixed corpus, deterministic training)
    val overFactor = maxOcc.toDouble / SemClusterTarget
    val verdicts = scala.collection.mutable.ArrayBuffer[Boolean]() // per-batch q142 flag, watched LIVE
    val stream = MemoryStream[(Long, Seq[Float], Int)]
    val query = stream
      .toDF()
      .toDF("vec_id", "embedding", "label")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CellIndex.append(batch, "vec_id", "embedding", Some("label"), tbl)
        verdicts += maxOcc.toDouble > overFactor * SemClusterTarget
        ()
      }
      .start()
    try {
      tail.grouped(math.max(tail.size / 4, 1)).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(verdicts.last, s"the live monitor never flagged (verdicts: $verdicts) — the loop was not exercised")
    val occBefore = maxOcc
    // ACT on the raised flag: in-place retrain under the recomputed k
    assert(
      CellIndex.retrainIfOvergrown(
        emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, tbl, overFactor),
      "the raised flag must trigger the retrain"
    )
    assert(
      maxOcc <= occBefore || maxOcc <= 2L * SemClusterTarget,
      s"retrain improved nothing: max occupancy $occBefore -> $maxOcc"
    )
    // the retrained index ≡ a from-scratch build over the full corpus
    // (deterministic training): consumers' answers are unchanged
    val freshTbl = s"${tbl}_fresh"
    spark.sql(s"DROP TABLE IF EXISTS $freshTbl")
    CellIndex.ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, freshTbl)
    def snap(t: String): Map[(Long, Int), (Long, Seq[Long], Int)] =
      spark.table(t).collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getSeq[Long](3).toArray.toSeq, r.getInt(4)))).toMap
    val live = snap(tbl)
    val fresh = snap(freshTbl)
    assert(live.keySet == fresh.keySet, s"retrained index covers ${live.size} vectors, from-scratch ${fresh.size}")
    live.foreach { case (id, row) => assert(row == fresh(id), s"vec $id diverged from the from-scratch build") }
    // and the retrained table still serves the next session's
    // metadata-only read path (stamps + source anchor restored)
    CellIndex.invalidateMemo(tbl)
    val scans0 = CellIndex.fingerprintScans.get()
    assert(
      CellIndex
        .ensure(emb, "vec_id", "embedding", Some("label"), KmeansK, SemClusterTarget, KmeansIters, Dims, tbl)
        .filter(col("probe") === 1)
        .count() == 500,
      "post-retrain ensure() should validate, not rebuild"
    )
    assert(CellIndex.fingerprintScans.get() == scans0, "post-retrain validation should be metadata-only")
  }

  test("streaming appends across MANY k-steps stay inside the geometry hysteresis band (no per-batch retrain)") {
    // the r12 defect's streaming face, in the regime every earlier
    // twin avoided (they lived where kMin dominates, so k never
    // stepped): target TINY (4) so k = n/target steps on every
    // micro-batch — before the hysteresis band, EACH batch would have
    // handed the next consumer's ensure() a full corpus re-train.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CellIndex
    import graft.queries.DedupSimQueries.{Dims, KmeansIters}
    val tbl = "graft_cell_kstep_stream_spec"
    val kMin = 2; val target = 4
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 200) // k = 200/4 = 50; band: n <= 2*4*50 = 400
    def tailRange(lo: Int, hi: Int) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .as[(Long, Seq[Float], Int)]
      .collect()
      .toSeq
      .sortBy(_._1)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    CellIndex.invalidateMemo(tbl)
    CellIndex.ensure(base, "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, tbl)
    def geomOf: String = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(tbl))
      .properties(CellIndex.GeomProp)
    val g1 = geomOf
    assert(g1.startsWith("k=50,"), s"build geometry should be k=200/4=50, got $g1")
    val stream = MemoryStream[(Long, Seq[Float], Int)]
    val query = stream
      .toDF()
      .toDF("vec_id", "embedding", "label")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CellIndex.append(batch, "vec_id", "embedding", Some("label"), tbl)
      }
      .start()
    try {
      // 184 rows in 3 micro-batches: k would step 50 -> 96, but
      // n=384 keeps mean occupancy 384/50 = 7.68 inside the 2x4 band
      tailRange(200, 384).grouped(62).foreach { b =>
        stream.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    CellIndex.invalidateMemo(tbl)
    val inBand = CellIndex.ensure(
      emb.filter(col("vec_id") < 384), "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, tbl)
    assert(inBand.filter(col("probe") === 1).count() == 384, "the streamed appends must all be served")
    assert(geomOf == g1, "in-band streamed k-steps must NOT retrain — the stored geometry serves")
    // ...and once the stream pushes the corpus past the band (n=500 >
    // 400), the next consumer's ensure() pays the corpus pass ONCE.
    // A FRESH MemoryStream: a new query over the first one would
    // replay its batches from offset 0 and double-append.
    val stream2 = MemoryStream[(Long, Seq[Float], Int)]
    val query2 = stream2
      .toDF()
      .toDF("vec_id", "embedding", "label")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CellIndex.append(batch, "vec_id", "embedding", Some("label"), tbl)
      }
      .start()
    try {
      tailRange(384, 500).grouped(58).foreach { b =>
        stream2.addData(b)
        query2.processAllAvailable()
      }
    } finally query2.stop()
    CellIndex.invalidateMemo(tbl)
    val rebuilt = CellIndex.ensure(
      emb, "vec_id", "embedding", Some("label"), kMin, target, KmeansIters, Dims, tbl)
    assert(rebuilt.filter(col("probe") === 1).count() == 500)
    assert(geomOf.startsWith("k=125,"), s"past the band the ensure() must retrain under k=500/4, got $geomOf")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
