package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Events

class EventsSpec extends AnyFunSuite {
  import TestSpark._

  private val ns = Events.NanosPerSecond

  /** Hand-built stream: user 1 has two sessions (gap of 3h between
    * event 2 and 3), user 2 one session.
    */
  private def tiny = {
    import spark.implicits._
    Seq(
      // (event_id, ts_nanos, user_id, event_type, value, props)
      (1L, 1000L * ns, 1L, "click", 1.10, """{"k": 2}"""),
      (2L, 2000L * ns, 1L, "click", 2.20, """{"k": 3}"""),
      (3L, (2000L + 3 * 3600) * ns, 1L, "purchase", 3.30, """{"k": 4}"""),
      (4L, 1500L * ns, 2L, "click", 4.40, """{"k": 5}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("sessionize splits on gaps > threshold and keeps order") {
    val sessions = Events.sessionStats(tiny).collect()
    assert(sessions.length == 3)
    val u1 = sessions.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(u1.map(_.getLong(1)).toSeq == Seq(0L, 1L)) // session ids 0,1
    assert(u1(0).getLong(2) == 2L) // first session has 2 events
    assert(u1(0).getLong(6) == 1000L) // duration_s = 2000-1000
    assert(math.abs(u1(0).getDouble(5) - 3.30) < 1e-9) // exact centi-sum
    assert(u1(1).getLong(2) == 1L)
  }

  test("tumbling windows floor to the window start") {
    val w = Events.tumblingAgg(tiny, windowNanos = 3600L * ns)
    val starts = w.select("window_start_ns").as[Long](spark.implicits.newLongEncoder).collect().sorted
    assert(starts.forall(_ % (3600L * ns) == 0))
    // events at 1000s,1500s,2000s land in window 0; event at 2000s+3h in window 3
    assert(starts.head == 0L)
  }

  test("json props extraction aggregates k per type") {
    val r = Events.jsonPropsAgg(tiny).collect().map(r => r.getString(0) -> r).toMap
    assert(r("click").getLong(2) == 2L + 3L + 5L) // sum_k
    assert(r("click").getLong(5) == 1L) // n_even: k=2
    assert(r("purchase").getLong(3) == 4L && r("purchase").getLong(4) == 4L)
  }

  test("q37-q39 run on testdata with sane shapes") {
    val q = SparkEntry.queries
    val s37 = q("q37_sessionize")(spark, sf)
    assert(s37.columns.toSeq == Seq("user_id", "session_id", "n_events", "session_start_us", "session_end_us", "total_value", "duration_s"))
    // sessions partition all events
    val totalEvents = s37.agg(sum("n_events")).head.getLong(0)
    assert(totalEvents == 1000L)
    val s38 = q("q38_window_agg")(spark, sf)
    assert(s38.select(sum("n_events")).head.getLong(0) == 1000L)
    val s39 = q("q39_json_extract")(spark, sf)
    assert(s39.select(sum("n")).head.getLong(0) == 1000L)
    assert(s39.filter(col("min_k") < 0 || col("max_k") > 99).count() == 0)
  }

  test("q68 funnel stages shrink monotonically and rates are consistent") {
    val r = SparkEntry.queries("q68_funnel")(spark, sf).head
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np, s"funnel not monotone: $nv >= $nc >= $np")
    assert(nv > 0 && np > 0, "degenerate funnel (no entries or no conversions)")
    assert(r.getDouble(3) == math.round(nc.toDouble / nv * 10000) / 10000.0)
    assert(r.getDouble(4) == math.round(np.toDouble / nc * 10000) / 10000.0)
  }

  test("q69 retention: offset 0 is each cohort's peak and covers every user") {
    val ret = SparkEntry.queries("q69_retention")(spark, sf).cache()
    assert(ret.filter(col("week_offset") < 0).count() == 0)
    // offset-0 count = cohort size >= count at any later offset
    val byCohort = ret
      .groupBy("cohort_week")
      .agg(
        max(when(col("week_offset") === 0, col("n_users")).otherwise(0L)).as("w0"),
        max(when(col("week_offset") > 0, col("n_users")).otherwise(0L)).as("later")
      )
    assert(byCohort.filter(col("w0") < col("later")).count() == 0, "a later offset exceeds cohort size")
    val users = graft.sources.Tables.events(spark, sf).select("user_id").distinct().count()
    val w0Total = ret.filter(col("week_offset") === 0).agg(sum("n_users")).head.getLong(0)
    assert(w0Total == users, s"offset-0 totals $w0Total != $users distinct users")
    ret.unpersist()
  }

  test("q74 attribution matches a brute-force inequality join") {
    val horizon = graft.queries.EventsQueries.AttributionHorizonUs
    val out = SparkEntry.queries("q74_attribution")(spark, sf).cache()
    val ev = graft.sources.Tables
      .events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
    val p = ev
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
    val c = ev
      .filter(col("event_type") === "click")
      .select(col("event_id").as("bf_click"), col("user_id"), col("ts_us").as("cts"))
    // brute force: the O(n·m)-per-key inequality join the operator avoids
    val bf = p
      .join(c, Seq("user_id"))
      .filter(col("cts") <= col("ts_us") && col("ts_us") - col("cts") <= horizon)
      .groupBy(col("purchase_id"))
      .agg(max(struct(col("cts"), col("bf_click"))).as("m"))
      .select(col("purchase_id"), col("m.bf_click").as("bf_click"))
    val joined = out.join(bf, Seq("purchase_id"), "left").cache()
    assert(out.count() == p.count(), "every purchase appears exactly once")
    assert(joined.filter(col("click_id") =!= col("bf_click")).count() == 0)
    assert(joined.filter(col("click_id").isNull && col("bf_click").isNotNull).count() == 0)
    assert(joined.filter(col("click_id").isNotNull && col("bf_click").isNull).count() == 0)
    assert(out.filter(col("gap_us") < 0 || col("gap_us") > horizon).count() == 0)
    assert(out.filter(col("click_id").isNotNull).count() > 0, "no purchase attributed — data or horizon wrong")
    joined.unpersist()
    out.unpersist()
  }

  test("q77 sliding windows hold every event exactly width/hop times") {
    import graft.queries.EventsQueries.{SlideHopUs, SlideWindowHops}
    val out = SparkEntry.queries("q77_sliding_windows")(spark, sf).cache()
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    val totalSlots = out.agg(sum(col("n_events"))).head.getLong(0)
    assert(totalSlots == nEvents * SlideWindowHops, s"window membership $totalSlots != $nEvents x $SlideWindowHops")
    assert(out.filter(col("window_start_us") % SlideHopUs =!= 0).count() == 0, "window starts must align to the hop")
    assert(out.filter(col("n_users") > col("n_events")).count() == 0)
    out.unpersist()
  }

  test("q120: median/MAD and spike flags equal a driver-side recomputation") {
    import graft.queries.EventsQueries.SpikeMadFactor
    val rows = SparkEntry
      .queries("q120_rate_spike")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // discrete median by the same (value, bucket) index-selection rule
    def med(xs: Seq[(Long, Long)]): Long = xs.sorted.apply(((xs.size - 1) / 2).toInt)._1
    val counts = rows.map { case (b, n, _, _, _) => (n, b) }.toSeq
    val m = med(counts)
    val mad = med(rows.map { case (b, n, _, _, _) => (math.abs(n - m), b) }.toSeq)
    rows.foreach { case (b, n, gotMed, gotMad, spike) =>
      assert(gotMed == m && gotMad == mad, s"bucket $b stats ($gotMed, $gotMad) != ($m, $mad)")
      assert(spike == (n - m > SpikeMadFactor * mad), s"bucket $b flag wrong: n=$n")
    }
    // every statistic is bucket-frame-sized: one corpus aggregate only
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}
