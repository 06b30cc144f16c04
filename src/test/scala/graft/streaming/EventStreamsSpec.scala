package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  case class Ev(ts: Timestamp, event_type: String, value: Double)

  test("windowed counts aggregate by tumbling event-time window") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams
      .windowedCounts(input.toDF(), "ts", "event_type", "10 minutes")
      .writeStream
      .format("memory")
      .queryName("wc")
      .outputMode("complete")
      .start()
    try {
      input.addData(Ev(ts(1), "click", 1.0), Ev(ts(2), "click", 2.0), Ev(ts(11), "click", 4.0))
      q.processAllAvailable()
      val rows = spark
        .sql("select window.start, n, total_value from wc order by window.start")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 3.0)
      assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 4.0)
    } finally q.stop()
  }

  test("windowed approx distinct tracks per-window cardinality across micro-batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams
      .windowedApproxDistinct(input.toDF(), "ts", "event_type", "10 minutes")
      .writeStream
      .format("memory")
      .queryName("wad")
      .outputMode("complete")
      .start()
    try {
      // Window 10:00-10:10 sees 3 distinct types (one repeated, one arriving
      // in a LATER micro-batch — the sketch must merge across batches);
      // window 10:10-10:20 sees 1.
      input.addData(Ev(ts(1), "click", 1.0), Ev(ts(2), "view", 1.0), Ev(ts(3), "click", 1.0))
      q.processAllAvailable()
      input.addData(Ev(ts(4), "purchase", 1.0), Ev(ts(11), "click", 1.0))
      q.processAllAvailable()
      val rows = spark
        .sql("select window.start, approx_distinct from wad order by window.start")
        .collect()
      assert(rows.length == 2)
      // At rsd=1% and these cardinalities the HLL++ estimate is exact.
      assert(rows(0).getLong(1) == 3L, s"got ${rows(0).getLong(1)}")
      assert(rows(1).getLong(1) == 1L, s"got ${rows(1).getLong(1)}")
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark horizon") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams
      .streamingDedup(input.toDF(), "ts", Seq("event_type"))
      .writeStream
      .format("memory")
      .queryName("dd")
      .outputMode("append")
      .start()
    try {
      input.addData(Ev(ts(1), "a", 1.0), Ev(ts(1), "a", 1.0), Ev(ts(1), "b", 2.0))
      q.processAllAvailable()
      input.addData(Ev(ts(1), "a", 1.0)) // duplicate across batches: still dropped
      q.processAllAvailable()
      assert(spark.sql("select count(*) from dd").head().getLong(0) == 2)
    } finally q.stop()
  }

  test("retry dedup drops same-key events with DIFFERENT timestamps") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams
      .streamingDedupRetries(input.toDF(), "ts", Seq("event_type"), "10 minutes")
      .writeStream
      .format("memory")
      .queryName("ddretry")
      .outputMode("append")
      .start()
    try {
      // A producer retry restamps: same key, fresh ts — key+ts dedup would
      // keep both; within-watermark key dedup must keep ONE.
      input.addData(Ev(ts(1), "a", 1.0), Ev(ts(2), "a", 1.0), Ev(ts(2), "b", 2.0))
      q.processAllAvailable()
      input.addData(Ev(ts(3), "a", 1.0)) // still within the horizon
      q.processAllAvailable()
      assert(spark.sql("select count(*) from ddretry").head().getLong(0) == 2)
    } finally q.stop()
  }

  test("streaming dedup runs on the RocksDB state store provider") {
    // The corpus-scale recommendation (COVERAGE §2.6 / curateFrom notes) is
    // RocksDB-backed state — this proves the dedup state machine actually
    // runs on it, not just the in-memory default. Provider is a per-query
    // conf read at START; reset after so sibling tests keep the default.
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val q = EventStreams
      .streamingDedup(input.toDF(), "ts", Seq("event_type"))
      .writeStream
      .format("memory")
      .queryName("ddr")
      .outputMode("append")
      .start()
    try {
      input.addData(Ev(ts(1), "a", 1.0), Ev(ts(1), "b", 2.0))
      q.processAllAvailable()
      input.addData(Ev(ts(1), "a", 1.0), Ev(ts(1), "c", 3.0)) // cross-batch dup dropped
      q.processAllAvailable()
      assert(spark.sql("select count(*) from ddr").head().getLong(0) == 3)
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("session_window groups by inactivity gap") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    case object _marker
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = EventStreams
      .sessionWindows(df, "ts", "user_id", gap = "5 minutes", watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("sw")
      .outputMode("complete")
      .start()
    try {
      // user 7: events at 10:01,10:03 (one session), 10:20 (a second one)
      input.addData((ts(1), 7L), (ts(3), 7L), (ts(20), 7L))
      q.processAllAvailable()
      val rows = spark.sql("select n_events from sw order by session_window.start").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions on timeout") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .sessionize(input.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("fs")
      .outputMode("append")
      .start()
    try {
      input.addData(EventStreams.Event(9L, ts(1)), EventStreams.Event(9L, ts(3)))
      q.processAllAvailable()
      // No session yet: watermark at 10:03, timeout at 10:08.
      assert(spark.sql("select count(*) from fs").head().getLong(0) == 0)
      // A much later event pushes the watermark past the timeout.
      input.addData(EventStreams.Event(1L, ts(30)))
      q.processAllAvailable()
      input.addData(EventStreams.Event(1L, ts(45))) // advance again to flush timers
      q.processAllAvailable()
      val rows = spark
        .sql("select user_id, n_events from fs where user_id = 9")
        .collect()
      assert(rows.length == 1 && rows.head.getLong(1) == 2)
    } finally q.stop()
  }

  test("streaming funnel finalizes stages in event-time order under out-of-order arrival") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.TypedEvent
    val input = MemoryStream[TypedEvent]
    // 10-minute conversion window, zero-delay watermark: the watermark for
    // batch N is batch N-1's max event time, so finalization is driven
    // entirely by later batches advancing it.
    val q = EventStreams
      .streamingFunnel(input.toDS(), windowMs = 10 * 60 * 1000, watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("funnel")
      .outputMode("append")
      .start()
    def stages(): Map[Long, Seq[(String, Timestamp)]] = spark
      .sql("select user_id, stage, ts from funnel order by user_id, ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    try {
      // Batch 1 — deliberately out of PROCESSING order: user 7's click is
      // added before its view; user 9 clicks BEFORE any view (must never
      // count); user 8 views only.
      input.addData(
        TypedEvent(7L, ts(2), "click"), TypedEvent(7L, ts(1), "view"),
        TypedEvent(8L, ts(0), "view"),
        TypedEvent(9L, ts(0), "click"), TypedEvent(9L, ts(1), "view"))
      q.processAllAvailable()
      // processAllAvailable drains the follow-up batch too: the watermark
      // advances to 10:02 and its timeout pass finalizes the three views
      // (stage 1). User 7's 10:02 click does NOT finalize (strictly-below
      // rule), and user 9's pre-view click is consumed without counting.
      assert(stages() == Map(
        7L -> Seq(("1_view", ts(1))),
        8L -> Seq(("1_view", ts(0))),
        9L -> Seq(("1_view", ts(1)))))

      // Batch 2: user 8's click lands OUTSIDE its 10-minute window; user 7
      // purchases. The follow-up watermark (10:20) finalizes user 7's
      // buffered click AND purchase in one event-time-ordered fold.
      input.addData(TypedEvent(8L, ts(20), "click"), TypedEvent(7L, ts(5), "purchase"))
      q.processAllAvailable()
      assert(stages()(7L) == Seq(("1_view", ts(1)), ("2_click", ts(2)), ("3_purchase", ts(5))))
      assert(stages()(8L) == Seq(("1_view", ts(0))), "out-of-window click must not convert yet")

      // Batch 3: watermark = 10:30 → user 8's 10:20 click finalizes but is
      // outside view+10min: no stage 2, ever.
      input.addData(TypedEvent(1L, ts(30), "view"))
      q.processAllAvailable()
      assert(stages()(8L) == Seq(("1_view", ts(0))))
      assert(stages()(9L) == Seq(("1_view", ts(1))), "pre-view click must never convert")

      // Batch 4: user 7 already completed its funnel — a fresh view must
      // NOT restart it (state keeps the stage times; one funnel per user,
      // matching the batch query).
      input.addData(TypedEvent(7L, ts(40), "view"))
      q.processAllAvailable()
      input.addData(TypedEvent(1L, ts(55), "view")) // advance watermark past it
      q.processAllAvailable()
      assert(stages()(7L) == Seq(("1_view", ts(1)), ("2_click", ts(2)), ("3_purchase", ts(5))),
        "completed funnel must not re-emit on later events")
    } finally q.stop()
  }

  test("streaming funnel: completed-state retention TTL evicts idle users (bounded state)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.TypedEvent
    val input = MemoryStream[TypedEvent]
    // 5-minute retention after purchase: once the watermark passes it, the
    // user's state evicts, and a reappearance starts a FRESH funnel — the
    // documented bounded-state trade-off (without the TTL the previous
    // test proves no restart ever happens).
    val q = EventStreams
      .streamingFunnel(input.toDS(), windowMs = 10 * 60 * 1000,
        watermarkDelay = "0 seconds", completedRetentionMs = Some(5 * 60 * 1000))
      .writeStream.format("memory").queryName("funnel_ttl").outputMode("append").start()
    def n(user: Long): Long =
      spark.sql(s"select count(*) from funnel_ttl where user_id = $user").head().getLong(0)
    try {
      input.addData(TypedEvent(3L, ts(0), "view"), TypedEvent(3L, ts(1), "click"),
        TypedEvent(3L, ts(2), "purchase"))
      q.processAllAvailable()
      input.addData(TypedEvent(1L, ts(3), "view")) // advance watermark → finalize funnel
      q.processAllAvailable()
      assert(n(3L) == 3, "funnel must complete")
      // The RACE case the event-time boundary exists for: the user's fresh
      // view (10:20, past purchase+5min = 10:07) arrives in the SAME batch
      // as the watermark-advancer, BEFORE any eviction timeout fires — the
      // state is still present, the batch's watermark (10:03) is still
      // pre-boundary, and era membership must be decided by the EVENT
      // time, not by state presence or batch boundaries. A
      // state-presence-based eviction silently swallowed this view.
      input.addData(TypedEvent(1L, ts(10), "view"), TypedEvent(3L, ts(20), "view"))
      q.processAllAvailable()
      input.addData(TypedEvent(1L, ts(30), "view"))
      q.processAllAvailable()
      assert(n(3L) == 4, "post-boundary reappearance must start a fresh funnel")
    } finally q.stop()
  }

  test("stream-static enrich joins the dimension per micro-batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val dim = Seq(("click", "interaction"), ("purchase", "conversion"))
      .toDF("event_type", "category")
    val q = EventStreams
      .enrich(input.toDF(), dim, Seq("event_type"))
      .writeStream
      .format("memory")
      .queryName("en")
      .outputMode("append")
      .start()
    try {
      input.addData(Ev(ts(1), "click", 1.0), Ev(ts(2), "purchase", 2.0), Ev(ts(3), "error", 0.0))
      q.processAllAvailable()
      val rows = spark
        .sql("select event_type, category from en order by event_type")
        .collect()
        .map(r => (r.getString(0), Option(r.getString(1))))
      assert(rows.toSeq == Seq(
        ("click", Some("interaction")),
        ("error", None),
        ("purchase", Some("conversion"))
      ))
    } finally q.stop()
  }

  test("stream-stream interval join pairs keys within the time bound") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val joined = EventStreams.intervalJoin(
      clicks.toDF().toDF("cts", "user_id"),
      buys.toDF().toDF("bts", "uid").withColumnRenamed("uid", "user_id"),
      keyCol = "user_id",
      leftTs = "cts",
      rightTs = "bts",
      within = "10 minutes",
      watermarkDelay = "0 seconds"
    )
    val q = joined
      .selectExpr("l.user_id AS user_id", "cts", "bts")
      .writeStream
      .format("memory")
      .queryName("ij")
      .outputMode("append")
      .start()
    try {
      // user 5 clicks at 10:01; buys at 10:05 (within) and 10:20 (outside);
      // user 6 buys at 10:02 with no click — never emitted.
      clicks.addData((ts(1), 5L))
      buys.addData((ts(5), 5L), (ts(20), 5L), (ts(2), 6L))
      q.processAllAvailable()
      // Advance both watermarks so results finalize.
      clicks.addData((ts(50), 1L)); buys.addData((ts(50), 1L))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, bts from ij where user_id = 5").collect()
      assert(rows.length == 1 && rows.head.getTimestamp(1) == ts(5))
      assert(spark.sql("select count(*) from ij where user_id = 6").head().getLong(0) == 0)
    } finally q.stop()
  }

  test("sessionizer splits gap-separated events arriving in one batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .sessionize(input.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("fs2")
      .outputMode("append")
      .start()
    try {
      // Catch-up batch: three sessions' worth of events for one user at once
      // (10:01-10:03, 10:15, 10:30-10:31). The first two must come out as
      // separate sessions — gap-splitting within the batch, not
      // timeout-merged — once the watermark passes their end + gap.
      input.addData(
        EventStreams.Event(4L, ts(1)), EventStreams.Event(4L, ts(3)),
        EventStreams.Event(4L, ts(15)),
        EventStreams.Event(4L, ts(30)), EventStreams.Event(4L, ts(31))
      )
      q.processAllAvailable()
      // Nudge batch: runs with the watermark at 10:31, past the first two
      // sessions' end + gap (10:08, 10:20) but not the third's (10:36).
      input.addData(EventStreams.Event(1L, ts(32)))
      q.processAllAvailable()
      val closed = spark
        .sql("select start, end, n_events from fs2 where user_id = 4 order by start")
        .collect()
      assert(closed.length == 2, s"expected the 2 earlier sessions closed, got ${closed.toSeq}")
      assert(closed(0).getTimestamp(0) == ts(1) && closed(0).getTimestamp(1) == ts(3))
      assert(closed(0).getLong(2) == 2)
      assert(closed(1).getTimestamp(0) == ts(15) && closed(1).getLong(2) == 1)
      // The open 10:30 session closes once the watermark passes its timeout.
      input.addData(EventStreams.Event(1L, ts(50)))
      q.processAllAvailable()
      input.addData(EventStreams.Event(1L, ts(55)))
      q.processAllAvailable()
      val all = spark.sql("select n_events from fs2 where user_id = 4 order by start").collect()
      assert(all.length == 3 && all(2).getLong(0) == 2)
    } finally q.stop()
  }

  test("sessionizer merges an out-of-order event into a gap-closed session") {
    // watermarkDelay (30 min) > gap (5 min): an event may arrive after the
    // batch that gap-closed its session but before the watermark finalized
    // it. It must merge/extend that session, not start a duplicate one.
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .sessionize(input.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("fs3")
      .outputMode("append")
      .start()
    try {
      // Batch 1: session A (10:01-10:03) and a gap-separated 10:20 event.
      input.addData(
        EventStreams.Event(8L, ts(1)), EventStreams.Event(8L, ts(3)),
        EventStreams.Event(8L, ts(20))
      )
      q.processAllAvailable()
      // Batch 2: out-of-order 10:05 — above the watermark (10:20 - 30 min),
      // inside session A's gap horizon. Must extend A to 10:01-10:05, n=3.
      input.addData(EventStreams.Event(8L, ts(5)))
      q.processAllAvailable()
      // Advance the watermark far past everything to flush both sessions.
      input.addData(EventStreams.Event(1L, ts(90)))
      q.processAllAvailable()
      input.addData(EventStreams.Event(1L, ts(95)))
      q.processAllAvailable()
      val rows = spark
        .sql("select start, end, n_events from fs3 where user_id = 8 order by start")
        .collect()
      assert(rows.length == 2, s"expected 2 sessions, got ${rows.toSeq}")
      assert(rows(0).getTimestamp(0) == ts(1) && rows(0).getTimestamp(1) == ts(5))
      assert(rows(0).getLong(2) == 3, s"out-of-order event not merged: ${rows.toSeq}")
      assert(rows(1).getTimestamp(0) == ts(20) && rows(1).getLong(2) == 1)
    } finally q.stop()
  }

  test("streaming top-k finalizes per-window heavy hitters on watermark close " +
    "(exact when capacity covers the keys)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.TypedEvent
    val input = MemoryStream[TypedEvent]
    // 1-hour windows, zero-delay watermark, capacity far above the key
    // count — SpaceSaving is exact there, so the finalized rows must be
    // the true per-window top-2 with zero overcount.
    val q = EventStreams
      .streamingTopK(input.toDS(), windowMs = 60 * 60 * 1000, k = 2,
        capacity = 64, watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("topk")
      .outputMode("append")
      .start()
    def rows(): Seq[(Timestamp, Long, Long, Long, Int)] = spark
      .sql("select window_start, user_id, est_count, max_overcount, rank from topk " +
        "order by window_start, rank")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq
    try {
      // Window 10:00: user 1 ×3, user 2 ×2, user 3 ×1 (out of processing
      // order — SpaceSaving folds as events arrive).
      input.addData(
        TypedEvent(2L, ts(5), "click"), TypedEvent(1L, ts(1), "view"),
        TypedEvent(1L, ts(9), "click"), TypedEvent(3L, ts(30), "view"),
        TypedEvent(2L, ts(40), "view"), TypedEvent(1L, ts(50), "view"))
      q.processAllAvailable()
      assert(rows().isEmpty, "window must not finalize before the watermark passes its end")

      // An 11:05 event pushes the watermark past 11:00 → window 10:00
      // finalizes with the exact top-2.
      input.addData(TypedEvent(9L, Timestamp.valueOf("2024-01-01 11:05:00"), "view"))
      q.processAllAvailable()
      val w1 = Timestamp.valueOf("2024-01-01 10:00:00")
      assert(rows() == Seq((w1, 1L, 3L, 0L, 1), (w1, 2L, 2L, 0L, 2)), s"got ${rows()}")

      // Push past 12:00: the 11:00 window (single event) finalizes too,
      // and its state is gone — one row, rank 1.
      input.addData(TypedEvent(4L, Timestamp.valueOf("2024-01-01 12:05:00"), "view"))
      q.processAllAvailable()
      val w2 = Timestamp.valueOf("2024-01-01 11:00:00")
      assert(rows().drop(2) == Seq((w2, 9L, 1L, 0L, 1)), s"got ${rows()}")
    } finally q.stop()
  }

  test("daily counts finalize on watermark close; anomalyOver flags the planted spike exactly") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Day i (from 2024-02-01) gets counts(i) events; day 7 is a 10× spike.
    val counts = Seq(8, 10, 12, 9, 11, 10, 10, 100, 10, 10)
    val day0 = Timestamp.valueOf("2024-02-01 00:00:00").getTime
    def at(day: Int, idx: Int): Timestamp =
      new Timestamp(day0 + day * 86400000L + (idx % 1440) * 60000L)
    val evs = for {
      (c, day) <- counts.zipWithIndex
      i <- 0 until c
    } yield Ev(at(day, i), "click", 1.0)
    val input = MemoryStream[Ev]
    val q = EventStreams
      .streamingDailyCounts(input.toDF(), "ts", "1 hour")
      .writeStream
      .format("memory")
      .queryName("daily")
      .outputMode("append")
      .start()
    val got =
      try {
        // Two micro-batches split mid-stream (the day-5 count must merge
        // across batches), then a far-future sentinel closes every real day.
        val (a, b) = evs.splitAt(evs.length / 2)
        input.addData(a: _*)
        q.processAllAvailable()
        input.addData(b: _*)
        q.processAllAvailable()
        input.addData(Ev(at(30, 0), "click", 1.0))
        q.processAllAvailable()
        val rows = spark
          .sql("select day, n from daily")
          .collect()
          .map(r => (r.getDate(0).toString, r.getLong(1)))
          .toMap
        val expected = counts.zipWithIndex.map { case (c, d) =>
          java.time.LocalDate.of(2024, 2, 1).plusDays(d.toLong).toString -> c.toLong
        }.toMap
        assert(rows == expected, s"finalized days: $rows")
        // A straggler behind the watermark is dropped — day 0 must not
        // re-finalize (which would double-count a closed baseline day).
        input.addData(Ev(at(0, 3), "click", 1.0))
        q.processAllAvailable()
        assert(spark.sql("select * from daily").count() == counts.length.toLong)
        rows
      } finally q.stop()

    // The shared arithmetic over the streamed table: days 7-9 have a full
    // 7-day baseline; the spike's z matches the hand computation and only
    // it flags.
    val dailyDf = got.toSeq
      .map { case (d, n) => (java.sql.Date.valueOf(d), n) }
      .toDF("day", "n")
    val rep = graft.queries.Temporal.anomalyOver(dailyDf).collect()
    assert(rep.length == 3, s"expected days 7-9 scored, got ${rep.toSeq}")
    val spike = rep.find(_.getDate(0).toString == "2024-02-08").get
    val base = counts.take(7)
    val s1 = base.sum.toDouble
    val s2 = base.map(x => x.toLong * x).sum.toDouble
    val z = BigDecimal((100.0 - s1 / 7.0) / math.sqrt((7.0 * s2 - s1 * s1) / 42.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(spike.getDouble(3) == z && spike.getBoolean(4), s"spike row $spike expected z=$z")
    assert(rep.count(_.getBoolean(4)) == 1, "only the planted spike flags")
  }

  test("streamed transitions reproduce the batch event-flow matrix on a shuffled history") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val types = Vector("view", "click", "purchase", "scroll")
    val rnd = new scala.util.Random(7)
    val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    // Globally unique, strictly increasing timestamps: the documented
    // regime where the stream's event_type tiebreak and the batch query's
    // event_id tiebreak cannot diverge.
    val evs = (0 until 80).map { i =>
      (i.toLong, new Timestamp(base + i * 61000L + rnd.nextInt(50000)),
        1L + rnd.nextInt(6), types(rnd.nextInt(4)), 1.0, "{}")
    }
    val dir = graft.TestSpark.tempDir("flow-agreement")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("q_event_flow")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toList

    // Same events through the stream, shuffled within three contiguous
    // slices (bounded lateness inside the 2h watermark), closed by a
    // fresh-user sentinel.
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams
      .streamingTransitions(input.toDS(), watermarkDelay = "2 hours")
      .writeStream
      .format("memory")
      .queryName("trans_agree")
      .outputMode("append")
      .start()
    try {
      evs.grouped(30).foreach { slice =>
        rnd.shuffle(slice).foreach(e =>
          input.addData(EventStreams.TypedEvent(e._3, e._2, e._4)))
        q.processAllAvailable()
      }
      input.addData(EventStreams.TypedEvent(999L, new Timestamp(base + 86400000L), "view"))
      q.processAllAvailable()
      val streamed = graft.queries.Temporal
        .flowOver(spark.sql("select from_type, to_type from trans_agree"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toList
      assert(streamed == batch, s"streamed $streamed\nvs batch $batch")
    } finally q.stop()
  }

  test("idle users evict from transition state; a comeback starts a fresh chain") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(hm: String) = Timestamp.valueOf(s"2024-06-01 $hm:00")
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams
      .streamingTransitions(input.toDS(), watermarkDelay = "1 minute",
        idleTimeoutMs = 30L * 60 * 1000)
      .writeStream
      .format("memory")
      .queryName("trans_idle")
      .outputMode("append")
      .start()
    try {
      input.addData(EventStreams.TypedEvent(1L, t("10:00"), "view"),
        EventStreams.TypedEvent(1L, t("10:05"), "click"))
      q.processAllAvailable()
      // Sentinels advance the watermark: finalize the pair, then pass the
      // 10:35 idle deadline so user 1's chain state evicts.
      for (s <- Seq("10:30", "11:30", "12:30")) {
        input.addData(EventStreams.TypedEvent(99L, t(s), "view"))
        q.processAllAvailable()
      }
      // The comeback event: with the chain evicted it must NOT pair with
      // the 10:05 click.
      input.addData(EventStreams.TypedEvent(1L, t("12:40"), "purchase"))
      q.processAllAvailable()
      input.addData(EventStreams.TypedEvent(99L, Timestamp.valueOf("2024-06-02 12:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, from_type, to_type from trans_idle where user_id = 1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toList
      assert(rows == List((1L, "view", "click")), s"got $rows")
    } finally q.stop()
  }

  test("streamed attribution reproduces the batch channel rollup on a shuffled history") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val types = Vector("view", "click", "purchase", "scroll")
    val rnd = new scala.util.Random(11)
    val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    // Globally unique, strictly increasing timestamps: the documented
    // regime where the stream's event_type tiebreak and the batch query's
    // event_id tiebreak cannot diverge.
    val evs = (0 until 80).map { i =>
      (i.toLong, new Timestamp(base + i * 61000L + rnd.nextInt(50000)),
        1L + rnd.nextInt(6), types(rnd.nextInt(4)), rnd.nextInt(10000) / 100.0, "{}")
    }
    val dir = graft.TestSpark.tempDir("attr-agreement")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("q_attribution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList

    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams
      .streamingAttribution(input.toDS(), watermarkDelay = "2 hours")
      .writeStream
      .format("memory")
      .queryName("attr_agree")
      .outputMode("append")
      .start()
    try {
      evs.grouped(30).foreach { slice =>
        rnd.shuffle(slice).foreach(e =>
          input.addData(EventStreams.ValuedEvent(e._3, e._2, e._4, e._5)))
        q.processAllAvailable()
      }
      // Sentinel advances the watermark past every real event; a view
      // emits no credited row, so the rollup is untouched by it... except
      // for the sentinel user's own channels, which never purchase.
      input.addData(EventStreams.ValuedEvent(999L, new Timestamp(base + 86400000L), "view", 0.0))
      q.processAllAvailable()
      val streamed = graft.queries.Temporal
        .attributionOver(spark.sql("select channel, cents from attr_agree"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      assert(streamed == batch, s"streamed $streamed\nvs batch $batch")
    } finally q.stop()
  }

  test("idle users evict from attribution state; a comeback purchase credits direct") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(hm: String) = Timestamp.valueOf(s"2024-06-01 $hm:00")
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams
      .streamingAttribution(input.toDS(), watermarkDelay = "1 minute",
        idleTimeoutMs = 30L * 60 * 1000)
      .writeStream
      .format("memory")
      .queryName("attr_idle")
      .outputMode("append")
      .start()
    try {
      input.addData(EventStreams.ValuedEvent(1L, t("10:00"), "click", 0.0),
        EventStreams.ValuedEvent(1L, t("10:05"), "purchase", 5.0))
      q.processAllAvailable()
      // Sentinels advance the watermark: finalize the purchase (credited
      // to the 10:00 click), then pass the idle deadline so user 1's
      // last-touch state evicts.
      for (s <- Seq("10:30", "11:30", "12:30")) {
        input.addData(EventStreams.ValuedEvent(99L, t(s), "view", 0.0))
        q.processAllAvailable()
      }
      // The comeback purchase: with the touch evicted it must credit
      // "direct", not the 10:00 click.
      input.addData(EventStreams.ValuedEvent(1L, t("12:40"), "purchase", 7.0))
      q.processAllAvailable()
      input.addData(
        EventStreams.ValuedEvent(99L, Timestamp.valueOf("2024-06-02 12:00:00"), "view", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("select channel, cents from attr_idle where user_id = 1 order by ts")
        .collect().map(r => (r.getString(0), r.getLong(1))).toList
      assert(rows == List(("click", 500L), ("direct", 700L)), s"got $rows")
    } finally q.stop()
  }

  test("seasonality over daily counts reproduces the batch weekday volume columns") {
    // Grouping by weekday factors through grouping by day, so summing the
    // anomaly surface's finalized (day, n) table by the shared
    // epoch-anchor weekday must equal q_seasonality's (weekday, wd_name,
    // n_events, share) columns on the same events.
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(23)
    val base = Timestamp.valueOf("2024-04-01 00:00:00").getTime
    val evs = (0 until 200).map { i =>
      (i.toLong, new Timestamp(base + rnd.nextInt(21 * 86400) * 1000L),
        1L + rnd.nextInt(9), Vector("view", "click")(rnd.nextInt(2)), 1.0, "{}")
    }
    val dir = graft.TestSpark.tempDir("seasonality-agreement")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("q_seasonality")(spark, dir)
      .select("weekday", "wd_name", "n_events", "share")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toList
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").as("day"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val viaDaily = graft.queries.Temporal.seasonalityOver(daily)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toList
    assert(viaDaily == batch, s"daily-rollup $viaDaily\nvs batch $batch")
  }

  test("streamed sessions reproduce the batch duration histogram on a shuffled history") {
    // The sessionizer shares the batch query's 30-minute gaps-and-islands
    // contract, and the histogram report shares its exact bucketing
    // (Temporal.durationHistOver + unix_timestamp truncation) — so the
    // streamed finalized sessions must bucket identically to
    // q_session_duration_hist on the same events.
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val base = Timestamp.valueOf("2024-07-01 00:00:00").getTime
    // Clustered bursts with occasional >30-min gaps so multiple sessions
    // per user arise; unique timestamps (the documented tie regime).
    var t = base
    val evs = (0 until 120).map { i =>
      t += (if (rnd.nextInt(5) == 0) 45 * 60 * 1000L else rnd.nextInt(10 * 60 * 1000).toLong + 1)
      (i.toLong, new Timestamp(t), 1L + rnd.nextInt(4), "view", 1.0, "{}")
    }
    val dir = graft.TestSpark.tempDir("sess-hist-agreement")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("q_session_duration_hist")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .sessionize(input.toDS(), gapMs = 30 * 60 * 1000, watermarkDelay = "2 hours")
      .writeStream
      .format("memory")
      .queryName("sess_hist")
      .outputMode("append")
      .start()
    try {
      evs.grouped(40).foreach { slice =>
        rnd.shuffle(slice).foreach(e => input.addData(EventStreams.Event(e._3, e._2)))
        q.processAllAvailable()
      }
      // Sentinel pushes the watermark past every session's end + gap.
      input.addData(EventStreams.Event(999L, new Timestamp(t + 7L * 86400000L)))
      q.processAllAvailable()
      val streamed = graft.queries.Temporal
        .durationHistOver(
          spark.sql(
            "select unix_timestamp(end) - unix_timestamp(start) as dur_s " +
              "from sess_hist where user_id < 999"
          )
        )
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
      assert(streamed == batch, s"streamed $streamed\nvs batch $batch")
    } finally q.stop()
  }

  test("anomaly report refuses a twice-finalized day, else matches the shared arithmetic") {
    val session = spark
    import session.implicits._
    val daily = (0 until 10)
      .map(d =>
        (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(d.toLong)),
          (10 + (d % 3)).toLong))
      .toDF("day", "n")
    val dir = graft.TestSpark.tempDir("daily-report")
    daily.write.parquet(s"$dir/batch=0")
    val viaReport = graft.Engine.anomalyReport(spark, dir).collect().toSeq
    val direct = graft.queries.Temporal.anomalyOver(daily).collect().toSeq
    assert(viaReport == direct, "report must be the shared arithmetic over the table")
    // A second writer re-finalizing one day must fail loudly, not re-sum.
    daily.limit(1).write.parquet(s"$dir/batch=1")
    val ex = intercept[IllegalArgumentException] {
      graft.Engine.anomalyReport(spark, dir)
    }
    assert(ex.getMessage.contains("finalized more than once"), ex.getMessage)
  }
}
