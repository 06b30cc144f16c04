package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over timestamped streams — the streaming
  * surface the reference only hints at (`ConsumeStream`'s unbounded tail,
  * reference: internal/server/server.go:138-158) plus the event-time
  * machinery a training-data pipeline needs once records carry time
  * (SURVEY §2.6: none exists in the reference — no timestamps at all — so
  * these are the documented extension surface).
  *
  * All declarative paths (windows, dedup, session_window) run on Spark's
  * incremental stateful operators: watermark-bounded state, no custom code
  * in the hot path, horizontally scalable by key.
  */
object EventStreams {

  /** Tumbling (or sliding, when `slide` differs) event-time window counts
    * with watermark-bounded state. Late rows beyond `watermarkDelay` are
    * dropped; in append mode a window emits once the watermark passes it.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String,
      slide: Option[String] = None,
      watermarkDelay: String = "10 minutes",
      valueCol: String = "value"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slide.getOrElse(windowDur)), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** Windowed approximate cardinality — the streaming twin of
    * q_approx_distinct. Exact `countDistinct` is unsupported in streaming
    * aggregations (it would need unbounded per-window key state); the
    * HLL++ sketch is the operator that scales: constant bytes per
    * (window, key) regardless of cardinality, partial sketches merge
    * map-side across micro-batches, and watermarking bounds how many
    * windows hold state. rsd defaults to 1% like the batch query.
    */
  def windowedApproxDistinct(
      events: DataFrame,
      tsCol: String,
      distinctCol: String,
      windowDur: String,
      watermarkDelay: String = "10 minutes",
      rsd: Double = 0.01
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"))

  /** The SpaceSaving heavy-hitter summary (Metwally et al. 2005), PURE so
    * its guarantees can be model-checked: a capacity-bounded counter map
    * `key → (count, overestimate)`. When a new key arrives at capacity it
    * EVICTS the minimum counter and inherits its count as the new key's
    * overestimate. For any arrival order, with N items processed:
    *   - estimate ≥ true count ≥ estimate − overestimate,
    *   - overestimate ≤ N / capacity,
    *   - every key with true count > N / capacity is present.
    */
  private[streaming] object SpaceSaving {
    def add(
        counters: Map[Long, (Long, Long)],
        key: Long,
        capacity: Int
    ): Map[Long, (Long, Long)] =
      counters.get(key) match {
        case Some((c, e)) => counters.updated(key, (c + 1, e))
        case None if counters.size < capacity => counters.updated(key, (1L, 0L))
        case None =>
          // Deterministic eviction tiebreak (smallest count, then key) so
          // replays converge.
          val (minKey, (minC, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
          (counters - minKey).updated(key, (minC + 1, minC))
      }
  }

  final case class TopKRow(
      window_start: Timestamp,
      user_id: Long,
      est_count: Long,
      max_overcount: Long,
      rank: Int
  )

  /** Streaming per-window heavy hitters with BOUNDED state on unbounded
    * key cardinality — the streaming counterpart of the batch
    * `q_heavy_hitters`, for when exact per-(window, key) counts (the
    * [[windowedCounts]] shape) would hold one state row per distinct key.
    * Each event-time window keeps ONE SpaceSaving summary of `capacity`
    * counters regardless of how many users appear; when the watermark
    * passes the window's end the top-`k` emit as FINAL rows
    * (est_count with its max_overcount error bound — the SpaceSaving
    * guarantee: true ∈ [est − max_overcount, est]) and the state drops.
    *
    * State per window is `capacity` counters — the scale contract: a
    * bot-heavy window with 10⁸ distinct users costs the same bytes as a
    * quiet one. Events fold as they arrive (no buffering): SpaceSaving's
    * bounds hold for ANY arrival order, so out-of-order delivery affects
    * which non-heavy keys survive eviction but never the guarantees; the
    * checkpoint replays batches exactly-once, so retries converge.
    */
  def streamingTopK(
      events: Dataset[TypedEvent],
      windowMs: Long = 60L * 60 * 1000,
      k: Int = 3,
      capacity: Int = 64,
      watermarkDelay: String = "10 minutes"
  ): Dataset[TopKRow] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .flatMapGroupsWithState[Map[Long, (Long, Long)], TopKRow](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (winStart: Long, evts: Iterator[TypedEvent], state: GroupState[Map[Long, (Long, Long)]]) =>
        if (state.hasTimedOut) {
          // Watermark passed the window end: finalize the top-k, drop state.
          val counters = state.getOption.getOrElse(Map.empty)
          state.remove()
          counters.toSeq
            .sortBy { case (u, (c, _)) => (-c, u) }
            .take(k)
            .zipWithIndex
            .iterator
            .map { case ((u, (c, e)), i) =>
              TopKRow(new Timestamp(winStart), u, c, e, i + 1)
            }
        } else {
          val st0 = state.getOption.getOrElse(Map.empty)
          val st1 = evts.foldLeft(st0)((m, e) => SpaceSaving.add(m, e.user_id, capacity))
          state.update(st1)
          // Wake once the watermark passes the window's end (floored at
          // wm+1 — Spark rejects a timeout at or below the watermark).
          state.setTimeoutTimestamp(
            math.max(winStart + windowMs, state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        }
      }
  }

  /** Daily event-volume counts with watermark-FINAL rows — the streaming
    * feed of the volume-anomaly readout (the batch `q_anomaly_days` over a
    * live log: [[graft.Engine.dailyCountsFrom]] maintains the derived
    * (day, n) table, `Engine.anomalyReport` re-runs the shared
    * `Temporal.anomalyOver` arithmetic over it). State is one count row
    * per OPEN day — calendar-bounded at any event volume — and append
    * mode emits each day exactly once, when the watermark passes
    * midnight, so downstream baselines never see a half-counted day.
    */
  def streamingDailyCounts(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("day"), col("n"))

  /** Streaming exact dedup on `keyCols` + event time within the watermark
    * horizon (same key at a different timestamp is a distinct event) —
    * `dropDuplicates` keeps per-key state only until the watermark passes,
    * the standard unbounded-stream dedup pattern for ingest pipelines.
    */
  def streamingDedup(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(keyCols :+ tsCol)

  /** Retry dedup: duplicates share `keyCols` but carry DIFFERENT event
    * times (an at-least-once producer restamping its retries), so the
    * key+ts dedup above would pass them all through.
    * `dropDuplicatesWithinWatermark` suppresses re-sightings of a key
    * until the watermark passes its first sighting plus the delay —
    * per-key state stays watermark-bounded, where a bare
    * `dropDuplicates(keyCols)` would grow state forever. The same key
    * re-appearing after the horizon is a new event by contract.
    */
  def streamingDedupRetries(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Declarative sessionization: Spark's native `session_window` with an
    * inactivity gap — the streaming twin of the batch gaps-and-islands
    * query (`q_sessionize`).
    */
  def sessionWindows(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Watermarked stream-stream interval join: each left row pairs with
    * right rows of the same key whose time falls in
    * `[leftTs, leftTs + within]`. Both sides carry watermarks and the join
    * condition bounds event time in both directions, so Spark can size the
    * join state and evict it as the watermark advances — the unbounded-
    * state trap of a naive stream-stream equi-join never opens. State and
    * shuffle are keyed, horizontally scalable.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      within: String = "10 minutes",
      watermarkDelay: String = "10 minutes"
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(
      r,
      expr(
        s"""l.$keyCol = r.$keyCol AND
            r.$rightTs >= l.$leftTs AND
            r.$rightTs <= l.$leftTs + interval $within"""
      )
    )
  }

  /** Stream-static enrichment join: the streaming side joins a batch
    * dimension table. Stateless — the static side is re-planned per
    * micro-batch (broadcast when small), so no watermark or join state is
    * needed; the standard pattern for decorating an event stream with
    * slowly-changing dimensions.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      broadcastDim: Boolean = true
  ): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, keyCols, "left")
  }

  // ------------------------------------------------------- custom state

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(startMs: Long, endMs: Long, n: Long)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` with
    * event-time timeout: sessions close `gap` after their last event once
    * the watermark passes — the escape hatch for session logic
    * `session_window` can't express (per-session enrichment, caps, early
    * emission). State is per-key and watermark-bounded like the built-in.
    *
    * State holds EVERY not-yet-final session (a list, oldest first), not
    * just the open one: a session is only immutable — and only emitted —
    * once the watermark passes `end + gap`, because until then an
    * out-of-order event above the watermark (possible whenever
    * watermarkDelay > gap) can still extend it or merge into it. Emitting
    * gap-closed sessions as soon as the batch splits them (the previous
    * behaviour) produced split/duplicate session rows for the same user
    * interval in exactly that case.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"
  ): Dataset[Session] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (user: Long, evts: Iterator[Event], state: GroupState[List[SessionState]]) =>
        // Merge pending sessions with this batch's events in time order,
        // splitting wherever the inactivity gap is exceeded — the same
        // gaps-and-islands semantics as the batch q_sessionize. The timeout
        // path (evts empty) reuses the same code: merged == pending.
        val incoming = evts.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)).toArray
        val items = (state.getOption.getOrElse(Nil) ++ incoming).sortBy(s => (s.startMs, s.endMs))
        val merged = items.foldLeft(List.empty[SessionState]) {
          case (cur :: closed, it) if it.startMs <= cur.endMs + gapMs =>
            SessionState(cur.startMs, math.max(cur.endMs, it.endMs), cur.n + it.n) :: closed
          case (acc, it) => it :: acc
        }.reverse
        // Finalized = the watermark passed end + gap: the watermark filter
        // guarantees no future event can fall inside or adjacent to it.
        val wm = state.getCurrentWatermarkMs()
        val (finalized, pending) = merged.partition(_.endMs + gapMs < wm)
        if (pending.isEmpty) state.remove()
        else {
          state.update(pending)
          // Wake when the earliest pending session becomes finalizable.
          state.setTimeoutTimestamp(math.max(pending.map(_.endMs + gapMs).min, wm + 1))
        }
        finalized.iterator
          .map(s => Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
      }
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)

  final case class TransitionState(pending: List[(Long, String)], last: Option[(Long, String)])
  final case class TransitionRow(
      user_id: Long,
      from_type: String,
      to_type: String,
      from_ts: Timestamp,
      to_ts: Timestamp
  )

  /** The transition fold, PURE so it can be model-checked: buffer incoming
    * events, finalize everything strictly below the watermark in EVENT-TIME
    * order (ties break on event_type — the streaming contract; the batch
    * `q_event_flow` breaks ties on event_id, so the two agree whenever a
    * user's timestamps are unique, the practical case at µs granularity),
    * and emit one (from, to) row per consecutive pair. `last` carries the
    * newest finalized event across batches so chains continue seamlessly;
    * transitions are immutable once emitted because nothing can finalize
    * below the watermark twice.
    */
  private[streaming] object TransitionFold {
    def advance(
        st0: TransitionState,
        incoming: List[(Long, String)],
        wm: Long
    ): (TransitionState, List[(String, String, Long, Long)]) = {
      val (ready, pending) = (st0.pending ++ incoming).partition(_._1 < wm)
      var last = st0.last
      val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long, Long)]
      ready.sortBy { case (ms, tp) => (ms, tp) }.foreach { e =>
        last.foreach(l => out += ((l._2, e._2, l._1, e._1)))
        last = Some((e._1, e._2))
      }
      (TransitionState(pending, last), out.toList)
    }

    /** Batch reference: the complete history through one fold. */
    def reference(events: Seq[(Long, String)]): List[(String, String, Long, Long)] =
      advance(TransitionState(Nil, None), events.toList, Long.MaxValue)._2
  }

  /** Streaming user-path transitions — the incremental twin of the batch
    * `q_event_flow`: one immutable (from, to) row per consecutive pair of
    * a user's events, correct under out-of-order arrival because events
    * buffer until the watermark passes them and finalize in event-time
    * order ([[TransitionFold]]). State per user is the watermark-horizon
    * buffer plus ONE scalar (the newest finalized event); a user idle for
    * `idleTimeoutMs` of EVENT time evicts entirely — the returning user
    * starts a fresh chain (the session-boundary contract), which is what
    * bounds state on a user population that only grows.
    */
  def streamingTransitions(
      events: Dataset[TypedEvent],
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 24L * 60 * 60 * 1000
  ): Dataset[TransitionRow] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransitionState, TransitionRow](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (user: Long, evts: Iterator[TypedEvent], state: GroupState[TransitionState]) =>
        val st0 = state.getOption.getOrElse(TransitionState(Nil, None))
        val incoming = evts.map(e => (e.ts.getTime, e.event_type)).toList
        val wm = state.getCurrentWatermarkMs()
        if (state.hasTimedOut && st0.pending.isEmpty && incoming.isEmpty) {
          // Idle eviction: the chain ends; a comeback starts fresh.
          state.remove()
          Iterator.empty
        } else {
          val (st1, emitted) = TransitionFold.advance(st0, incoming, wm)
          state.update(st1)
          // Pending rows finalize on the next watermark advance; an empty
          // buffer waits out the idle TTL from the newest finalized event.
          val wake =
            if (st1.pending.nonEmpty) wm + 1
            else math.max(st1.last.map(_._1 + idleTimeoutMs).getOrElse(wm + 1), wm + 1)
          state.setTimeoutTimestamp(wake)
          emitted.iterator.map { case (f, t, fm, tm) =>
            TransitionRow(user, f, t, new Timestamp(fm), new Timestamp(tm))
          }
        }
      }
  }
  final case class ValuedEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class AttributionState(
      pending: List[(Long, String, Long)],
      lastTouch: Option[String],
      lastMs: Option[Long]
  )
  final case class AttributionRow(user_id: Long, channel: String, cents: Long, ts: Timestamp)

  /** The attribution fold, PURE so it can be model-checked: buffer
    * incoming (ms, type, cents) triples, finalize everything strictly
    * below the watermark in event-time order (ties on event_type — the
    * same streaming contract as [[TransitionFold]]; the batch
    * `q_attribution` breaks ties on event_id, so the two agree whenever a
    * user's timestamps are unique, the practical case at µs granularity),
    * credit each finalized purchase to the newest finalized non-purchase
    * type ("direct" when none), and carry that last touch across batches.
    * Credited rows are immutable once emitted because nothing can
    * finalize below the watermark twice.
    */
  private[streaming] object AttributionFold {
    def advance(
        st0: AttributionState,
        incoming: List[(Long, String, Long)],
        wm: Long
    ): (AttributionState, List[(String, Long, Long)]) = {
      val (ready, pending) = (st0.pending ++ incoming).partition(_._1 < wm)
      var lastTouch = st0.lastTouch
      var lastMs = st0.lastMs
      val out = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
      ready.sortBy { case (ms, tp, _) => (ms, tp) }.foreach { case (ms, tp, cents) =>
        if (tp == "purchase") out += ((lastTouch.getOrElse("direct"), cents, ms))
        else lastTouch = Some(tp)
        lastMs = Some(ms)
      }
      (AttributionState(pending, lastTouch, lastMs), out.toList)
    }

    /** Batch reference: the complete history through one fold. */
    def reference(events: Seq[(Long, String, Long)]): List[(String, Long, Long)] =
      advance(AttributionState(Nil, None, None), events.toList, Long.MaxValue)._2
  }

  /** Streaming last-touch ATTRIBUTION — the incremental twin of the batch
    * `q_attribution`: one immutable credited row per finalized purchase,
    * correct under out-of-order arrival ([[AttributionFold]]). State per
    * user is the watermark-horizon buffer plus TWO scalars (the last
    * non-purchase touch and the newest finalized time); a user idle for
    * `idleTimeoutMs` of EVENT time evicts entirely — the returning user's
    * first purchase credits "direct" (the session-boundary contract),
    * which is what bounds state on a user population that only grows.
    * Cents quantize with floor exactly as the batch plan's
    * `floor(value * 100)` so both surfaces credit identical amounts.
    */
  def streamingAttribution(
      events: Dataset[ValuedEvent],
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 24L * 60 * 60 * 1000
  ): Dataset[AttributionRow] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttributionState, AttributionRow](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (user: Long, evts: Iterator[ValuedEvent], state: GroupState[AttributionState]) =>
        val st0 = state.getOption.getOrElse(AttributionState(Nil, None, None))
        val incoming = evts
          .map(e => (e.ts.getTime, e.event_type, math.floor(e.value * 100).toLong))
          .toList
        val wm = state.getCurrentWatermarkMs()
        if (state.hasTimedOut && st0.pending.isEmpty && incoming.isEmpty) {
          state.remove()
          Iterator.empty
        } else {
          val (st1, emitted) = AttributionFold.advance(st0, incoming, wm)
          state.update(st1)
          val wake =
            if (st1.pending.nonEmpty) wm + 1
            else math.max(st1.lastMs.map(_ + idleTimeoutMs).getOrElse(wm + 1), wm + 1)
          state.setTimeoutTimestamp(wake)
          emitted.iterator.map { case (ch, cents, ms) =>
            AttributionRow(user, ch, cents, new Timestamp(ms))
          }
        }
      }
  }

  final case class FunnelState(
      buffered: List[(Long, String)],
      t1: Option[Long],
      t2: Option[Long],
      t3: Option[Long]
  )
  final case class FunnelStage(user_id: Long, stage: String, ts: Timestamp)

  /** The funnel's per-user transition, PURE so it can be model-checked:
    * buffer `incoming`, finalize everything strictly below `wm` in
    * event-time order through the stage machine, return the new state and
    * the stages that just became immutable. [[streamingFunnel]] delegates
    * here; FunnelPropertySpec replays random event sets through random
    * batch/watermark schedules against the batch-reference fold.
    */
  private[streaming] object FunnelFold {
    private val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

    def advance(
        st0: FunnelState,
        incoming: List[(Long, String)],
        wm: Long,
        windowMs: Long
    ): (FunnelState, List[(String, Long)]) = {
      val (ready, pending) = (st0.buffered ++ incoming).partition(_._1 < wm)
      val emitted = scala.collection.mutable.ListBuffer.empty[(String, Long)]
      var (t1, t2, t3) = (st0.t1, st0.t2, st0.t3)
      // Type priority breaks exact ties deterministically; the strict >
      // bounds make ties non-qualifying anyway, matching the batch query.
      ready.sortBy { case (ms, tp) => (ms, prio(tp)) }.foreach { case (ms, tp) =>
        if (t1.isEmpty) {
          if (tp == "view") { t1 = Some(ms); emitted += (("1_view", ms)) }
        } else if (t2.isEmpty) {
          if (tp == "click" && ms > t1.get && ms <= t1.get + windowMs) {
            t2 = Some(ms); emitted += (("2_click", ms))
          }
        } else if (t3.isEmpty) {
          if (tp == "purchase" && ms > t2.get && ms <= t2.get + windowMs) {
            t3 = Some(ms); emitted += (("3_purchase", ms))
          }
        }
      }
      // A completed funnel needs no more evidence.
      val keep = if (t3.isDefined) Nil else pending
      (FunnelState(keep, t1, t2, t3), emitted.toList)
    }

    /** Batch reference: the sequenced-conditional-minima semantics of
      * `q_funnel` computed by one ordered fold over the complete history.
      */
    def reference(events: Seq[(Long, String)], windowMs: Long): List[(String, Long)] =
      advance(FunnelState(Nil, None, None, None), events.toList, Long.MaxValue, windowMs)._2

    /** [[advance]] plus the completed-funnel retention-era semantics, PURE
      * so the era boundary can be model-checked like the fold itself. The
      * contract: with retention set, the era boundary is EVENT TIME
      * (t3 + retention) — an event past the boundary starts a fresh
      * funnel whether the completed state came from a PRIOR batch (st0)
      * or was completed by THIS very call (a single-batch watermark jump
      * larger than the retention — the r7 ADVICE gap: keying only off
      * st0.t3 swallowed such events into the just-completed funnel).
      * The rollover loops because one batch can complete several eras;
      * each pass drops at least the completing purchase from the pool,
      * so it terminates.
      */
    def advanceEra(
        st0: FunnelState,
        incoming: List[(Long, String)],
        wm: Long,
        windowMs: Long,
        retentionMs: Option[Long]
    ): (FunnelState, List[(String, Long)]) = {
      def boundary(st: FunnelState): Option[Long] =
        for { r <- retentionMs; t3 <- st.t3 if st.buffered.isEmpty } yield t3 + r
      val (base, admitted) = boundary(st0) match {
        case Some(at) =>
          val fresh = incoming.filter(_._1 > at)
          if (fresh.nonEmpty) (FunnelState(Nil, None, None, None), fresh)
          else (st0, incoming)
        case None => (st0, incoming)
      }
      var (st, emitted) = advance(base, admitted, wm, windowMs)
      // The rollover pool is EVERYTHING this call folded — including events
      // buffered from earlier batches: advance drops its pending buffer
      // when the funnel completes, so a buffered event past the boundary
      // would otherwise vanish with it.
      var pool = base.buffered ++ admitted
      var rolled = true
      while (rolled) {
        rolled = false
        boundary(st).foreach { at =>
          val fresh = pool.filter(_._1 > at)
          if (fresh.nonEmpty) {
            val (st2, em2) = advance(FunnelState(Nil, None, None, None), fresh, wm, windowMs)
            st = st2
            emitted = emitted ++ em2
            pool = fresh
            rolled = true
          }
        }
      }
      (st, emitted)
    }
  }

  /** Streaming twin of the batch `q_funnel`: per-user ordered, time-bounded
    * conversion tracking (view → click within `windowMs` → purchase within
    * `windowMs`), emitting one row per completed stage as it becomes FINAL.
    *
    * Out-of-order safety is the whole design: a click can arrive in an
    * earlier micro-batch than the view it follows (processing order) or a
    * late view can undercut a provisional "first view" (event order), so
    * events BUFFER in state until the watermark passes them and only then
    * fold through the stage machine in event-time order — at that point no
    * earlier event can still arrive, so each emitted stage time is
    * immutable (exactly the batch query's sequenced conditional minima,
    * computed incrementally). State per user is the in-flight buffer plus
    * three scalar stage times; a completed funnel drops its buffer but
    * KEEPS the stage times (three longs), so later events never restart
    * it — one funnel per user, exactly the batch semantics. A quiet
    * user's buffered tail still finalizes via event-time timeout on
    * watermark advance. Same keyed-state scale posture as [[sessionize]].
    */
  def streamingFunnel(
      events: Dataset[TypedEvent],
      windowMs: Long = 24L * 60 * 60 * 1000,
      watermarkDelay: String = "10 minutes",
      /** State-size control: completed funnels with nothing buffered are
        * EVICTED once the watermark passes the purchase time by this many
        * ms (None = keep forever, exactly one funnel per user). The
        * trade-off is explicit: a user who reappears after eviction
        * starts a fresh funnel — acceptable when the retention exceeds
        * any realistic return horizon, and the price of bounded state on
        * unbounded user cardinality.
        */
      completedRetentionMs: Option[Long] = None
  ): Dataset[FunnelStage] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (user: Long, evts: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
        val st0 = state.getOption.getOrElse(FunnelState(Nil, None, None, None))
        val incoming = evts.map(e => (e.ts.getTime, e.event_type)).toList
        val wm = state.getCurrentWatermarkMs()
        // Retain state by default — a completed funnel keeps its three
        // scalar stage times (buffer already dropped by advance) so a
        // later event for the user can never restart the funnel and
        // re-emit stages; removing it eagerly would diverge from the batch
        // query's one-funnel-per-user semantics. With completedRetentionMs
        // set, the retention boundary is EVENT TIME (t3 + retention), not
        // state presence OR batch boundaries: an incoming event past the
        // boundary starts a fresh funnel whether the eviction timeout has
        // fired yet, and even when the purchase that set t3 finalized in
        // THIS same micro-batch (advanceEra's rollover loop). Events at or
        // before the boundary belong to the completed funnel and are
        // ignored, as always.
        val (st1, emitted) =
          FunnelFold.advanceEra(st0, incoming, wm, windowMs, completedRetentionMs)
        if (st1.buffered.isEmpty && st1.t1.isEmpty) state.remove() // pristine: nothing to keep
        else {
          val doneAt =
            for { r <- completedRetentionMs; t3 <- st1.t3 if st1.buffered.isEmpty } yield t3 + r
          doneAt match {
            // Already past the retention boundary: eviction == the era
            // reset above, so removal loses nothing.
            case Some(at) if wm > at => state.remove()
            case Some(at) =>
              state.update(st1)
              state.setTimeoutTimestamp(math.max(at, wm + 1))
            case None =>
              state.update(st1)
              if (st1.buffered.nonEmpty)
                state.setTimeoutTimestamp(math.max(st1.buffered.map(_._1).min + 1, wm + 1))
          }
        }
        emitted.iterator.map { case (stage, ms) => FunnelStage(user, stage, new Timestamp(ms)) }
      }
  }
}
