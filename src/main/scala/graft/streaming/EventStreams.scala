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

  // ------------------------------------------------------- custom state

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(startMs: Long, endMs: Long, n: Long)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` with
    * event-time timeout: sessions close `gap` after their last event once
    * the watermark passes — the escape hatch for session logic
    * `session_window` can't express (per-session enrichment, caps, early
    * emission). State is per-key and watermark-bounded like the built-in.
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
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (user: Long, evts: Iterator[Event], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
        } else {
          val times = evts.map(_.ts.getTime).toSeq
          val prev = state.getOption.getOrElse(SessionState(times.min, times.min, 0))
          val next = SessionState(
            math.min(prev.startMs, times.min),
            math.max(prev.endMs, times.max),
            prev.n + times.size
          )
          state.update(next)
          // Close the session once the watermark passes last-event + gap.
          val timeoutAt = math.max(next.endMs + gapMs, state.getCurrentWatermarkMs() + 1)
          state.setTimeoutTimestamp(timeoutAt)
          Iterator.empty
        }
      }
  }
}
