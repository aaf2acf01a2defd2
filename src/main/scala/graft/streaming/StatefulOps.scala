package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (SURVEY.md §2.2 streaming row):
  * capability upgrades the reference cannot express — its only state is the
  * implicit window of retained batch RDDs (SparkApplication.scala:88),
  * which is lost on restart (no checkpoint anywhere in the app).
  *
  * Scale notes: state lives in the state store keyed by group — partitioned
  * by the grouping key across executors, incrementally checkpointed. The
  * event-time timeout bounds state size: idle keys are evicted as the
  * watermark passes, so state is O(active keys), not O(history).
  */
object StatefulOps {

  final case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(nEvents: Long, start: Long, lastTs: Long, total: Double)
  final case class SessionOut(userId: Long, nEvents: Long,
                              startMs: Long, endMs: Long, total: Double)

  /** Gap-based sessionization with explicit state — the
    * flatMapGroupsWithState formulation of EventOps.q47/q38, for when a
    * session must carry custom state (running aggregates, model features)
    * that `session_window` can't express. Emits a session when the
    * event-time timeout fires (watermark passed start + gap).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.nEvents, s.start, s.lastTs, s.total))
          } else {
            // Fold sorted new events into (possibly several) sessions.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.nEvents + 1, s.start, t, s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.nEvents, s.start, s.lastTs, s.total)
                  cur = Some(SessionState(1, t, t, e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Clamp to just past the watermark: flatMapGroupsWithState
              // does NOT drop late rows, and setTimeoutTimestamp throws if
              // the target is <= the current event-time watermark (a very
              // late event's session-end could be).
              val target = s.lastTs + gapSeconds * 1000
              val floor = state.getCurrentWatermarkMs() + 1
              state.setTimeoutTimestamp(math.max(target, floor))
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup bounded by the watermark — the streaming dual
    * of Dedup.q50. State holds one entry per key seen within the watermark
    * horizon and is evicted automatically (vs unbounded dropDuplicates).
    */
  def dedupWithinWatermark(events: Dataset[Event], watermark: String = "10 minutes"): Dataset[Event] =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("userId", "ts")

  /** Running per-key count+sum via mapGroupsWithState (ProcessingTimeTimeout
    * unused — state retained for the stream's life; use for bounded key
    * domains like per-tenant counters).
    */
  final case class KeyTotal(userId: Long, n: Long, total: Double)
  def runningTotals(events: Dataset[Event]): Dataset[KeyTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[KeyTotal, KeyTotal](GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[KeyTotal]) =>
          val prev = state.getOption.getOrElse(KeyTotal(userId, 0L, 0.0))
          val next = rows.foldLeft(prev)((s, e) => KeyTotal(userId, s.n + 1, s.total + e.value))
          state.update(next)
          next
      }
  }
}
