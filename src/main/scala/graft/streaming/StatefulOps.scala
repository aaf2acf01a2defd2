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

  /** Streaming MinHash near-dup candidate mining — the streaming dual of
    * batch q52, closing the one capability where batch and streaming
    * diverged (VERDICT r3 item 8). Batch near-dup dedup needs the whole
    * corpus; this flags a document's near-dups AGAINST EVERYTHING SEEN SO
    * FAR, incrementally, the way an ingestion pipeline needs it.
    *
    * Shape: the per-row codegen'd kernel (graft_shingle_hashes →
    * graft_minhash_bands, the same expressions batch q52 plans) turns each
    * document into its 32 LSH band-bucket keys with no shuffle; the only
    * stateful operator is flatMapGroupsWithState KEYED BY BAND KEY, whose
    * state is the doc ids previously seen in that bucket. A new doc emits
    * one candidate pair per stored id, then joins the bucket. State is
    * dup-group-sized per key (random pairs collide in a band with prob
    * ~(1/P)⁴ ≈ 0), partitioned across executors by band key, and
    * incrementally checkpointed like any other state store — at
    * production scale, key it with EventTimeTimeout on ingest time to
    * bound the horizon (same eviction posture as [[sessionize]]).
    *
    * Output is CANDIDATE pairs (a pair surfaces once per colliding band;
    * near-identical docs collide in many). Downstream exact verification
    * — batch q52's candidate-proportional Jaccard join — applies
    * unchanged; candidates here err only toward extras, never misses,
    * exactly like the batch banding.
    */
  final case class DocEvent(docId: Long, text: String)
  final case class NearDupCand(id1: Long, id2: Long, bkey: Long)
  def nearDupCandidates(docs: Dataset[DocEvent]): Dataset[NearDupCand] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.VectorExpressions.register(s)
    val banded = docs.toDF()
      .select(col("docId"), expr("graft_shingle_hashes(split(text, ' '))").as("hs"))
      .filter(size(col("hs")) > 0) // shingle-less docs have no near-dup relation
      .select(col("docId"), explode(expr("graft_minhash_bands(hs)")).as("bkey"))
      .as[(Long, Long)]
    banded
      .groupByKey(_._2)
      .flatMapGroupsWithState[Array[Long], NearDupCand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bkey: Long, rows: Iterator[(Long, Long)], state: GroupState[Array[Long]]) =>
          val prior = state.getOption.getOrElse(Array.emptyLongArray)
          val fresh = rows.map(_._1).toArray.sorted.distinct.filterNot(prior.contains)
          val out = Seq.newBuilder[NearDupCand]
          var seen = prior
          fresh.foreach { id =>
            seen.foreach { other =>
              out += NearDupCand(math.min(id, other), math.max(id, other), bkey)
            }
            seen = seen :+ id
          }
          if (fresh.nonEmpty) state.update(seen)
          out.result().iterator
      }
  }

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
