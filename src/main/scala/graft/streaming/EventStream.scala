package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful session operators. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                              event_type: String)

/** One closed session: [start, end] span of its events (end is the
  * last event's time, not end+gap) and the event count.
  */
final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

/** Accumulating session state kept per user between micro-batches. */
private[streaming] final case class SessionAcc(start: Long, end: Long, n: Long)

/** Structured Streaming analog of the reference's append-only
  * engagement log (`addEngagementRecord`, buzzdb_lab1.cpp:639-673;
  * SURVEY.md §2.8). The reference validates each appended row's FKs
  * against the loaded tables (:649-658), silently dropping
  * violations, then appends to the CSV. Here the append-only feed is
  * a streaming DataFrame (`readStream` over an event directory / bus),
  * the FK check is a stream-static left-semi join — re-planned each
  * micro-batch against the current static snapshot — and the rolled-up
  * view is a watermarked tumbling-window count: the shape the
  * engagement log takes when "the file" is a 100 TB/day event feed
  * (bounded state via the watermark, shuffle keyed on window+type).
  *
  * Both helpers accept any DataFrame, so the SAME code runs in batch
  * — `withWatermark` is a no-op there and [[windowedCounts]] is
  * exactly the q18 roll-up shape. The spec asserts that
  * batch/stream parity.
  */
object EventStream {

  /** Stream-static left-semi FK filter — the reference's append-time
    * validation (buzzdb_lab1.cpp:649-658), one semi-join per foreign
    * key. The dimension side is batch (broadcast per micro-batch);
    * violations are silently dropped exactly as in the reference.
    */
  def fkValidated(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim.select(col(key)).distinct(), Seq(key), "leftsemi")

  /** Watermarked tumbling-window counts per event type. In streaming
    * mode the watermark bounds the aggregation state (rows later than
    * `lateness` behind the max seen event time are dropped and their
    * windows finalized); in batch mode the watermark is a no-op and
    * this is the q18 aggregation.
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     windowLen: String, lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("win"), col(typeCol))
      .agg(count("*").as("n"))
      .select(col("win.start").as("win_start"), col(typeCol), col("n"))

  /** Streaming exact dedup — the stream form of q22: an event id seen
    * again within the watermark horizon is dropped (at-least-once
    * feeds: redeliveries, producer retries). State is keyed on the id
    * only and evicted once the watermark passes the first sighting's
    * event time, so it stays bounded no matter how long the stream
    * runs — the property that makes dedup deployable on an unbounded
    * feed, where a batch `dropDuplicates` would need all history.
    */
  def dedupedWithinWatermark(events: DataFrame, tsCol: String, idCol: String,
                             lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** Native session windows (`session_window`): gap-merged per-key
    * sessions with `end = last event + gap`, usable unchanged in batch
    * (watermark no-op — the q52 oracle checks that form) and in
    * streaming (watermark finalizes a session once no event can extend
    * it). Prefer this for plain per-session counts; drop to
    * [[sessionize]] when the state logic outgrows it.
    */
  def sessionWindowCounts(events: DataFrame, tsCol: String, keyCol: String,
                          gap: String, lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("win"))
      .agg(count("*").as("n_events"))
      .select(col(keyCol), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))

  /** Custom per-key streaming state: inactivity-gap sessionization via
    * `flatMapGroupsWithState` (the `KeyValueGroupedDataset` state API —
    * the seam for any session logic `session_window` can't express:
    * per-session aggregates beyond counts, value-dependent gaps,
    * session-abandonment side outputs, ...). One `SessionAcc` per
    * *open* session per user — state is O(active users), not O(events)
    * — and the event-time timeout closes idle sessions once the
    * watermark passes `end + gap`, so state cannot accrete on an
    * unbounded feed. A session is emitted exactly once, either when a
    * later event breaks the gap (data path) or when the timeout fires
    * (idle path). In-batch events are processed in event-time order;
    * a cross-batch out-of-order event within the watermark extends the
    * open session's interval in whichever direction it falls inside
    * the gap, and a straggler more than `gap` BEFORE the open session
    * is emitted as its own singleton session immediately (the open
    * session may already have emitted successors — append mode cannot
    * rewrite it).
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 lateness: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user, batch, state) => sessionStep(user, batch, state, gapMs))
  }

  private def sessionStep(user: Long, batch: Iterator[SessionEvent],
                          state: GroupState[SessionAcc],
                          gapMs: Long): Iterator[Session] = {
    def emit(s: SessionAcc): Session = Session(user,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(emit(s))
    } else {
      val closed = Seq.newBuilder[Session]
      var cur = state.getOption
      batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t > s.end + gapMs => // gap broken forward
            closed += emit(s)
            Some(SessionAcc(t, t, 1))
          case Some(s) if t < s.start - gapMs => // straggler far in the past
            closed += Session(user,
              new java.sql.Timestamp(t), new java.sql.Timestamp(t), 1)
            Some(s)
          case Some(s) => // inside [start-gap, end+gap]: extend either way
            Some(SessionAcc(math.min(s.start, t), math.max(s.end, t), s.n + 1))
          case None => Some(SessionAcc(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // must be strictly past the current watermark or Spark rejects
        // the timeout; an already-idle session then fires next batch
        state.setTimeoutTimestamp(
          math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
      }
      closed.result().iterator
    }
  }
}
