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

/** One open (not-yet-emittable) session interval. */
private[streaming] final case class SessionAcc(start: Long, end: Long, n: Long)

/** Per-user state between micro-batches: ALL open intervals, not just
  * the latest — a straggler more than `gap` before the newest interval
  * opens its own interval here and waits for the watermark like any
  * other, so it can still merge with later-arriving neighbours.
  */
private[streaming] final case class SessionsAcc(open: List[SessionAcc])

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

  /** Windowed count-min hot-key sketch — the stream form of q75: per
    * tumbling window, the d×w cell table of [[graft.operators
    * .CountMin]] over a key column. State per window is bounded by
    * d·w CELLS no matter how many distinct keys the window saw — the
    * sketch's reason to exist — and the watermark finalizes windows,
    * so total state is O(d·w · open windows). The param family
    * explodes as a literal array (a pure projection — no stream-static
    * join needed), so this is a plain watermarked windowed aggregate;
    * in batch the watermark no-ops and each window's cells equal
    * `CountMin.build` on that window's slice (spec-asserted parity).
    * Downstream, per-window estimates probe exactly as in batch; keys
    * whose estimate crosses a threshold are the ones worth
    * [[graft.operators.Salting]] in the very next job.
    */
  def hotKeySketch(events: DataFrame, tsCol: String, keyCol: String,
                   windowLen: String, lateness: String,
                   depth: Int, width: Int): DataFrame = {
    import graft.operators.CountMin
    events.withWatermark(tsCol, lateness)
      .select(col(tsCol), col(keyCol),
        explode(CountMin.paramsArray(depth)).as("p"))
      .groupBy(window(col(tsCol), windowLen).as("win"),
        col("p.r").as("r"),
        CountMin.cellOf(col(keyCol), col("p.a"), col("p.b"), width).as("cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("win_start"), col("r"), col("cell"), col("cnt"))
  }

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

  /** Stream-stream interval join (click-to-view attribution shape):
    * rows pair when keys match and the right event time falls in
    * [leftTs − lower, leftTs + upper]. Both sides carry watermarks and
    * the join condition carries the time bound — together they let
    * Spark evict buffered rows once no future match is admissible, so
    * join state is O(key-rate × (lateness + interval)), bounded on an
    * unbounded feed. The same call works in batch (watermarks no-op,
    * the condition is a plain θ-join) — the spec asserts parity.
    * Column names must be disjoint across the two sides, as in any
    * self-describing stream-stream join.
    */
  def intervalJoin(left: DataFrame, leftKey: String, leftTs: String,
                   right: DataFrame, rightKey: String, rightTs: String,
                   lateness: String, lower: String, upper: String): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        expr(s"$leftKey = $rightKey AND " +
          s"$rightTs BETWEEN $leftTs - INTERVAL $lower " +
          s"AND $leftTs + INTERVAL $upper"))

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
    * (idle path). State holds EVERY open interval for the user (a
    * straggler more than `gap` before the newest interval becomes its
    * own open interval), and an interval is emitted only once the
    * watermark passes its `end + gap` — at which point no admissible
    * event can still merge into it. That defers emission by up to the
    * lateness bound but buys exact batch `session_window` gap-merge
    * parity for ANY arrival order within the watermark (the append-mode
    * discipline: never emit what a legal future event could rewrite).
    * State is O(open intervals per user), bounded by the watermark.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 lateness: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user, batch, state) => sessionStep(user, batch, state, gapMs))
  }

  private def sessionStep(user: Long, batch: Iterator[SessionEvent],
                          state: GroupState[SessionsAcc],
                          gapMs: Long): Iterator[Session] = {
    def emit(s: SessionAcc): Session = Session(user,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
    // fold the batch's events into the open-interval set: an event
    // merges every interval it is within `gap` of (it can bridge two)
    var open = state.getOption.map(_.open).getOrElse(Nil)
    if (!state.hasTimedOut) {
      batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        val (touch, rest) = open.partition(s =>
          t >= s.start - gapMs && t <= s.end + gapMs)
        open = SessionAcc(
          (t :: touch.map(_.start)).min,
          (t :: touch.map(_.end)).max,
          touch.map(_.n).sum + 1) :: rest
      }
    }
    // emit exactly the ripe intervals — watermark past end+gap means no
    // admissible event can extend them — and re-arm for the earliest
    // still-open one (strictly past the watermark or Spark rejects it)
    val wm = state.getCurrentWatermarkMs()
    val (ripe, still) = open.partition(s => s.end + gapMs <= wm)
    if (still.isEmpty) { if (state.exists) state.remove() }
    else {
      state.update(SessionsAcc(still))
      state.setTimeoutTimestamp(
        math.max(still.map(_.end + gapMs).min, wm + 1))
    }
    ripe.sortBy(s => (s.start, s.end)).map(emit).iterator
  }
}
