package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
