package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-window range join (event ∈ [anchor, anchor + days)).
  *
  * The reference has no range semantics (its only temporal column is
  * an opaque int, buzzdb_lab1.cpp:75); this is the attribution /
  * windowed-correlation operator a large-scale event pipeline needs.
  *
  * Spark turns a raw inequality join into BroadcastNestedLoopJoin —
  * a per-key cross product that dies at scale. The standard fix,
  * implemented here: explode each anchor row into the calendar-day
  * buckets its window covers (`days + 1` rows — a small constant),
  * equi-join on (key, day) so the shuffle is hash-partitioned like
  * any other join, and re-apply the exact range predicate to trim the
  * bucket edges. Cost is |anchors|·(days+1) + |events|, never
  * |anchors|·|events| within a key.
  */
object RangeJoin {

  /** Join `events` (with timestamp `ts`) to `anchors` (with timestamp
    * `start`) on `eventKey == anchorKey` where
    * `start <= ts < start + days`. Column names must not collide
    * across the two sides (select/rename first); the helper bucket
    * column is dropped from the result.
    */
  def inWindow(events: DataFrame, eventKey: String, ts: String,
               anchors: DataFrame, anchorKey: String, start: String,
               days: Int): DataFrame = {
    require(days >= 1, s"window must be at least one day, got $days")
    val a = anchors.withColumn("graft_bucket_day",
      explode(sequence(to_date(col(start)),
        date_add(to_date(col(start)), days))))
    val e = events.withColumn("graft_bucket_day", to_date(col(ts)))
    e.join(a,
        e("graft_bucket_day") === a("graft_bucket_day") &&
          e(eventKey) === a(anchorKey) &&
          e(ts) >= a(start) &&
          e(ts) < a(start) + expr(s"INTERVAL $days DAYS"))
      .drop("graft_bucket_day")
  }
}
