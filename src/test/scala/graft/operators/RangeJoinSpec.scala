package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val clicks = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (1L, ts("2024-01-05 12:00:00")),
    (2L, ts("2024-01-01 00:00:00")))
    .toDF("c_user", "c_ts")

  private lazy val purchases = Seq(
    (10L, 1L, ts("2024-01-01 00:00:00")), // == anchor: inclusive lower bound
    (11L, 1L, ts("2024-01-03 23:59:59")), // inside day-boundary bucket edge
    (12L, 1L, ts("2024-01-04 00:00:00")), // == anchor + 3 days: excluded
    (13L, 1L, ts("2024-01-06 00:00:00")), // inside second click's window only
    (14L, 2L, ts("2024-01-02 00:00:00")), // other user's window
    (15L, 3L, ts("2024-01-01 00:00:00"))) // no anchor for this user
    .toDF("p_id", "p_user", "p_ts")

  test("inWindow matches the naive inequality join exactly") {
    val bucketed = RangeJoin.inWindow(
        purchases, "p_user", "p_ts", clicks, "c_user", "c_ts", 3)
      .select("p_id", "c_ts").as[(Long, Timestamp)].collect().toSet
    val naive = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr("INTERVAL 3 DAYS"))
      .select("p_id", "c_ts").as[(Long, Timestamp)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed.map(_._1) == Set(10L, 11L, 13L, 14L))
  }

  test("window bounds: inclusive start, exclusive end") {
    val hit = RangeJoin.inWindow(
        purchases, "p_user", "p_ts", clicks, "c_user", "c_ts", 3)
      .select("p_id").as[Long].collect().toSeq
    assert(hit.contains(10L), "purchase at anchor instant must match")
    assert(!hit.contains(12L), "purchase at anchor + window must not match")
  }

  test("plan is an equi-join on the day bucket, not a nested-loop cross product") {
    val plan = RangeJoin.inWindow(
        purchases, "p_user", "p_ts", clicks, "c_user", "c_ts", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
